"""Definition-level invariants for ext248 (NMF): Lee-Seung error
monotonicity, nonnegativity preservation, and planted 2-block
recovery."""

from __future__ import annotations

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext248 import (
    nmf_fold,
    nmf_resid,
)


def _blockmat(n=8):
    V = [[0.0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            same = (i < n // 2) == (j < n // 2)
            V[i][j] = 10.0 if same else 0.5
    return V


def test_lee_seung_error_monotone():
    V = _blockmat()
    n = len(V)
    prev = None
    for rounds in range(1, 15):
        W, H = nmf_fold(V, n, rounds=rounds)
        num, _ = nmf_resid(V, W, H, n)
        if prev is not None:
            assert num <= prev + 1e-9, (rounds, num, prev)
        prev = num


def test_factors_stay_nonnegative():
    V = _blockmat()
    W, H = nmf_fold(V, len(V), rounds=30)
    assert all(x >= 0 for row in W for x in row)
    assert all(x >= 0 for row in H for x in row)


def test_planted_two_block_recovery():
    """On a 2-block matrix, each factor concentrates on one block:
    the dominant-factor assignment recovers the block partition."""
    V = _blockmat()
    n = len(V)
    W, H = nmf_fold(V, n, rounds=60)
    sides = [0 if W[i][0] > W[i][1] else 1 for i in range(n)]
    assert len(set(sides[: n // 2])) == 1
    assert len(set(sides[n // 2 :])) == 1
    assert sides[0] != sides[-1]
    # and the reconstruction is close in relative terms
    num, den = nmf_resid(V, W, H, n)
    assert num / den < 0.02
