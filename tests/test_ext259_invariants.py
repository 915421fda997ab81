"""Definition-level invariants for ext259: threshold-curve monotonicity
laws and the forward replay's batch-cut exactness."""

from __future__ import annotations

import math
import random

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext258 import hmm_forward_fold

_SF = "/root/testdata/sf0.001"
_Q = {q.name: q for q in registry()}


def test_threshold_curve_monotone():
    """Raising the threshold can only LOSE pairs and flagged docs, so
    survivors are non-decreasing in the threshold; counts are bounded
    by the candidate set; n_docs_flagged <= n_pairs_ge (each flagged
    doc needs at least one qualifying pair)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{_SF}/documents.parquet'"
    )
    df = con.execute(
        resolve_sql(_Q["dedup_threshold_sensitivity"], _SF)
    ).df()
    con.close()
    df = df.sort_values("threshold_ppm")
    assert df["n_pairs_ge"].is_monotonic_decreasing
    assert df["n_docs_flagged"].is_monotonic_decreasing
    assert df["n_survivors"].is_monotonic_increasing
    assert (df["n_pairs_ge"] <= df["n_candidate_pairs"]).all()
    assert (df["n_docs_flagged"] <= df["n_pairs_ge"]).all()
    assert (
        df["n_survivors"] + df["n_docs_flagged"]
        == df["n_survivors"].iloc[0] + df["n_docs_flagged"].iloc[0]
    ).all()


def _resume_fold(signs, cuts):
    """The streaming replay's resume path, mirrored: fold the first
    slice with hmm_forward_fold, then continue step-by-step."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext258 import (
        _E0_DN,
        _E0_UP,
        _E1_DN,
        _E1_UP,
        _T_STAY,
        _T_SWITCH,
    )

    first = signs[: cuts[0]]
    ll, a0, a1, bsum, n = hmm_forward_fold(first)
    prev = cuts[0]
    for c in cuts[1:] + [len(signs)]:
        for s in signs[prev:c]:
            e0 = _E0_UP if s == 1 else _E0_DN
            e1 = _E1_UP if s == 1 else _E1_DN
            n0 = (a0 * _T_STAY + a1 * _T_SWITCH) * e0
            n1 = (a0 * _T_SWITCH + a1 * _T_STAY) * e1
            cc = n0 + n1
            a0, a1 = n0 / cc, n1 / cc
            ll = ll + math.log(cc)
            bsum += int(math.floor(a1 * 1e9 + 0.5))
            n += 1
        prev = c
    return ll, a0, a1, bsum, n


def test_forward_replay_batch_cut_exactness():
    """Resuming from carried (alpha, ll, bsum) state across arbitrary
    cuts equals the one-shot fold BIT-FOR-BIT -- the property the 36th
    replay's hash parity rests on."""
    rng = random.Random(36)
    for _ in range(25):
        n = rng.randint(8, 300)
        signs = [rng.randint(0, 1) for _ in range(n)]
        one = hmm_forward_fold(signs)
        cuts = sorted(rng.sample(range(1, n), min(3, n - 1)))
        assert _resume_fold(signs, cuts) == one
