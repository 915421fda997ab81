"""Definition-level invariants for ext225 (RQA, horizontal visibility
graph): brute-force O(n^2)/O(n^3) Python re-derivations over the real
daily series plus literal fixtures for the formulations.
"""

from __future__ import annotations

import math

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext225 import (
    _hvg_iid_literals,
)

_Q = {q.name: q.fn for q in registry()}


def _daily_cents(sf_dir: str):
    return [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            f" AS BIGINT) FROM '{sf_dir}/orders.parquet'"
            f" GROUP BY o_orderdate ORDER BY o_orderdate"
        ).fetchall()
    ]


def _rqa_brute(y):
    n = len(y)
    sx = sum(y)
    sxx = sum(v * v for v in y)
    r = int(math.floor(0.2 * math.sqrt(float(n * sxx - sx * sx)) / float(n)))
    rec = {}
    for i in range(n):
        for j in range(i + 1, n):
            if abs(y[i] - y[j]) <= r:
                rec.setdefault(j - i, []).append(i)
    n_rec = n_in = lmax = n_lines = 0
    for diag, poss in rec.items():
        poss.sort()
        run = 1
        runs = []
        for a, b in zip(poss, poss[1:]):
            if b == a + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
        for ln in runs:
            n_rec += ln
            lmax = max(lmax, ln)
            if ln >= 2:
                n_in += ln
                n_lines += 1
    return n, r, n_rec, n_in, lmax, n_lines


def test_rqa_matches_brute_force(spark, sf_dir):
    y = _daily_cents(sf_dir)
    n, r, n_rec, n_in, lmax, n_lines = _rqa_brute(y)
    row = _Q["rqa_recurrence_daily"](spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["r_cents"] == r
    assert row["recurrent_pairs"] == n_rec
    assert row["rr_ppm"] == n_rec * 10**6 // (n * (n - 1) // 2)
    if n_rec:
        assert row["det_ppm"] == n_in * 10**6 // n_rec
    assert row["lmax"] == lmax
    assert row["n_lines"] == n_lines


def _hvg_brute_degrees(y):
    n = len(y)
    deg = [0] * n
    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or max(y[i + 1 : j]) < min(y[i], y[j]):
                deg[i] += 1
                deg[j] += 1
    return deg


def test_hvg_matches_brute_force_literal():
    # hand-checkable fixture: [3, 1, 2, 5, 4]
    # edges: (1,2) (2,3) (1,4 via 3<min(3,5)? between=1,2 max=2<3 yes)
    # (3,4) (4,5); (2,4): between=2, min(1,5)=1, 2>1 no; (1,3): between
    # =1 < min(3,2)=2 yes; (3,5): between=5 no; (2,5)/(1,5): no.
    deg = _hvg_brute_degrees([3, 1, 2, 5, 4])
    assert deg == [3, 2, 3, 3, 1]


def test_hvg_matches_brute_force_real(spark, sf_dir):
    y = _daily_cents(sf_dir)
    deg = _hvg_brute_degrees(y)
    from collections import Counter

    dist = Counter(deg)
    total = sum(dist.values())
    got = {
        r["degree"]: r
        for r in _Q["horizontal_visibility_graph"](spark, sf_dir).collect()
    }
    assert set(got) == set(dist)
    for k, n_nodes in dist.items():
        assert got[k]["n_nodes"] == n_nodes
        assert got[k]["share_ppm"] == n_nodes * 10**6 // total
    # mean degree of any HVG is < 4 asymptotically and >= 2(n-1)/n
    assert 2 * (len(y) - 1) / len(y) <= sum(deg) / len(y) < 4.5


def test_hvg_iid_law_literals_are_exact_rationals():
    for k, v in _hvg_iid_literals():
        assert v == 10**6 * 2 ** (k - 2) // 3 ** (k - 1)
    # P(2) = 1/3
    assert dict(_hvg_iid_literals())[2] == 333333
    # the law is a proper distribution: sum over all k >= 2 equals 1
    assert abs(sum((1 / 3) * (2 / 3) ** (k - 2) for k in range(2, 200)) - 1) < 1e-12
