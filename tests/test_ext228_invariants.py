"""Definition-level invariants for ext228 (NN tour, FFD packing,
Elias-gamma)."""

from __future__ import annotations

import math
import random

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    decode_elias_gamma,
    encode_elias_gamma,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


# ---------------------------------------------------------------------------
# NN tour
# ---------------------------------------------------------------------------
def _sample_points(sf_dir: str, n=64):
    rows = duckdb.sql(
        f"""
        SELECT vec_id, CAST(embedding[1] AS DOUBLE),
               CAST(embedding[2] AS DOUBLE)
        FROM '{sf_dir}/embeddings.parquet'
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {n}
        """
    ).fetchall()
    return {r[0]: (r[1], r[2]) for r in rows}


def _dq(P, a, b):
    ax, ay = P[a]
    bx, by = P[b]
    return int(
        math.floor(1e9 * math.sqrt((ax - bx) ** 2 + (ay - by) ** 2) + 0.5)
    )


def _mst_weight(P):
    nodes = list(P)
    in_tree = {nodes[0]}
    total = 0
    while len(in_tree) < len(nodes):
        best = min(
            (
                (_dq(P, a, b), a, b)
                for a in in_tree
                for b in nodes
                if b not in in_tree
            ),
        )
        total += best[0]
        in_tree.add(best[2])
    return total


def test_nn_tour_matches_python_and_dominates_mst(spark, sf_dir):
    P = _sample_points(sf_dir)
    rows = sorted(
        _Q["nn_tour_embedding"](spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert len(rows) == len(P) + 1
    # greedy re-derivation
    start = min(P)
    assert rows[0]["node"] == start and rows[0]["leg_dq"] == 0
    visited = [start]
    cur = start
    for r in rows[1:-1]:
        nxt = min(
            (v for v in P if v not in visited),
            key=lambda v: (_dq(P, cur, v), v),
        )
        assert r["node"] == nxt
        assert r["leg_dq"] == _dq(P, cur, nxt)
        visited.append(nxt)
        cur = nxt
    assert rows[-1]["node"] == start
    assert rows[-1]["leg_dq"] == _dq(P, cur, start)
    assert rows[-1]["cum_dq"] == sum(r["leg_dq"] for r in rows)
    # any closed tour spans the nodes => weight >= MST
    assert rows[-1]["cum_dq"] >= _mst_weight(P)


# ---------------------------------------------------------------------------
# FFD
# ---------------------------------------------------------------------------
def test_ffd_matches_python_and_bounds(spark, sf_dir):
    ws = [
        int(r[0])
        for r in duckdb.sql(
            f"""
            SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) // 100 AS w
            FROM '{sf_dir}/orders.parquet' GROUP BY o_orderkey
            ORDER BY w DESC, o_orderkey LIMIT 50
            """
        ).fetchall()
    ]
    cap = 3 * ws[0] // 2
    levels = []
    for w in ws:
        for i, lvl in enumerate(levels):
            if lvl + w <= cap:
                levels[i] = lvl + w
                break
        else:
            levels.append(w)
    rows = sorted(
        _Q["bin_packing_ffd"](spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["level_dollars"] for r in rows] == levels
    n_bins = len(levels)
    lb = (sum(levels) + cap - 1) // cap
    for r in rows:
        assert r["n_bins"] == n_bins
        assert r["lower_bound"] == lb
        assert r["capacity"] == cap
        assert r["level_dollars"] <= cap
        assert r["fill_ppm"] == r["level_dollars"] * 10**6 // cap
    # any-fit guarantee: at most one bin is <= half full
    assert n_bins >= lb
    assert n_bins <= 2 * lb + 1
    half_or_less = sum(1 for lvl in levels if 2 * lvl <= cap)
    assert half_or_less <= 1


def test_ffd_no_two_half_empty_bins_law():
    rng = random.Random(9)
    for _ in range(30):
        ws = sorted(
            (rng.randint(1, 100) for _ in range(40)), reverse=True
        )
        cap = 3 * ws[0] // 2
        levels = []
        for w in ws:
            for i, lvl in enumerate(levels):
                if lvl + w <= cap:
                    levels[i] = lvl + w
                    break
            else:
                levels.append(w)
        assert sum(1 for lvl in levels if 2 * lvl <= cap) <= 1


# ---------------------------------------------------------------------------
# Elias gamma
# ---------------------------------------------------------------------------
def test_elias_gamma_roundtrip_fuzz():
    rng = random.Random(13)
    for _ in range(200):
        vals = [
            rng.randint(1, 1 << rng.randint(1, 24))
            for _ in range(rng.randint(1, 70))
        ]
        data, nb = encode_elias_gamma(vals)
        assert decode_elias_gamma(data, len(vals)) == vals
        assert nb == sum(2 * v.bit_length() - 1 for v in vals)


def test_elias_gamma_classic_lengths():
    for v, bits in ((1, 1), (2, 3), (3, 3), (4, 5), (5, 5), (8, 7), (255, 15)):
        assert encode_elias_gamma([v])[1] == bits


def test_elias_gamma_query_consistency(spark, sf_dir):
    rows = _Q["elias_gamma_bits"](spark, sf_dir).collect()
    for r in rows:
        assert r["gamma_bits"] > 0
        assert r["rice_total_bits"] > 8
        assert (
            r["ratio_ppm"]
            == r["gamma_bits"] * 10**6 // r["rice_total_bits"]
        )
