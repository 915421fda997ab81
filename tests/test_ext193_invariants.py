"""ext193: a from-scratch python LOF (with the planted-outlier law),
a brute-force collusion-pair replay, and the Goh-Barabasi calibration
laws (clockwork gaps -> B = -1; the sin-hash exponential -> B ~ 0)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext193 import (
    _LOF_K,
    q_aml_collusion_pairs,
    q_burstiness_memory_gaps,
    q_lof_embedding_plane,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _lof(points, k):
    """Quantized LOF exactly as the query defines it."""
    ids = sorted(points)
    dq = {}
    for i in ids:
        ds = []
        for j in ids:
            if i == j:
                continue
            d = math.dist(points[i], points[j])
            ds.append((int(round(1e9 * d)), j))
        ds.sort()
        dq[i] = ds[:k]
    kdist = {i: dq[i][-1][0] for i in ids}
    lrdq = {}
    for i in ids:
        sr = sum(max(kdist[j], d) for d, j in dq[i])
        lrdq[i] = (10**15 * k) // sr
    out = {}
    for i in ids:
        slrd = sum(lrdq[j] for _, j in dq[i])
        out[i] = round(slrd / (k * lrdq[i]), 6)
    return out


def test_lof_matches_python(spark, sf_dir):
    rows = q_lof_embedding_plane(spark, sf_dir).collect()
    pts = {
        r.vec_id: (r.px, r.py)
        for r in read_table(spark, sf_dir, "embeddings")
        .selectExpr(
            "vec_id",
            "CAST(embedding[0] AS DOUBLE) AS px",
            "CAST(embedding[1] AS DOUBLE) AS py",
        )
        .collect()
    }
    ref = _lof(pts, _LOF_K)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.vec_id, r.lof_score) for r in rows] == top


def test_lof_planted_outlier_law():
    """A lone far point among two tight clusters must take the top LOF
    score, and interior cluster points must sit near 1."""
    pts = {}
    for i in range(12):
        pts[i] = (0.01 * (i % 4), 0.01 * (i // 4))
    for i in range(12, 24):
        pts[i] = (0.5 + 0.01 * (i % 4), 0.5 + 0.01 * (i // 4 - 3))
    pts[99] = (0.25, 0.9)  # the planted outlier
    ref = _lof(pts, _LOF_K)
    assert max(ref, key=ref.get) == 99
    assert ref[99] > 3.0
    interior = [v for k, v in ref.items() if k not in (99,)]
    assert sum(interior) / len(interior) < 1.6


def test_collusion_pairs_match_bruteforce(spark, sf_dir):
    rows = q_aml_collusion_pairs(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cells = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .selectExpr(
            "o_custkey AS sender",
            "l_suppkey AS recv",
            "CAST(date_trunc('week', o_orderdate) AS DATE) AS wk",
        )
        .distinct()
        .collect()
    )
    by_sender: dict = {}
    for r in cells:
        by_sender.setdefault(r.sender, set()).add((r.recv, r.wk))
    senders = sorted(by_sender)
    best = []
    for ai in range(len(senders)):
        for bi in range(ai + 1, len(senders)):
            s1, s2 = senders[ai], senders[bi]
            common = len(by_sender[s1] & by_sender[s2])
            if common >= 3:
                jac = round(
                    common
                    / (len(by_sender[s1]) + len(by_sender[s2]) - common),
                    6,
                )
                best.append((-common, -jac, s1, s2))
    best.sort()
    expect = [
        (s1, s2, -nc, len(by_sender[s1]), len(by_sender[s2]), -jac)
        for (nc, jac, s1, s2) in best[:10]
    ]
    got = [
        (r.s1, r.s2, r.n_common, r.s1_cells, r.s2_cells, r.jaccard)
        for r in rows
    ]
    assert got == expect


def test_burstiness_matches_python(spark, sf_dir):
    row = q_burstiness_memory_gaps(spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "unix_micros(ts) AS us",
            "event_id",
        )
        .collect()
    )
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r.day, []).append((r.us, r.event_id))
    gaps_all, pairs = [], []
    for rows_ in by_day.values():
        rows_.sort()
        gs = [b[0] - a[0] for a, b in zip(rows_, rows_[1:])]
        gaps_all.extend(gs)
        pairs.extend(zip(gs, gs[1:]))
    n = len(gaps_all)
    mu = sum(gaps_all) / n
    sd = math.sqrt(sum(g * g for g in gaps_all) / n - mu * mu)
    assert row.n_gaps == n
    assert abs(row.burstiness_b - (sd - mu) / (sd + mu)) < 1e-5
    m = len(pairs)
    s1 = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    s11 = sum(a * a for a, _ in pairs)
    s22 = sum(b * b for _, b in pairs)
    s12 = sum(a * b for a, b in pairs)
    mm = (m * s12 - s1 * sb) / (
        math.sqrt(m * s11 - s1 * s1) * math.sqrt(m * s22 - sb * sb)
    )
    assert abs(row.memory_m - mm) < 1e-5


def test_burstiness_calibration_laws():
    def b_of(gaps):
        n = len(gaps)
        mu = sum(gaps) / n
        sd = math.sqrt(sum(g * g for g in gaps) / n - mu * mu)
        return (sd - mu) / (sd + mu)

    # clockwork: sd = 0 => B = -1
    assert b_of([100] * 50) == -1.0
    # exponential (sin-hash inverse CDF): B ~ 0 (sd ~ mu)
    us = [
        (math.sin(t * 12.9898 + 78.233) * 43758.5453) % 1.0
        for t in range(1, 5001)
    ]
    b = b_of([-math.log(1.0 - u) for u in us])
    assert abs(b) < 0.05
