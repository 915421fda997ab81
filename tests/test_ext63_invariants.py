"""Definition-level checks for the ext63 batch (pure Python/numpy
re-derivations on the sf0.001 tables)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext63 import (
    _HUBER_K,
    _RD_BW,
    _RD_CUT,
    _TEXTRANK_ITERS,
    q_huber_location_2step,
    q_regression_discontinuity,
    q_textrank_keywords,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_rd_matches_literal_ols(spark, sf_dir):
    row = q_regression_discontinuity(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey").toPandas()
    ycnt = li.groupby("l_orderkey").size()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    # inner-join semantics: orders with no lineitem rows (they exist in
    # the synthetic data) have no outcome and drop from the fit
    has_lines = np.isin(o.o_orderkey.to_numpy(), ycnt.index.to_numpy())
    keep = (cents >= _RD_CUT - _RD_BW) & (cents < _RD_CUT + _RD_BW) & has_lines
    u = cents[keep] - _RD_CUT
    y = ycnt.reindex(o.o_orderkey.to_numpy()[keep]).to_numpy().astype("int64")

    def ols(mask):
        uu, yy = u[mask].astype(object), y[mask].astype(object)
        n, su, suu = len(uu), sum(uu), sum(x * x for x in uu)
        sy, suy = sum(yy), sum(a * b for a, b in zip(uu, yy))
        b = (n * suy - su * sy) / (n * suu - su * su)
        a = (sy - b * su) / n
        return n, a, b

    nl, al, bl = ols(u < 0)
    nr, ar, br = ols(u >= 0)
    assert row["n_left"] == nl and row["n_right"] == nr
    assert abs(row["intercept_left"] - al) < 1e-6
    assert abs(row["intercept_right"] - ar) < 1e-6
    assert abs(row["slope_left_per_10kusd"] - bl * 1e6) < 1e-5
    assert abs(row["rd_effect"] - (ar - al)) < 1e-6


def test_huber_matches_literal_irls(spark, sf_dir):
    row = q_huber_location_2step(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = np.sort(np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64"))
    n = len(v)
    m0 = int(v[(n + 1) // 2 - 1])  # lower median: min v with cc >= (n+1)//2
    mad = int(np.sort(np.abs(v - m0))[(n + 1) // 2 - 1])
    ck = _HUBER_K * mad

    def step(center):
        t1 = t2 = 0
        for x in v:
            ad = abs(float(x) - center)
            w = 1.0 if ad == 0 else min(1.0, ck / ad)
            t1 += int(math.floor(1e6 * w * x + 0.5))
            t2 += int(math.floor(1e6 * w + 0.5))
        return round(t1 / t2, 4)

    m1 = step(float(m0))
    m2 = step(m1)
    assert row["n"] == n
    assert row["median_cents"] == m0
    assert row["mad_cents"] == mad
    assert abs(row["huber_m1_cents"] - m1) < 1e-4
    assert abs(row["huber_m2_cents"] - m2) < 1e-4
    # the M-estimator must sit between median and mean (right-skewed data
    # pulls the mean up; Huber should resist most of it)
    mean = v.mean()
    lo, hi = sorted([m0, mean])
    assert lo - 1 <= row["huber_m2_cents"] <= hi + 1


def test_textrank_matches_literal_power_iteration(spark, sf_dir):
    got = q_textrank_keywords(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select("text").toPandas()
    edges = set()
    for text in docs.text:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != b and len(a) >= 4 and len(b) >= 4:
                edges.add((min(a, b), max(a, b)))
    adj = defaultdict(list)
    deg = Counter()
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
        deg[a] += 1
        deg[b] += 1
    nodes = sorted(deg)
    nv = float(len(nodes))
    r = {u: 1.0 / nv for u in nodes}
    for _ in range(_TEXTRANK_ITERS):
        nxt = {}
        for u in nodes:
            s = sum(r[w] / deg[w] for w in adj[u])
            nxt[u] = (1.0 - 0.85) / nv + 0.85 * s
        r = nxt
    want = sorted(
        ((round(r[u], 6), u) for u in nodes), key=lambda t: (-t[0], t[1])
    )[:20]
    assert len(got) == 20
    for row, (rank, tok) in zip(got, want):
        assert row["token"] == tok
        assert row["degree"] == deg[tok]
        assert abs(row["rank"] - rank) < 2e-6  # round(6) + fp sum-order slack
