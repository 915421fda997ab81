"""Definition-level re-derivations for the ext20 batch (finance/series,
attribution, bridge, graph mixing, corpus JSD): each distributed
formulation is checked against the LITERAL definition in plain Python
at test scale."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext20 import (
    q_attribution_models,
    q_changepoint_max_cusum,
    q_degree_assortativity,
    q_jsd_source_divergence,
    q_max_drawdown,
    q_revenue_bridge_pvm,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def daily_series(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("x")
        )
        .collect()
    )
    return sorted((str(r["d"]), int(r["x"])) for r in rows)


def test_max_drawdown_matches_literal_scan(spark, sf_dir, daily_series):
    cum = 0
    peak = 0
    best = (-1, None, None, None)  # (draw, trough_d, peak, cum)
    for d, x in daily_series:
        cum += x
        peak = max(peak, cum)
        draw = peak - cum
        if draw > best[0]:  # strict > keeps the EARLIEST trough on ties
            best = (draw, d, peak, cum)
    row = q_max_drawdown(spark, sf_dir).collect()[0]
    assert row["trough_d"] == best[1]
    assert row["peak_cents"] == best[2]
    assert row["trough_cents"] == best[3]
    assert row["max_drawdown_cents"] == best[0]


def test_changepoint_matches_argmax_loop(spark, sf_dir, daily_series):
    xs = [x for _, x in daily_series]
    n, s = len(xs), sum(xs)
    s_l, best = 0, (-1, None, None)
    for k in range(1, n):  # k < n: both segments non-empty
        s_l += xs[k - 1]
        stat = abs(n * s_l - k * s)
        if stat > best[0]:
            best = (stat, k, s_l)
    row = q_changepoint_max_cusum(spark, sf_dir).collect()[0]
    assert row["k"] == best[1]
    assert row["n_days"] == n
    assert row["cusum_stat"] == best[0]
    assert row["split_d"] == daily_series[best[1] - 1][0]
    assert row["mean_left_cents"] == best[2] // best[1]
    assert row["mean_right_cents"] == (s - best[2]) // (n - best[1])


def test_changepoint_equals_weighted_mean_shift_argmax(daily_series):
    """|n*S_l - k*S| == k(n-k)|mean_l - mean_r| * scale: the max-CUSUM
    statistic IS the weighted mean-shift objective (why it's the LS
    changepoint for fixed variance)."""
    xs = [x for _, x in daily_series]
    n, s = len(xs), sum(xs)
    s_l = 0
    for k in range(1, n):
        s_l += xs[k - 1]
        lhs = abs(n * s_l - k * s)
        rhs = k * (n - k) * abs(s_l / k - (s - s_l) / (n - k))
        assert math.isclose(lhs, rhs, rel_tol=1e-9)


def test_attribution_matches_python_brute_force(spark, sf_dir):
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    touches = [r for r in ev if r["event_type"] in ("view", "click", "signup")]
    first = defaultdict(int)
    last = defaultdict(int)
    linear_e8 = defaultdict(int)
    n_touch = defaultdict(int)
    for p in purchases:
        win = sorted(
            (
                t
                for t in touches
                if t["user_id"] == p["user_id"]
                and p["us"] - 604800000000 <= t["us"] <= p["us"]
            ),
            key=lambda t: (t["us"], t["event_id"]),
        )
        if not win:
            continue
        first[win[0]["event_type"]] += 1
        last[win[-1]["event_type"]] += 1
        for t in win:
            n_touch[t["event_type"]] += 1
            linear_e8[t["event_type"]] += round(1e8 / len(win))
    got = {r["channel"]: r for r in q_attribution_models(spark, sf_dir).collect()}
    assert set(got) == set(n_touch)
    for ch, r in got.items():
        assert r["n_touches"] == n_touch[ch]
        assert r["first_touch"] == first[ch]
        assert r["last_touch"] == last[ch]
        assert math.isclose(r["linear_credit"], round(linear_e8[ch] / 1e8, 6), abs_tol=1e-9)
    # every attributed purchase hands out exactly one first and one last
    assert sum(first.values()) == sum(last.values())


def test_revenue_bridge_additivity_and_values(spark, sf_dir):
    rows = q_revenue_bridge_pvm(spark, sf_dir).collect()
    assert rows, "both years must exist in the corpus"
    for r in rows:
        p0, p1 = r["r0_cents"] / r["q0"], r["r1_cents"] / r["q1"]
        # exact decomposition identity before rounding
        want_v = (r["q1"] - r["q0"]) * p0
        want_p = (p1 - p0) * r["q0"]
        want_m = (r["q1"] - r["q0"]) * (p1 - p0)
        assert math.isclose(
            want_v + want_p + want_m, r["r1_cents"] - r["r0_cents"], rel_tol=1e-9
        )
        assert abs(r["volume_effect_cents"] - want_v) <= 0.51
        assert abs(r["price_effect_cents"] - want_p) <= 0.51
        assert abs(r["mix_effect_cents"] - want_m) <= 0.51
        assert r["delta_cents"] == r["r1_cents"] - r["r0_cents"]


def test_assortativity_matches_numpy_pearson(spark, sf_dir):
    import numpy as np

    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg = defaultdict(int)
    for a, _ in edges:
        deg[a] += 1
    dx = np.array([deg[a] for a, b in edges], dtype=float)
    dy = np.array([deg[b] for a, b in edges], dtype=float)
    want = np.corrcoef(dx, dy)[0, 1]
    row = q_degree_assortativity(spark, sf_dir).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(deg)
    assert math.isclose(row["assortativity"], want, abs_tol=2e-6)


def test_jsd_matches_direct_formula_and_bounds(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    ca: dict = defaultdict(int)
    cb: dict = defaultdict(int)
    for r in docs:
        side = int(r["source"][3:]) % 2
        for w in r["text"].split(" "):
            if w:
                (ca if side == 0 else cb)[w] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for w in set(ca) | set(cb):
        p = ca.get(w, 0) / na
        q = cb.get(w, 0) / nb
        m = 0.5 * p + 0.5 * q
        if p:
            jsd += 0.5 * p * math.log(p / m)
        if q:
            jsd += 0.5 * q * math.log(q / m)
    row = q_jsd_source_divergence(spark, sf_dir).collect()[0]
    assert row["n_tokens_even"] == na and row["n_tokens_odd"] == nb
    assert row["vocab"] == len(set(ca) | set(cb))
    assert math.isclose(row["jsd_nats"], jsd, abs_tol=2e-6)
    assert 0.0 <= row["jsd_nats"] <= math.log(2) + 1e-9
