"""Definition-level checks for the ext61 batch: each statistic is
re-derived from its textbook definition in pure Python/numpy on the
sf0.001 tables (CLAUDE.md discipline -- catches formulations that both
engines could share wrongly, which the oracle cannot)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext61 import (
    _H48,
    _KMV_K,
    q_kmv_distinct_sketch,
    q_mann_kendall_trend,
    q_pettitt_changepoint,
    q_wasserstein_price_gap,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _orders_pdf(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
        .toPandas()
    )


def test_kmv_matches_literal_order_statistic(spark, sf_dir):
    got = {r["arm"]: r for r in q_kmv_distinct_sketch(spark, sf_dir).collect()}
    o = _orders_pdf(spark, sf_dir)
    arms = {
        "h1": set(o[o.o_orderdate < np.datetime64("1998-01-01")].o_custkey),
        "h2": set(o[o.o_orderdate >= np.datetime64("1998-01-01")].o_custkey),
    }
    hset = {
        arm: sorted(
            int(hashlib.md5(str(ck).encode()).hexdigest()[:12], 16) for ck in cks
        )
        for arm, cks in arms.items()
    }
    hset["union"] = sorted(set(hset["h1"]) | set(hset["h2"]))
    for arm, hs in hset.items():
        row = got[arm]
        assert row["exact_distinct"] == len(hs)
        if len(hs) < _KMV_K:
            want = len(hs)
        else:
            want = (_KMV_K - 1) * _H48 // hs[_KMV_K - 1]
        assert row["kmv_estimate"] == want
        assert row["abs_err_ppm"] == (1000000 * abs(want - len(hs))) // len(hs)
        # the estimator actually estimates: within 40% at k=64
        assert abs(want - len(hs)) <= 0.4 * len(hs)


def _arm_values(o):
    sel = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    v = np.floor(sel.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    arm = (sel.o_orderpriority == "1-URGENT").to_numpy()
    return v[arm], v[~arm]


def test_wasserstein_matches_literal_edf_area(spark, sf_dir):
    row = q_wasserstein_price_gap(spark, sf_dir).collect()[0]
    o = _orders_pdf(spark, sf_dir)
    x, y = _arm_values(o)
    # literal W1 = integral |F_x - F_y| over the merged support
    vs = np.unique(np.concatenate([x, y]))
    fx = np.searchsorted(np.sort(x), vs, side="right") / len(x)
    fy = np.searchsorted(np.sort(y), vs, side="right") / len(y)
    w1 = float(np.sum(np.diff(vs) * np.abs(fx - fy)[:-1]))
    assert row["n_urgent"] == len(x) and row["n_low"] == len(y)
    assert abs(row["w1_dollars"] - w1 / 100.0) < 1e-6
    assert row["w1_cents_floor"] == int(
        sum(
            int(vs[i + 1] - vs[i])
            * abs(
                int(round(fx[i] * len(x))) * len(y)
                - int(round(fy[i] * len(y))) * len(x)
            )
            for i in range(len(vs) - 1)
        )
        // (len(x) * len(y))
    )


def _daily(o):
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    days, cents = days[order], cents[order]
    uniq, idx = np.unique(days, return_index=True)
    sums = np.add.reduceat(cents, idx)
    return uniq, sums


def test_mann_kendall_matches_literal_pairs(spark, sf_dir):
    row = q_mann_kendall_trend(spark, sf_dir).collect()[0]
    o = _orders_pdf(spark, sf_dir)
    _, x = _daily(o)
    n = len(x)
    s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(n, 1)].sum())
    _, counts = np.unique(x, return_counts=True)
    tie = sum(int(t) * (t - 1) * (2 * t + 5) for t in counts if t > 1)
    var18 = n * (n - 1) * (2 * n + 5) - tie
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var_s_x18"] == var18
    if s > 0:
        z = (s - 1) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    assert abs(row["z_score"] - z) < 1e-6


def test_pettitt_matches_literal_rank_scan(spark, sf_dir):
    row = q_pettitt_changepoint(spark, sf_dir).collect()[0]
    o = _orders_pdf(spark, sf_dir)
    days, x = _daily(o)
    n = len(x)
    # average ranks (ties share), doubled to stay integral
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(n, dtype="float64")
    sx = x[order]
    i = 0
    while i < n:
        j = i
        while j < n and sx[j] == sx[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    d2 = (2 * ranks).astype("int64")
    u2 = np.cumsum(d2)[:-1] - (np.arange(1, n) * (n + 1))
    k_idx = int(np.argmax(np.abs(u2)))  # argmax takes the FIRST max = earliest day
    k2 = int(abs(u2[k_idx]))
    assert row["n_days"] == n
    assert row["k2_stat"] == k2
    assert str(row["changepoint_date"])[:10] == str(np.datetime_as_string(days[k_idx]))[:10]
    k = k2 / 2.0
    p = 2 * math.exp(-6.0 * k * k / (n**3 + n**2))
    assert abs(row["p_approx"] - p) < 1e-6
