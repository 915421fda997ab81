"""Definition-level re-derivations for the ext19 batch (fraud/ML-eval):
each optimized formulation is checked against the LITERAL definition at
test scale -- the CLAUDE.md lesson that oracle parity alone can't catch
a formulation both engines share."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext19 import (
    q_rfm_segmentation,
    q_roc_auc_score,
    q_structuring_near_threshold,
    q_threshold_sweep_confusion,
    q_velocity_flags,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_rfm_matches_literal_ntile(spark, sf_dir):
    """Segment cells must equal the single-window ntile(5) formulation."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("m"),
    )
    anch = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    rfm = base.crossJoin(F.broadcast(anch)).select(
        "cust", F.datediff("anchor", "last_d").cast("bigint").alias("r_days"), "f", "m"
    )
    lit = rfm.select(
        "m",
        F.ntile(5).over(Window.orderBy("r_days", "cust")).alias("r_q"),
        F.ntile(5).over(Window.orderBy("f", "cust")).alias("f_q"),
        F.ntile(5).over(Window.orderBy("m", "cust")).alias("m_q"),
    )
    want = {
        (r["r_q"], r["f_q"], r["m_q"]): (r["n"], r["tc"])
        for r in lit.groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("m").alias("tc"))
        .collect()
    }
    got = {
        (r["r_q"], r["f_q"], r["m_q"]): (r["n_customers"], r["total_cents"])
        for r in q_rfm_segmentation(spark, sf_dir).collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def scored_events(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "events")
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
            F.col("value").alias("v"),
        )
        .collect()
    )
    return [(r["y"], r["v"]) for r in rows]


def test_auc_matches_pairwise_definition(spark, sf_dir, scored_events):
    """AUC == P(score_pos > score_neg) + 0.5 P(tie) over ALL pos x neg
    pairs -- the literal O(n1*n0) definition."""
    import numpy as np

    pos = np.array([v for y, v in scored_events if y == 1])
    neg = np.array([v for y, v in scored_events if y == 0])
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    row = q_roc_auc_score(spark, sf_dir).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert math.isclose(row["auc"], round(want, 6), abs_tol=1.1e-6)


def test_confusion_matches_direct_filtering(spark, sf_dir, scored_events):
    got = {r["threshold"]: r for r in q_threshold_sweep_confusion(spark, sf_dir).collect()}
    assert set(got) == {50.0 * i for i in range(10)}
    for t, r in got.items():
        tp = sum(1 for y, v in scored_events if v >= t and y == 1)
        fp = sum(1 for y, v in scored_events if v >= t and y == 0)
        fn = sum(1 for y, v in scored_events if v < t and y == 1)
        tn = sum(1 for y, v in scored_events if v < t and y == 0)
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn), t
        if tp + fp:
            assert math.isclose(r["precision"], round(tp / (tp + fp), 6), abs_tol=1e-9)
        else:
            assert r["precision"] is None


def test_velocity_matches_python_sliding_window(spark, sf_dir):
    orders = (
        read_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("ed"),
        )
        .collect()
    )
    by_cust: dict = {}
    for r in orders:
        by_cust.setdefault(r["cust"], []).append(r["ed"])
    want = {}
    for cust, days in by_cust.items():
        days.sort()
        best = max(
            sum(1 for e in days if d - 29 <= e <= d) for d in days
        )
        want[cust] = (best, 1 if best >= 3 else 0)
    got = {
        r["cust"]: (r["max_30d_txns"], r["flagged"])
        for r in q_velocity_flags(spark, sf_dir).collect()
    }
    assert got == want


def test_structuring_counts_and_flags(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    near: dict = {}
    tot: dict = {}
    for r in orders:
        tot[r["o_custkey"]] = tot.get(r["o_custkey"], 0) + 1
        if 9000 < r["o_totalprice"] <= 10000:
            near[r["o_custkey"]] = near.get(r["o_custkey"], 0) + 1
    got = {r["cust"]: r for r in q_structuring_near_threshold(spark, sf_dir).collect()}
    assert set(got) == set(near)
    for cust, n_near in near.items():
        r = got[cust]
        assert r["n_near"] == n_near and r["n_orders"] == tot[cust]
        assert r["flagged"] == (1 if n_near >= 2 else 0)
