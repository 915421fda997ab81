"""Definition-level checks for ext111: literal capability moments,
per-day p-chart scan, and scipy-free exact binomial OC."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext111 import (
    _LSL,
    _TGT,
    _USL,
    q_oc_curve_sampling_plan,
    q_p_chart_violations,
    q_process_capability_cpk,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_capability_definition(spark, sf_dir):
    row = q_process_capability_cpk(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    d = (
        (pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)).dt.days
    ).clip(lower=0).to_numpy().astype("float64")
    mu, sg = d.mean(), d.std(ddof=0)
    assert row["n_lines"] == len(d)
    assert abs(row["mean_lead_days"] - mu) < 1e-3
    assert abs(row["sd_lead_days"] - sg) < 1e-3
    assert abs(row["cp"] - (_USL - _LSL) / (6 * sg)) < 1e-3
    assert abs(row["cpk"] - min(_USL - mu, mu - _LSL) / (3 * sg)) < 1e-3
    assert abs(row["taguchi_loss_days2"] - (sg**2 + (mu - _TGT) ** 2)) < 0.05
    oos = ((d < _LSL) | (d > _USL)).mean()
    assert abs(row["observed_oos_rate"] - oos) < 1e-6
    # Cpk never exceeds Cp
    assert row["cpk"] <= row["cp"] + 1e-9


def test_p_chart_definition(spark, sf_dir):
    row = q_p_chart_violations(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag"
    ).toPandas()
    li["r"] = (li.l_returnflag == "R").astype(int)
    d = li.groupby("l_shipdate").r.agg(["size", "sum"])
    p0 = d["sum"].sum() / d["size"].sum()
    viol = 0
    worst = 0.0
    for _, r in d.iterrows():
        n, k = int(r["size"]), int(r["sum"])
        p = k / n
        half = 3 * math.sqrt(p0 * (1 - p0) / n)
        if p > p0 + half:
            viol += 1
            worst = max(worst, p - (p0 + half))
        elif p < p0 - half:
            viol += 1
            worst = max(worst, (p0 - half) - p)
    assert abs(row["center_p"] - p0) < 1e-6
    assert row["n_days"] == len(d)
    assert row["n_violations"] == viol
    assert abs(row["violation_rate"] - viol / len(d)) < 1e-6
    assert abs(row["worst_excess"] - worst) < 1e-5


def test_oc_curve_definition(spark, sf_dir):
    rows = {r["defect_pct"]: r for r in q_oc_curve_sampling_plan(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(1, 11))
    prev = 1.1
    for pct in range(1, 11):
        p = pct / 100
        q = 1 - p
        pa = q**50 + 50 * p * q**49 + 1225 * p * p * q**48
        r = rows[pct]
        assert abs(r["p_accept"] - pa) < 1e-5
        assert abs(r["p_reject"] - (1 - pa)) < 1e-5
        assert abs(r["aoq"] - p * pa) < 1e-5
        # OC curve is monotone decreasing in the defect rate
        assert r["p_accept"] < prev
        prev = r["p_accept"]
