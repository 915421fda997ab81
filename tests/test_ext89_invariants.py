"""Definition-level checks for ext89: literal record counting,
a direct biweight midvariance, and the Theil additive identity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext89 import (
    q_biweight_midvariance,
    q_record_counts_test,
    q_theil_decomposition,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily_dollars(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    return (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
    )


def test_record_counts_definition(spark, sf_dir):
    row = q_record_counts_test(spark, sf_dir).collect()[0]
    y = _daily_dollars(spark, sf_dir).to_numpy()
    n = len(y)
    records = 1
    mx = y[0]
    for v in y[1:]:
        if v > mx:
            records += 1
            mx = v
    t = np.arange(1, n + 1, dtype="float64")
    h = (1 / t).sum()
    var = ((t - 1) / t**2).sum()
    assert row["n_days"] == n
    assert row["n_records"] == records
    assert abs(row["expected_records"] - h) < 1e-3
    assert abs(row["z_score"] - (records - h) / np.sqrt(var)) < 1e-3
    # the first day is always a record
    assert row["n_records"] >= 1


def test_biweight_definition(spark, sf_dir):
    row = q_biweight_midvariance(spark, sf_dir).collect()[0]
    y = (_daily_dollars(spark, sf_dir).to_numpy() // 100).astype("int64")
    n = len(y)
    s = np.sort(y)
    cc = np.arange(1, n + 1)
    med = int(s[np.argmax(2 * cc >= n)])
    dev = np.abs(y - med)
    sd = np.sort(dev)
    mad = int(sd[np.argmax(2 * cc >= n)])
    assert row["n_days"] == n
    assert row["median_dollars"] == med
    assert row["mad_dollars"] == mad
    u = (y - med) / (9.0 * mad)
    inside = np.abs(u) < 1
    num = ((y - med).astype("float64") ** 2 * (1 - u**2) ** 4)[inside].sum()
    den = ((1 - u**2) * (1 - 5 * u**2))[inside].sum()
    bwmv = n * num / den**2
    assert abs(row["biweight_sd_dollars"] - np.sqrt(bwmv)) < max(
        0.01, 1e-4 * np.sqrt(bwmv)
    )
    sdc = y.astype("float64").std(ddof=0)
    assert abs(row["classical_sd_dollars"] - sdc) < 0.01
    assert abs(row["robust_ratio"] - np.sqrt(bwmv) / sdc) < 1e-4
    # robust scale can't exceed classical by much on mild data
    assert 0.2 < row["robust_ratio"] < 2.0


def test_theil_decomposition_definition(spark, sf_dir):
    row = q_theil_decomposition(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    spend = o.groupby("o_custkey").cents.sum().reset_index()
    spend = spend.merge(cu, left_on="o_custkey", right_on="c_custkey")
    x = spend.cents.to_numpy().astype("float64")
    g = spend.c_nationkey.to_numpy()
    mu = x.mean()
    t_total = np.mean(x / mu * np.log(x / mu))
    t_between = 0.0
    t_within = 0.0
    for gr in np.unique(g):
        xg = x[g == gr]
        sg = xg.sum() / x.sum()
        t_between += sg * np.log(xg.mean() / mu)
        t_within += sg * np.mean(xg / xg.mean() * np.log(xg / xg.mean()))
    assert abs(row["theil_total"] - t_total) < 1e-4
    assert abs(row["theil_between"] - t_between) < 1e-4
    assert abs(row["theil_within"] - t_within) < 1e-3
    # the additive identity is exact
    assert abs(t_total - (t_between + t_within)) < 1e-10
    assert abs(
        row["theil_total"] - (row["theil_between"] + row["theil_within"])
    ) < 3e-6
