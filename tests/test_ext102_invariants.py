"""Definition-level checks for ext102: literal sandwich variance,
literal jackknife replicas, and numpy circular statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext102 import (
    q_circular_seasonality_rayleigh,
    q_cluster_robust_se,
    q_jackknife_nation_se,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_cluster_robust_definition(spark, sf_dir):
    row = q_cluster_robust_se(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    ).toPandas()
    su = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).toPandas()
    j = li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
    x = j.l_quantity.to_numpy().astype("float64")
    y = (
        np.floor(j.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    ).astype("float64")
    g = j.s_nationkey.to_numpy()
    n = len(x)
    b = np.cov(x, y, bias=True)[0, 1] / x.var()
    a = y.mean() - b * x.mean()
    e = np.floor(y - a - b * x + 0.5)
    xc = x - x.mean()
    u = xc * e
    sg = pd.Series(u).groupby(g).sum().to_numpy()
    G = len(sg)
    sxx = (xc**2).sum()
    c = G / (G - 1) * (n - 1) / (n - 2)
    se_cl = np.sqrt(c * (sg**2).sum()) / sxx
    se_ols = np.sqrt((e**2).sum() / (n - 2) / sxx)
    assert row["n_lines"] == n and row["n_clusters"] == G
    assert abs(row["slope_dollars_per_unit"] - b) < 1e-4
    assert abs(row["se_ols"] - se_ols) < max(1e-4, 1e-3 * se_ols)
    assert abs(row["se_cluster"] - se_cl) < max(1e-4, 1e-3 * se_cl)
    assert abs(row["cluster_inflation"] - se_cl / se_ols) < 1e-2
    assert row["se_cluster"] > 0 and row["se_ols"] > 0


def test_jackknife_definition(spark, sf_dir):
    row = q_jackknife_nation_se(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    per = j.groupby("c_nationkey").agg(n=("cents", "size"), r=("cents", "sum"))
    nt, rt = int(per.n.sum()), int(per.r.sum())
    theta = rt / nt / 100
    reps = np.array(
        [(rt - r) / (nt - n) / 100 for n, r in zip(per.n, per.r)]
    )
    G = len(reps)
    se = np.sqrt((G - 1) / G * ((reps - reps.mean()) ** 2).sum())
    bias = (G - 1) * (reps.mean() - theta)
    assert row["n_groups"] == G
    assert abs(row["theta_dollars"] - theta) < 1e-3
    assert abs(row["jackknife_se_dollars"] - se) < max(1e-3, 1e-3 * se)
    assert abs(row["jackknife_bias_dollars"] - bias) < 1e-3
    assert row["jackknife_se_dollars"] > 0


def test_circular_definition(spark, sf_dir):
    row = q_circular_seasonality_rayleigh(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate").toPandas()
    doy = pd.to_datetime(o.o_orderdate).dt.dayofyear.to_numpy()
    ang = 2 * np.pi * (doy - 0.5) / 366.0
    n = len(doy)
    cs, sn = np.cos(ang).sum(), np.sin(ang).sum()
    rbar = np.sqrt(cs**2 + sn**2) / n
    theta = np.arctan2(sn, cs)
    if theta < 0:
        theta += 2 * np.pi
    assert row["n_orders"] == n
    assert abs(row["resultant_rbar"] - rbar) < 1e-5
    assert abs(row["rayleigh_z"] - n * rbar * rbar) < 0.05
    assert abs(
        row["circular_sd_days"] - np.sqrt(-2 * np.log(rbar)) * 366 / (2 * np.pi)
    ) < 0.25
    assert abs(row["mean_direction_doy"] - theta * 366 / (2 * np.pi)) < 0.5
    # a ~uniform yearly spread has tiny resultant
    assert 0.0 <= row["resultant_rbar"] <= 1.0
