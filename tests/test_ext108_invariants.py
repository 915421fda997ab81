"""Definition-level checks for ext108: np.lstsq gravity fit, literal
MDE accrual, and a literal zero-count grid."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext108 import (
    q_gravity_trade_model,
    q_mde_accrual_curve,
    q_zero_inflation_score_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_gravity_definition(spark, sf_dir):
    row = q_gravity_trade_model(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    su = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).toPandas()
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(su, left_on="l_suppkey", right_on="s_suppkey")
    )
    j["cents"] = np.floor(j.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    flows = (
        j.groupby(["c_nationkey", "s_nationkey"]).cents.sum() // 100
    ).reset_index(name="f")
    flows = flows[flows.f > 0]
    mc = flows.groupby("c_nationkey").f.sum()
    ms = flows.groupby("s_nationkey").f.sum()
    y = np.log(flows.f.to_numpy().astype("float64"))
    x1 = np.log(flows.c_nationkey.map(mc).to_numpy().astype("float64"))
    x2 = np.log(flows.s_nationkey.map(ms).to_numpy().astype("float64"))
    X = np.column_stack([np.ones(len(y)), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row["n_flows"] == len(flows)
    assert abs(row["elasticity_customer_mass"] - beta[1]) < 5e-3
    assert abs(row["elasticity_supplier_mass"] - beta[2]) < 5e-3
    resid = y - X @ beta
    r2 = 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(row["r2"] - r2) < 5e-3
    assert 0.0 <= row["r2"] <= 1.0


def test_mde_accrual_definition(spark, sf_dir):
    rows = q_mde_accrual_curve(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderpriority"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    o = o[o.dt.dt.year == 1997]
    o["w"] = o.dt.dt.to_period("W").dt.start_time
    wk = o.groupby("w").agg(
        n=("o_orderpriority", "size"),
        k=("o_orderpriority", lambda s: (s == "1-URGENT").sum()),
    ).sort_index()
    cn = wk.n.cumsum().to_numpy()
    ck = wk.k.cumsum().to_numpy()
    picked = [i for i in range(1, len(wk) + 1) if i % 4 == 0 or i == 1]
    assert [r["week_no"] for r in rows] == picked
    for r in rows:
        i = r["week_no"] - 1
        p = ck[i] / cn[i]
        mde = (1.959964 + 0.841621) * math.sqrt(2 * p * (1 - p) / (cn[i] / 2))
        assert r["cum_n"] == int(cn[i])
        assert abs(r["base_rate"] - p) < 1e-6
        assert abs(r["mde_abs"] - mde) < 1e-5
    # MDE shrinks as samples accrue
    mdes = [r["mde_abs"] for r in rows]
    assert all(a >= b for a, b in zip(mdes, mdes[1:]))


def test_zero_inflation_definition(spark, sf_dir):
    row = q_zero_inflation_score_test(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    w = o[o.dt.dt.year.isin([1996, 1997])]
    months = sorted(w.dt.dt.to_period("M").unique())
    custs = sorted(o.o_custkey.unique())
    counts = w.groupby([w.o_custkey, w.dt.dt.to_period("M")]).size()
    n = len(custs) * len(months)
    nonzero = len(counts)
    n0 = n - nonzero
    lam = counts.sum() / n
    e0 = n * math.exp(-lam)
    num = (n0 - e0) ** 2
    den = e0 * (1 - math.exp(-lam)) - n * lam * math.exp(-lam) ** 2
    assert row["n_cells"] == n
    assert row["observed_zeros"] == n0
    assert abs(row["lambda_hat"] - lam) < 1e-3
    assert abs(row["poisson_expected_zeros"] - e0) < 0.5
    assert abs(row["score_stat"] - num / den) < max(0.01, 1e-4 * num / den)
    assert row["score_stat"] >= 0.0
