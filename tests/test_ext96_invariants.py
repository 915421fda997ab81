"""Definition-level checks for ext96: literal GPD MoM, compound-
Poisson identity, and Buhlmann-Straub variance components."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext96 import (
    q_buhlmann_credibility,
    q_compound_poisson_aggregate,
    q_gpd_pot_fit,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_gpd_definition(spark, sf_dir):
    row = q_gpd_pot_fit(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_totalprice").toPandas()
    v = (
        np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    )
    s = np.sort(v)
    n = len(s)
    cc = np.arange(1, n + 1)
    u = int(s[np.argmax(100 * cc >= 99 * n)])
    assert row["threshold_dollars"] == u
    e = (v[v > u] - u).astype("float64")
    assert row["n_exceedances"] == len(e)
    m, var = e.mean(), e.var(ddof=0)
    xi = 0.5 * (1 - m * m / var)
    beta = 0.5 * m * (m * m / var + 1)
    assert abs(row["mean_excess_dollars"] - m) < 0.02
    assert abs(row["gpd_xi"] - xi) < 1e-4
    assert abs(row["gpd_beta"] - beta) < max(0.02, 1e-4 * beta)
    # GPD consistency: mean = beta/(1-xi) under the fit
    assert abs(m - beta / (1 - xi)) < 1e-6 * max(1.0, m)


def test_compound_poisson_definition(spark, sf_dir):
    row = q_compound_poisson_aggregate(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    ).toPandas()
    r = li[li.l_returnflag == "R"].copy()
    r["x"] = (
        np.floor(r.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    )
    x = r.x.to_numpy().astype("float64")
    daily = r.groupby("l_shipdate").x.agg(["size", "sum"])
    nd = len(daily)
    lam = daily["size"].sum() / nd
    ex, ex2 = x.mean(), (x**2).mean()
    obs_var = daily["sum"].to_numpy().astype("float64").var(ddof=0)
    assert row["n_days"] == nd
    assert abs(row["lambda_per_day"] - lam) < 1e-3
    assert abs(row["mean_severity_dollars"] - ex) < 0.02
    assert abs(row["predicted_sd_dollars"] - np.sqrt(lam * ex2)) < 0.5
    assert abs(row["observed_sd_dollars"] - np.sqrt(obs_var)) < 0.5
    assert abs(row["dispersion_ratio"] - obs_var / (lam * ex2)) < 1e-3


def test_buhlmann_definition(spark, sf_dir):
    row = q_buhlmann_credibility(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["x"] = (
        np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64") // 100
    )
    g = o.groupby("o_custkey").x
    i = g.ngroups
    mtot = len(o)
    within = sum(((grp - grp.mean()) ** 2).sum() for _, grp in g)
    dfw = sum(len(grp) - 1 for _, grp in g)
    vhat = within / dfw
    xbar = o.x.mean()
    between = sum(len(grp) * (grp.mean() - xbar) ** 2 for _, grp in g)
    m2 = sum(len(grp) ** 2 for _, grp in g)
    ahat = (between - (i - 1) * vhat) / (mtot - m2 / mtot)
    assert row["n_customers"] == i
    assert abs(row["process_var_dollars2"] - vhat) < max(1.0, 1e-4 * vhat)
    assert abs(row["between_var_dollars2"] - ahat) < max(1.0, 1e-3 * abs(ahat))
    k = vhat / ahat
    assert abs(row["credibility_k"] - k) < max(1e-3, 1e-3 * k)
    for m, col in [(1, "z_at_1_order"), (5, "z_at_5_orders"), (20, "z_at_20_orders")]:
        assert abs(row[col] - m / (m + k)) < 1e-3
    # credibility grows with history
    assert row["z_at_1_order"] < row["z_at_5_orders"] < row["z_at_20_orders"]
