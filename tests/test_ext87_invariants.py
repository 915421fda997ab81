"""Definition-level checks for ext87: literal pandas Tornqvist,
Atkinson means, Palma shares, and a delta-method ratio re-derivation."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext87 import (
    q_atkinson_index,
    q_palma_ratio,
    q_srm_delta_ratio,
    q_tornqvist_price_index,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _spend(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    return o


def test_tornqvist_definition(spark, sf_dir):
    row = q_tornqvist_price_index(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["yr"] = pd.to_datetime(j.o_orderdate).dt.year
    j = j[j.yr.isin([1996, 1997])]
    j["rev"] = np.floor(j.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    j["qty"] = j.l_quantity.astype("int64")
    py = j.groupby(["l_partkey", "yr"]).agg(
        rev=("rev", "sum"), qty=("qty", "sum")
    )
    trev = py.groupby("yr").rev.sum()
    a = py.xs(1996, level="yr")
    b = py.xs(1997, level="yr")
    common = a.index.intersection(b.index)
    assert row["n_parts"] == len(common)
    w0 = a.loc[common].rev / trev[1996]
    w1 = b.loc[common].rev / trev[1997]
    p0 = a.loc[common].rev / a.loc[common].qty
    p1 = b.loc[common].rev / b.loc[common].qty
    lnT = ((w0 + w1) / 2 * np.log(p1 / p0)).sum()
    assert abs(row["tornqvist_index"] - np.exp(lnT)) < 1e-4
    assert abs(row["matched_weight"] - (w0 + w1).sum() / 2) < 1e-4
    assert 0.0 < row["matched_weight"] <= 1.0


def test_atkinson_definition(spark, sf_dir):
    row = q_atkinson_index(spark, sf_dir).collect()[0]
    o = _spend(spark, sf_dir)
    s = o.groupby("o_custkey").cents.sum().to_numpy().astype("float64")
    assert row["n_customers"] == len(s)
    mean = s.mean()
    a1 = 1 - np.exp(np.log(s).mean()) / mean
    a2 = 1 - 1 / (mean * (1 / s).mean())
    assert abs(row["mean_spend_dollars"] - mean / 100) < 0.02
    assert abs(row["atkinson_eps1"] - a1) < 1e-5
    assert abs(row["atkinson_eps2"] - a2) < 1e-4
    # welfare ordering: higher aversion weighs the poor more
    assert 0.0 <= row["atkinson_eps1"] <= row["atkinson_eps2"] <= 1.0


def test_palma_definition(spark, sf_dir):
    row = q_palma_ratio(spark, sf_dir).collect()[0]
    o = _spend(spark, sf_dir)
    g = o.groupby("o_custkey").cents.sum().reset_index()
    g = g.sort_values(["cents", "o_custkey"]).reset_index(drop=True)
    s = g.cents.to_numpy()
    n = len(s)
    assert row["n_customers"] == n
    tot = s.sum()
    c40 = s[: (4 * n) // 10].sum()
    c90 = s[: (9 * n) // 10].sum()
    assert abs(row["bottom40_share"] - c40 / tot) < 1e-6
    assert abs(row["top10_share"] - (tot - c90) / tot) < 1e-6
    assert abs(row["palma_ratio"] - (tot - c90) / c40) < 1e-4
    assert row["palma_ratio"] > 0


def test_srm_delta_definition(spark, sf_dir):
    row = q_srm_delta_ratio(spark, sf_dir).collect()[0]
    o = _spend(spark, sf_dir)
    g = o.groupby("o_custkey").agg(x=("cents", "sum"), y=("cents", "size"))
    g["arm"] = (g.index % 2).astype(int)
    stats = {}
    for arm, grp in g.groupby("arm"):
        x = grp.x.to_numpy().astype("float64")
        y = grp.y.to_numpy().astype("float64")
        n = len(x)
        r = x.sum() / y.sum()
        var = (
            (x.var(ddof=1) - 2 * r * np.cov(x, y, ddof=1)[0, 1] + r * r * y.var(ddof=1))
            / (y.mean() ** 2)
            / n
        )
        stats[arm] = (n, r, var)
    n1, r1, v1 = stats[1]
    n0, r0, v0 = stats[0]
    assert row["n_arm1"] == n1 and row["n_arm0"] == n0
    chi2 = (n1 - n0) ** 2 / (n1 + n0)
    assert abs(row["srm_chi2"] - chi2) < 1e-3
    assert abs(row["ratio_diff_dollars"] - (r1 - r0) / 100) < 1e-3
    assert abs(row["delta_z"] - (r1 - r0) / np.sqrt(v1 + v0)) < 1e-3
