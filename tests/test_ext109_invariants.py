"""Definition-level checks for ext109: literal cluster scan, numpy
Hausman, and a literal Bowker over the matched quartile matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext109 import (
    q_bowker_symmetry_test,
    q_extremal_index_runs,
    q_hausman_ols_iv,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_extremal_index_definition(spark, sf_dir):
    row = q_extremal_index_runs(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    d = (
        pd.DataFrame({"dt": pd.to_datetime(o.o_orderdate), "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
    )
    s = np.sort(d.to_numpy())
    n = len(s)
    cc = np.arange(1, n + 1)
    u = int(s[np.argmax(100 * cc >= 95 * n)])
    assert row["threshold_dollars"] == u // 100
    exc = d[d > u].index
    n_exc = len(exc)
    clusters = 1
    for a, b in zip(exc[:-1], exc[1:]):
        if (b - a).days > 1:
            clusters += 1
    assert row["n_exceedances"] == n_exc
    assert row["n_clusters"] == clusters
    assert abs(row["extremal_index"] - clusters / n_exc) < 1e-6
    assert abs(row["mean_cluster_size"] - n_exc / clusters) < 1e-3
    assert 0 < row["extremal_index"] <= 1.0


def test_hausman_definition(spark, sf_dir):
    row = q_hausman_ols_iv(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        cu, left_on="o_custkey", right_on="c_custkey"
    )
    z = (j.c_nationkey % 2).to_numpy().astype("float64")
    x = (j.l_discount >= 0.05).to_numpy().astype("float64")
    y = (j.l_returnflag == "R").to_numpy().astype("float64")
    n = len(x)
    assert row["n_lines"] == n
    cxy = np.cov(x, y, bias=True)[0, 1] * n
    cxx = x.var() * n
    czy = np.cov(z, y, bias=True)[0, 1] * n
    czx = np.cov(z, x, bias=True)[0, 1] * n
    czz = z.var() * n
    cyy = y.var() * n
    b_ols = cxy / cxx
    b_iv = czy / czx
    s2 = (cyy / n - b_ols * cxy / n) / (n - 2)
    v_iv = s2 * (czz / n) / (czx / n) ** 2
    v_ols = s2 / (cxx / n)
    h = (b_iv - b_ols) ** 2 / (v_iv - v_ols)
    assert abs(row["beta_ols"] - b_ols) < 1e-5
    assert abs(row["beta_iv"] - b_iv) < 1e-4
    assert abs(row["difference"] - (b_iv - b_ols)) < 1e-4
    assert abs(row["hausman_chi2"] - h) < max(1e-2, 1e-3 * abs(h))
    # the IV variance always exceeds the OLS variance
    assert v_iv > v_ols


def test_bowker_definition(spark, sf_dir):
    row = q_bowker_symmetry_test(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.isin([1996, 1997])]
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    spend = o.groupby(["o_custkey", "yr"]).cents.sum().reset_index()

    def quartiles(grp):
        g = grp.sort_values(["cents", "o_custkey"]).reset_index(drop=True)
        nq = len(g)
        base, rem = divmod(nq, 4)
        tiles = np.empty(nq, dtype="int64")
        start = 0
        for t in range(1, 5):
            size = base + (1 if t <= rem else 0)
            tiles[start : start + size] = t
            start += size
        return dict(zip(g.o_custkey, tiles))

    q96 = quartiles(spend[spend.yr == 1996])
    q97 = quartiles(spend[spend.yr == 1997])
    cells = {}
    for ck, t0 in q96.items():
        if ck in q97:
            cells[(t0, q97[ck])] = cells.get((t0, q97[ck]), 0) + 1
    chi2 = 0.0
    asym = 0
    dof = 0
    for i in range(1, 5):
        for jj in range(i + 1, 5):
            nij = cells.get((i, jj), 0)
            nji = cells.get((jj, i), 0)
            dof += 1
            asym += abs(nij - nji)
            if nij + nji > 0:
                chi2 += (nij - nji) ** 2 / (nij + nji)
    assert row["dof"] == dof == 6
    assert abs(row["bowker_chi2"] - chi2) < 1e-3
    assert row["total_abs_asymmetry"] == asym
    assert row["bowker_chi2"] >= 0.0
