"""Definition-level checks for ext88: TLS eigen solve for Deming,
literal per-stratum quadratic for Breslow-Day, and a direct O/E SMR."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext88 import (
    q_breslow_day_test,
    q_deming_regression,
    q_indirect_standardization_smr,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cells(spark, sf_dir):
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
    j["exposed"] = (j.l_discount >= 0.05).astype(int)
    j["outcome"] = (j.l_returnflag == "R").astype(int)
    rows = []
    for st, grp in j.groupby("c_nationkey"):
        a = int(((grp.exposed == 1) & (grp.outcome == 1)).sum())
        b = int(((grp.exposed == 1) & (grp.outcome == 0)).sum())
        c = int(((grp.exposed == 0) & (grp.outcome == 1)).sum())
        d = int(((grp.exposed == 0) & (grp.outcome == 0)).sum())
        rows.append((st, a, b, c, d))
    return pd.DataFrame(rows, columns=["st", "a", "b", "c", "d"])


def test_deming_definition(spark, sf_dir):
    row = q_deming_regression(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = pd.DataFrame({"dt": o.o_orderdate, "y": cents}).groupby("dt").agg(
        x=("y", "size"), y=("y", "sum")
    )
    x = g.x.to_numpy().astype("float64")
    y = g.y.to_numpy().astype("float64")
    n = len(x)
    assert row["n_days"] == n
    cxx = ((x - x.mean()) ** 2).sum()
    cyy = ((y - y.mean()) ** 2).sum()
    cxy = ((x - x.mean()) * (y - y.mean())).sum()
    beta = (cyy - cxx + np.sqrt((cyy - cxx) ** 2 + 4 * cxy**2)) / (2 * cxy)
    assert abs(row["deming_slope_dollars"] - beta / 100) < max(
        1e-2, 1e-5 * beta / 100
    )
    assert abs(row["ols_slope_dollars"] - cxy / cxx / 100) < 1e-2
    # TLS slope equals the principal eigenvector slope of the 2x2 SSCP
    m = np.array([[cxx, cxy], [cxy, cyy]])
    w, v = np.linalg.eigh(m)
    evec = v[:, np.argmax(w)]
    assert abs(beta - evec[1] / evec[0]) < 1e-6 * abs(beta)
    # Deming slope magnitude never below OLS (attenuation correction)
    assert row["attenuation_factor"] >= 1.0
    assert abs(
        row["intercept_dollars"] - (y.mean() - beta * x.mean()) / 100
    ) < max(0.5, 1e-4 * abs(y.mean()) / 100)


def test_breslow_day_definition(spark, sf_dir):
    row = q_breslow_day_test(spark, sf_dir).collect()[0]
    cells = _cells(spark, sf_dir)
    cells = cells[
        (cells.a + cells.b > 0)
        & (cells.c + cells.d > 0)
        & (cells.a + cells.c > 0)
        & (cells.b + cells.d > 0)
    ]
    n = cells.a + cells.b + cells.c + cells.d
    psi = (cells.a * cells.d / n).sum() / (cells.b * cells.c / n).sum()
    bd = 0.0
    for r in cells.itertuples():
        N = r.a + r.b + r.c + r.d
        r1, c1 = r.a + r.b, r.a + r.c
        aq = psi - 1
        bq = psi * (r1 + c1) + (N - r1 - c1)
        cq = psi * r1 * c1
        atil = (bq - np.sqrt(bq * bq - 4 * aq * cq)) / (2 * aq)
        var_inv = (
            1 / atil + 1 / (r1 - atil) + 1 / (c1 - atil) + 1 / (N - r1 - c1 + atil)
        )
        bd += (r.a - atil) ** 2 * var_inv
        # the fitted cell respects its margins
        assert 0 < atil < min(r1, c1)
    assert row["n_strata"] == len(cells)
    assert row["dof"] == len(cells) - 1
    assert abs(row["bd_stat"] - bd) < max(1e-2, 1e-4 * bd)


def test_smr_definition(spark, sf_dir):
    row = q_indirect_standardization_smr(spark, sf_dir).collect()[0]
    cells = _cells(spark, sf_dir)
    cells = cells[cells.a + cells.b > 0]
    n = cells.a + cells.b + cells.c + cells.d
    observed = int(cells.a.sum())
    expected = ((cells.a + cells.c) * (cells.a + cells.b) / n).sum()
    assert row["n_strata"] == len(cells)
    assert row["observed"] == observed
    assert abs(row["expected"] - expected) < 1e-2
    assert abs(row["smr"] - observed / expected) < 1e-4
    assert abs(row["z_score"] - (observed - expected) / np.sqrt(expected)) < 1e-2
