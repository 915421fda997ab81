"""Definition-level checks for ext113: literal sBG MoM, np.lstsq
2SLS + Sargan, and a literal mobility trace."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext113 import (
    q_sargan_overid_test,
    q_sbg_retention_projection,
    q_shorrocks_mobility_index,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_sbg_definition(spark, sf_dir):
    row = q_sbg_retention_projection(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    ).toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    first = o.groupby("o_custkey").yr.min()
    last = o.groupby("o_custkey").yr.max()
    y0 = int(o.yr.max()) - 3
    c93 = first[first == y0].index
    n0 = len(c93)
    n1 = int((last[c93] >= y0 + 1).sum())
    n2 = int((last[c93] >= y0 + 2).sum())
    n3 = int((last[c93] >= y0 + 3).sum())
    r1, r2 = n1 / n0, n2 / n1
    beta = r1 * (1 - r2) / (r2 - r1)
    alpha = beta * (1 - r1) / r1
    assert row["cohort_size"] == n0
    assert abs(row["observed_r1"] - r1) < 1e-6
    assert abs(row["observed_r2"] - r2) < 1e-6
    assert abs(row["observed_r3"] - n3 / n2) < 1e-6
    assert abs(row["sbg_alpha"] - alpha) < 1e-3
    assert abs(row["sbg_beta"] - beta) < 1e-3
    degenerate = r2 >= 1.0 or r1 in (0.0, 1.0) or n0 < 30
    if not degenerate:
        # the MoM fit reproduces r1 and r2 exactly by construction
        assert abs(beta / (alpha + beta) - r1) < 1e-12
        assert abs((beta + 1) / (alpha + beta + 1) - r2) < 1e-12
        # sBG retention is increasing in tenure
        assert row["sbg_pred_r3"] > row["observed_r2"] - 1e-9
        assert row["sbg_pred_r4"] > row["sbg_pred_r3"] - 1e-9


def test_sargan_definition(spark, sf_dir):
    row = q_sargan_overid_test(spark, sf_dir).collect()[0]
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
    z1 = (j.c_nationkey % 2).to_numpy().astype("float64")
    z2 = ((j.c_nationkey // 2) % 2).to_numpy().astype("float64")
    x = (j.l_discount >= 0.05).to_numpy().astype("float64")
    y = (j.l_returnflag == "R").to_numpy().astype("float64")
    n = len(x)
    assert row["n_lines"] == n
    Z = np.column_stack([np.ones(n), z1, z2])
    # 2SLS: first stage, then slope of y on fitted x
    g, *_ = np.linalg.lstsq(Z, x, rcond=None)
    xh = Z @ g
    b = np.cov(xh, y, bias=True)[0, 1] / xh.var()
    assert abs(row["beta_2sls"] - b) < 1e-4
    e = y - y.mean() - b * (x - x.mean())
    d, *_ = np.linalg.lstsq(Z, e, rcond=None)
    r2 = 1 - ((e - Z @ d) ** 2).sum() / ((e - e.mean()) ** 2).sum()
    assert abs(row["sargan_j"] - n * r2) < max(0.05, 1e-2 * abs(n * r2))
    assert row["dof"] == 1
    assert row["sargan_j"] >= -1e-9


def test_shorrocks_definition(spark, sf_dir):
    row = q_shorrocks_mobility_index(spark, sf_dir).collect()[0]
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
    rows_m = [(q96[ck], q97[ck]) for ck in q96 if ck in q97]
    n = len(rows_m)
    stay = sum(1 for a, b in rows_m if a == b)
    trace = 0.0
    for i in range(1, 5):
        nr = sum(1 for a, _ in rows_m if a == i)
        diag = sum(1 for a, b in rows_m if a == i and b == i)
        trace += diag / nr
    m = (4 - trace) / 3
    assert row["n_matched"] == n
    assert abs(row["stay_share"] - stay / n) < 1e-6
    assert abs(row["shorrocks_m"] - m) < 1e-4
    assert 0.0 <= row["shorrocks_m"] <= 4 / 3 + 1e-9
