"""Definition-level checks for ext110: literal half-split, pandas
Cronbach, and direct contrast arithmetic."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext110 import (
    _LIN,
    _QUAD,
    q_cronbach_alpha_quarters,
    q_orthogonal_poly_contrasts,
    q_split_half_reliability,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_split_half_definition(spark, sf_dir):
    row = q_split_half_reliability(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    o["v"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o["rn"] = o.groupby("o_custkey").cumcount() + 1
    halves = o.groupby("o_custkey").apply(
        lambda g: pd.Series(
            {
                "a": g.v[g.rn % 2 == 1].sum(),
                "b": g.v[g.rn % 2 == 0].sum(),
                "m": len(g),
            }
        ),
        include_groups=False,
    )
    halves = halves[halves.m >= 2]
    r = np.corrcoef(
        halves.a.to_numpy().astype("float64"),
        halves.b.to_numpy().astype("float64"),
    )[0, 1]
    assert row["n_customers"] == len(halves)
    assert abs(row["half_correlation"] - r) < 1e-5
    assert abs(row["spearman_brown_rho"] - 2 * r / (1 + r)) < 1e-5
    # Spearman-Brown steps reliability UP for positive r
    if r > 0:
        assert row["spearman_brown_rho"] > row["half_correlation"]


def test_cronbach_definition(spark, sf_dir):
    row = q_cronbach_alpha_quarters(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).toPandas()
    o["dt"] = pd.to_datetime(o.o_orderdate)
    custs = sorted(o.o_custkey.unique())
    w = o[o.dt.dt.year == 1997].copy()
    w["q"] = w.dt.dt.quarter
    w["cents"] = np.floor(w.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    cell = w.groupby(["o_custkey", "q"]).cents.sum() // 100
    mat = np.zeros((len(custs), 4))
    idx = {ck: i for i, ck in enumerate(custs)}
    for (ck, q), s in cell.items():
        mat[idx[ck], q - 1] = s
    item_vars = mat.var(axis=0, ddof=0)
    total_var = mat.sum(axis=1).var(ddof=0)
    alpha = 4 / 3 * (1 - item_vars.sum() / total_var)
    assert row["n_customers"] == len(custs)
    assert abs(row["sum_item_variances"] - item_vars.sum()) < 1.0
    assert abs(row["total_variance"] - total_var) < 1.0
    assert abs(row["cronbach_alpha"] - alpha) < 1e-4


def test_contrasts_definition(spark, sf_dir):
    row = q_orthogonal_poly_contrasts(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_extendedprice"
    ).toPandas()
    lev = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype("int64")
    net = (
        np.floor(
            li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100
            + 0.5
        ).astype("int64")
        // 100
    )
    means, ns, css = {}, {}, {}
    for l in range(11):
        x = net[lev == l].astype("float64")
        means[l], ns[l] = x.mean(), len(x)
        css[l] = ((x - x.mean()) ** 2).sum()
    lc = sum(_LIN[l] * means[l] for l in range(11))
    qc = sum(_QUAD[l] * means[l] for l in range(11))
    ntot = sum(ns.values())
    mse = sum(css.values()) / (ntot - 11)
    wl = sum(_LIN[l] ** 2 / ns[l] for l in range(11))
    wq = sum(_QUAD[l] ** 2 / ns[l] for l in range(11))
    assert row["n_lines"] == ntot
    assert abs(row["linear_contrast"] - lc) < 0.5
    assert abs(row["quadratic_contrast"] - qc) < 0.5
    assert abs(row["linear_t"] - lc / np.sqrt(mse * wl)) < 1e-2
    assert abs(row["quadratic_t"] - qc / np.sqrt(mse * wq)) < 1e-2
    # orthogonality of the two contrast vectors
    assert sum(a * b for a, b in zip(_LIN, _QUAD)) == 0
    assert sum(_LIN) == 0 and sum(_QUAD) == 0
