"""Definition-level checks for ext86: literal midrank Dunn z, a
pandas-ranked Page L, and the direct von Neumann ratio."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext86 import (
    _PAGE_YEARS,
    q_dunn_posthoc_pairs,
    q_page_trend_test,
    q_von_neumann_ratio,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _midranks(v):
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype="float64")
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_dunn_definition(spark, sf_dir):
    rows = q_dunn_posthoc_pairs(spark, sf_dir).collect()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = o.o_orderpriority.to_numpy()
    n = len(v)
    ranks = _midranks(v)
    _, tc = np.unique(v, return_counts=True)
    tie = (tc.astype("float64") ** 3 - tc).sum()
    pooled = n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))
    groups = sorted(set(g))
    assert len(rows) == len(groups) * (len(groups) - 1) // 2
    for r in rows:
        a, b = r["group_a"], r["group_b"]
        assert a < b
        ma, mb = ranks[g == a], ranks[g == b]
        diff = ma.mean() - mb.mean()
        z = diff / np.sqrt(pooled * (1 / len(ma) + 1 / len(mb)))
        assert abs(r["mean_rank_diff"] - diff) < 1e-3
        assert abs(r["dunn_z"] - z) < 1e-4


def test_page_definition(spark, sf_dir):
    row = q_page_trend_test(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    ).toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.isin(_PAGE_YEARS)]
    o["j"] = o.o_orderpriority.str[0].astype(int)
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    cells = o.groupby(["yr", "j"]).cents.agg(["sum", "size"]).reset_index()
    cells["avg"] = cells["sum"] / cells["size"]
    lstat = 0
    for _, grp in cells.groupby("yr"):
        grp = grp.sort_values(["avg", "j"]).reset_index(drop=True)
        for rank, j in enumerate(grp.j, start=1):
            lstat += j * rank
    b, k = len(_PAGE_YEARS), 5
    assert row["page_l"] == lstat
    assert row["n_blocks"] == b and row["k_treatments"] == k
    e = b * k * (k + 1) ** 2 / 4
    var = b * k * k * (k + 1) * (k * k - 1) / 144
    assert row["expected_l"] == e
    assert abs(row["z_score"] - (lstat - e) / np.sqrt(var)) < 1e-3
    # L is bounded by the perfectly ordered arrangement
    assert lstat <= b * sum(j * j for j in range(1, k + 1))


def test_von_neumann_definition(spark, sf_dir):
    row = q_von_neumann_ratio(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    y = (
        pd.DataFrame({"dt": o.o_orderdate, "y": cents})
        .groupby("dt")["y"]
        .sum()
        .sort_index()
        .to_numpy()
        .astype("float64")
    )
    n = len(y)
    eta = (np.diff(y) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert row["n_days"] == n
    assert abs(row["vn_ratio"] - eta) < 1e-5
    z = (eta - 2) * np.sqrt((n * n - 1) / (4 * (n - 2)))
    assert abs(row["z_score"] - z) < 1e-3
    assert 0.0 < row["vn_ratio"] < 4.0
