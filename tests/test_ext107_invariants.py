"""Definition-level checks for ext107: literal modularity over the
edge set, per-part CV scan, and matched-price correlation."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext107 import (
    q_copurchase_modularity,
    q_law_of_one_price,
    q_price_persistence_yoy,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_modularity_definition(spark, sf_dir):
    row = q_copurchase_modularity(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).toPandas().drop_duplicates()
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    ).toPandas().set_index("p_partkey").p_brand
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for jj in range(i + 1, len(ps)):
                edges.add((ps[i], ps[jj]))
    m = len(edges)
    assert row["n_edges"] == m
    within = Counter()
    deg = Counter()
    for x, y in edges:
        bx, by = part[x], part[y]
        deg[bx] += 1
        deg[by] += 1
        if bx == by:
            within[bx] += 1
    q = sum(
        within.get(b, 0) / m - (deg[b] / (2 * m)) ** 2 for b in deg
    )
    assert row["n_brands"] == len(deg)
    assert abs(row["modularity_q"] - q) < 1e-4
    assert -1.0 <= row["modularity_q"] <= 1.0


def test_law_of_one_price_definition(spark, sf_dir):
    row = q_law_of_one_price(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).toPandas()
    li["u"] = (
        np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
        // li.l_quantity.astype("int64")
    )
    cvs = []
    for pk, grp in li.groupby("l_partkey"):
        if len(grp) < 3:
            continue
        u = grp.u.to_numpy().astype("float64")
        cvs.append(math.floor(1e4 * u.std(ddof=0) / u.mean() + 0.5))
    cvs = np.sort(np.array(cvs))
    assert row["n_parts"] == len(cvs)
    cc = np.arange(1, len(cvs) + 1)
    med = int(cvs[np.argmax(2 * cc >= len(cvs))])
    assert abs(row["median_cv"] - med / 1e4) < 1e-6
    share = (cvs > 500).mean()
    assert abs(row["share_cv_over_5pct"] - share) < 1e-6


def test_price_persistence_definition(spark, sf_dir):
    row = q_price_persistence_yoy(spark, sf_dir).collect()[0]
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
    py["u"] = py.rev // py.qty
    a = py.xs(1996, level="yr").u
    b = py.xs(1997, level="yr").u
    common = a.index.intersection(b.index)
    u0 = a.loc[common].to_numpy().astype("float64")
    u1 = b.loc[common].to_numpy().astype("float64")
    assert row["n_matched_parts"] == len(common)
    r = np.corrcoef(u0, u1)[0, 1]
    assert abs(row["price_persistence_r"] - r) < 1e-5
    assert abs(row["mean_price_ratio"] - u1.mean() / u0.mean()) < 1e-5
