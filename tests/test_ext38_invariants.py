"""Definition-level checks for the ext38 batch."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext38 import (
    q_abc_xyz_classes,
    q_chatterjee_xi,
    q_price_elasticity,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(p: pd.Series) -> pd.Series:
    return np.round(p * 100).astype("int64")


def test_chatterjee_matches_literal_rank_walk(spark, sf_dir):
    got = q_chatterjee_xi(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    g = o.groupby("o_orderdate").agg(x=("c", "size"), y=("c", "sum")).sort_index()
    g = g.reset_index()
    # y-ranks under the unique (y, date) order
    g["r"] = g.sort_values(["y", "o_orderdate"]).reset_index().sort_values("index").index + 1
    g = g.sort_values(["y", "o_orderdate"]).reset_index(drop=True)
    g["r"] = g.index + 1
    g = g.sort_values(["x", "o_orderdate"]).reset_index(drop=True)
    r = g.r.values
    s = int(np.abs(np.diff(r)).sum())
    n = len(g)
    xi = 1 - 3.0 * s / (float(n) * n - 1)
    assert int(got.n) == n
    assert int(got.sum_abs_rank_diff) == s
    assert math.isclose(float(got.xi), xi, abs_tol=1e-5)
    assert -0.5 <= float(got.xi) <= 1.0


def test_price_elasticity_matches_literal_band_fit(spark, sf_dir):
    got = q_price_elasticity(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity").toPandas()
    li = li[li.l_quantity > 0].copy()
    li["unit"] = np.round(100 * li.l_extendedprice / li.l_quantity).astype("int64")
    li["band"] = np.minimum(li.unit // 50000, 20)
    li["q"] = li.l_quantity.astype("int64")
    per = li.groupby("band").agg(n=("unit", "size"), sp=("unit", "sum"), sq=("q", "sum"))
    per = per[per.sq > 0]
    xs = [round(1e8 * math.log(int(r.sp) / int(r.n))) for r in per.itertuples()]
    ys = [round(1e8 * math.log(int(r.sq))) for r in per.itertuples()]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert int(got.n_bands) == k
    assert math.isclose(float(got.elasticity), slope, abs_tol=1e-5)


def test_abc_xyz_matches_literal_classification(spark, sf_dir):
    got = q_abc_xyz_classes(spark, sf_dir).toPandas().set_index("part")
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    df["q"] = df.l_quantity.astype("int64")
    df["wk"] = df.o_orderdate.dt.to_period("W-SUN").dt.start_time  # Monday-start weeks
    weekly = df.groupby(["l_partkey", "wk"]).q.sum()
    per = weekly.groupby(level=0).agg(["sum", "size", lambda s: int((s * s).sum())])
    per.columns = ["total", "nw", "s2"]
    order = per.sort_values(["total"], ascending=False)
    order = order.sort_values(["total"], ascending=False, kind="stable")
    order = order.loc[
        sorted(order.index, key=lambda p: (-int(order.loc[p].total), p))
    ]
    grand = int(per.total.sum())
    cum = 0
    for part, r in order.iterrows():
        cum += int(r.total)
        share = (1000000 * cum) // grand
        row = got.loc[part]
        assert int(row.total_qty) == int(r.total)
        assert int(row.cum_share_ppm) == share
        want_abc = "A" if share <= 800000 else ("B" if share <= 950000 else "C")
        assert row.abc == want_abc
        mean = int(r.total) / int(r.nw)
        var = int(r.s2) / int(r.nw) - mean * mean
        cv = round(1e6 * math.sqrt(max(var, 0)) / mean)
        assert abs(int(row.cv_ppm) - cv) <= 1
        want_xyz = "X" if int(row.cv_ppm) < 500000 else ("Y" if int(row.cv_ppm) < 1000000 else "Z")
        assert row.xyz == want_xyz
    # A parts must together hold <= 80% + one part of demand, and every
    # A part outranks every C part
    a_total = got[got.abc == "A"].total_qty.sum()
    assert a_total <= 0.8 * grand + got.total_qty.max()
