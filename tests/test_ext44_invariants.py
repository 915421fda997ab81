"""Definition-level checks for the ext44 batch."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext44 import (
    q_grouped_median_ci,
    q_logrank_test,
    q_scorecard_points,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(p: pd.Series) -> pd.Series:
    return np.round(p * 100).astype("int64")


def test_logrank_matches_literal_hypergeometric_sums(spark, sf_dir):
    got = q_logrank_test(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").toPandas()
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    horizon = o.o_orderdate.max()
    subjects = []
    for ck, g in o.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        t1 = g.o_orderdate.iloc[0]
        died = len(g) >= 2
        end = g.o_orderdate.iloc[1] if died else horizon
        subjects.append((int(seg[ck] == "BUILDING"), int(died), (end - t1).days))
    times = sorted({gap for _, d, gap in subjects if d})
    o1 = e1 = v = 0.0
    o1_int = 0
    e1_e9 = v_e9 = 0
    for t in times:
        r1 = sum(1 for g, _, gap in subjects if g == 1 and gap >= t)
        r0 = sum(1 for g, _, gap in subjects if g == 0 and gap >= t)
        d1 = sum(1 for g, d, gap in subjects if g == 1 and d and gap == t)
        d0 = sum(1 for g, d, gap in subjects if g == 0 and d and gap == t)
        dt, rt = d1 + d0, r1 + r0
        if dt == 0:
            continue
        o1_int += d1
        e1_e9 += round(1e9 * dt * r1 / rt)
        if rt > 1:
            v_e9 += round(1e9 * dt * (r1 / rt) * (r0 / rt) * (rt - dt) / (rt - 1))
    assert int(got.observed_1) == o1_int
    assert math.isclose(float(got.expected_1), e1_e9 / 1e9, abs_tol=1e-5)
    z = (o1_int - e1_e9 / 1e9) / math.sqrt(v_e9 / 1e9)
    assert math.isclose(float(got.z_score), z, abs_tol=1e-4)


def test_scorecard_matches_literal_points(spark, sf_dir):
    got = q_scorecard_points(spark, sf_dir).toPandas().set_index("o_custkey")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"
    ).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    ret_orders = set(li[li.l_returnflag == "R"].l_orderkey)
    o["cents"] = _cents(o.o_totalprice)
    o["pts"] = np.where(o.cents < 5000000, 10, np.where(o.cents < 20000000, 20, 35)) + np.where(
        o.o_orderpriority.isin(["1-URGENT", "2-HIGH"]), 25, 0
    )
    o["ret"] = o.o_orderkey.isin(ret_orders).astype(int)
    per = o.groupby("o_custkey").agg(
        sum_pts=("pts", "sum"), n=("pts", "size"), n_ret=("ret", "sum")
    )
    for ck, r in per.iterrows():
        score = 500 + int(r.sum_pts) - 40 * int(r.n_ret)
        row = got.loc[ck]
        assert int(row.score) == score
        assert int(row.n_orders) == int(r.n)
        assert int(row.n_returned) == int(r.n_ret)
        want = "A" if score >= 900 else ("B" if score >= 700 else "C")
        assert row.risk_class == want


def test_grouped_median_ci_matches_per_group_sort(spark, sf_dir):
    got = q_grouped_median_ci(spark, sf_dir).toPandas().set_index("nk")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["v"] = _cents(df.o_totalprice)
    for nk, g in df.groupby("c_nationkey"):
        v = np.sort(g.v.values)
        n = len(v)
        r_med = (n + 1) // 2
        r_lo = max(int(math.floor((n - 1.959964 * math.sqrt(n)) / 2)), 1)
        r_hi = min(int(math.ceil(1 + (n + 1.959964 * math.sqrt(n)) / 2)), n)
        row = got.loc[nk]
        assert int(row.n) == n
        assert int(row.median_cents) == int(v[r_med - 1])
        assert int(row.lo_cents) == int(v[r_lo - 1])
        assert int(row.hi_cents) == int(v[r_hi - 1])
        assert int(row.lo_cents) <= int(row.median_cents) <= int(row.hi_cents)
