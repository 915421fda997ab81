"""Definition-level checks for the ext12 batch. FIFO gets the literal
sequential queue replay (the whole point of the interval-algebra
rewrite); CUSUM gets the literal recurrence; item-CF and DiD get
pandas recomputes; QQ gets distribution sanity.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext12 import (
    q_cusum_drift_detection,
    q_diff_in_diff_promo,
    q_fifo_lot_matching,
    q_item_cf_similarity,
    q_qq_quantiles,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_item_cf_matches_counter_recompute(spark, sf_dir):
    got = q_item_cf_similarity(spark, sf_dir).toPandas()
    op = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .toPandas()
    )
    item = op.groupby("p").size()
    pair: Counter = Counter()
    for _, grp in op.groupby("o"):
        ps = sorted(grp["p"])
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    scored = [
        # the query orders by the ROUNDED cosine column, so mirror that
        (round(c / math.sqrt(item[a] * item[b]), 6), a, b, c)
        for (a, b), c in pair.items()
        if c >= 3
    ]
    top = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[: len(got)]
    for r, (cos, a, b, c) in zip(got.itertuples(), top):
        assert (r.part_a, r.part_b, r.c_ab) == (a, b, c)
        assert math.isclose(r.cosine, cos, abs_tol=1e-6)


def test_cusum_matches_literal_recurrence(spark, sf_dir):
    got = q_cusum_drift_detection(spark, sf_dir).toPandas().set_index("day")
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("x"))
        .orderBy("d")
        .toPandas()
    )
    mu = int(daily["x"].iloc[:90].sum()) // 90
    s, flagged = 0, {}
    for r in daily.itertuples():
        s = max(0, s + (int(r.x) - mu))  # the literal CUSUM recurrence
        if s > 50 * mu:
            flagged[pd.Timestamp(r.d).strftime("%Y-%m-%d")] = s
    assert dict(zip(got.index, got["cusum_cents"])) == flagged


def test_fifo_matches_sequential_queue(spark, sf_dir):
    got = q_fifo_lot_matching(spark, sf_dir).toPandas()
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("part"),
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("qty"),
            F.col("l_shipdate").alias("sd"),
            (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("key"),
        )
        .toPandas()
    )
    order = lambda df: df.sort_values(["sd", "qty", "key"]).reset_index(drop=True)
    expected = []
    for part, grp in li.groupby("part"):
        supply = order(grp[grp.l_returnflag == "N"])
        demand = order(grp[grp.l_returnflag == "R"])
        # the literal FIFO queue algorithm the interval join replaces
        si, di = 0, 0
        s_left = list(supply["qty"])
        d_left = list(demand["qty"])
        while si < len(s_left) and di < len(d_left):
            m = min(s_left[si], d_left[di])
            expected.append((part, si + 1, di + 1, m))
            s_left[si] -= m
            d_left[di] -= m
            if s_left[si] == 0:
                si += 1
            if d_left[di] == 0:
                di += 1
    got_set = sorted(map(tuple, got[["part", "supply_lot", "demand_seq", "matched_qty"]].values))
    assert got_set == sorted(expected)
    # conservation: matched total per part == min(supply, demand)
    tot = got.groupby("part")["matched_qty"].sum()
    flows = li.pivot_table(index="part", columns="l_returnflag", values="qty", aggfunc="sum").fillna(0)
    for part, m in tot.items():
        assert m == min(flows.loc[part, "N"], flows.loc[part, "R"])


def test_qq_ratios_are_near_one_for_same_family(spark, sf_dir):
    got = q_qq_quantiles(spark, sf_dir).toPandas().sort_values("decile")
    assert list(got["decile"]) == list(range(1, 10))
    # both sides draw from the same synthetic price process: monotone
    # quantiles, ratios within a loose band around 1
    assert got["q_fulfilled"].is_monotonic_increasing
    assert got["q_open"].is_monotonic_increasing
    assert ((got["qq_ratio"] > 0.5) & (got["qq_ratio"] < 2.0)).all()


def test_did_matches_pandas_cells(spark, sf_dir):
    got = q_diff_in_diff_promo(spark, sf_dir).toPandas().iloc[0]
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_shipdate", "l_extendedprice")
        .toPandas()
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type").toPandas()
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j["treat"] = (j["p_type"] == "PROMO").astype(int)
    j["post"] = (pd.to_datetime(j["l_shipdate"]) >= pd.Timestamp("1996-01-01")).astype(int)
    j["cents"] = (j["l_extendedprice"] * 100).round().astype("int64")
    cells = j.groupby(["treat", "post"]).agg(n=("cents", "size"), s=("cents", "sum"))
    mean = lambda t, p: round(round(cells.loc[(t, p), "s"] / 100.0, 4) / cells.loc[(t, p), "n"], 6)
    assert float(got["t_post"]) == mean(1, 1) and float(got["t_pre"]) == mean(1, 0)
    assert float(got["c_post"]) == mean(0, 1) and float(got["c_pre"]) == mean(0, 0)
    did = round((mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0)), 6)
    assert math.isclose(float(got["did_estimate"]), did, abs_tol=1e-9)
    for cell, name in [((1, 1), "n_t_post"), ((1, 0), "n_t_pre"), ((0, 1), "n_c_post"), ((0, 0), "n_c_pre")]:
        assert int(got[name]) == cells.loc[cell, "n"]
