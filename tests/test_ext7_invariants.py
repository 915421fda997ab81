"""Independent re-derivations for the ext7 batch: the SCD2, interval
overlap, and pattern queries' oracles necessarily share the Spark
formulation (or, for intervals, check a rewrite the oracle can't see
inside), so these tests recompute the answers from the DEFINITIONS in
plain python/pandas.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext7 import (
    q_interval_overlap_pairs,
    q_pattern_match_sequences,
    q_quantile_binning,
    q_scd2_segment_history,
    q_seasonal_decompose,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_scd2_versions_are_contiguous_and_disjoint(spark, sf_dir):
    got = q_scd2_segment_history(spark, sf_dir).toPandas()
    for cust, grp in got.groupby("cust"):
        g = grp.sort_values("version")
        # versions 1..k with no gaps
        assert list(g["version"]) == list(range(1, len(g) + 1))
        # consecutive runs must actually change segment (else they'd merge)
        segs = list(g["segment"])
        assert all(a != b for a, b in zip(segs, segs[1:]))
        # [valid_from, valid_to) chains exactly: next row starts where
        # the previous ended; the last row is open-ended
        assert list(g["valid_to"])[:-1] == list(g["valid_from"])[1:]
        assert list(g["valid_to"])[-1] == "9999-12-31"
    # n_days accounts for every active (cust, day) exactly once
    orders = read_table(spark, sf_dir, "orders")
    active = (
        orders.select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
        .groupBy("o_custkey")
        .count()
        .toPandas()
        .set_index("o_custkey")["count"]
    )
    per_cust = got.groupby("cust")["n_days"].sum()
    assert per_cust.to_dict() == active.to_dict()


def test_seasonal_matches_pandas_rolling(spark, sf_dir):
    got = q_seasonal_decompose(spark, sf_dir).toPandas().set_index("dow")
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents"))
        .orderBy("d")
        .toPandas()
    )
    trend = daily["cents"].rolling(7, center=True).mean()
    det = (daily["cents"] - trend).dropna() / 100.0
    dows = pd.to_datetime(daily["d"]).dt.dayofweek + 1  # pandas: Mon=0
    expected = det.groupby(dows.loc[det.index]).mean()
    for dow in range(1, 8):
        assert abs(float(got.loc[dow, "seasonal_dollars"]) - float(expected[dow])) < 1e-4
        assert int(got.loc[dow, "n_days"]) == int((dows.loc[det.index] == dow).sum())


def test_interval_overlap_matches_brute_force(spark, sf_dir):
    got = q_interval_overlap_pairs(spark, sf_dir).toPandas()
    iv = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("supp"),
            F.col("l_partkey").alias("part"),
            (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("key"),
            F.col("l_shipdate").cast("date").alias("s"),
            F.date_add(F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")).alias("e"),
        )
        .toPandas()
    )
    brute = []
    days = {}
    for (_, _), grp in iv.groupby(["supp", "part"]):
        # positional pairs over the query's total order (shipdate,
        # quantity ~ end date, key) -- line keys COLLIDE in this
        # testdata, so a key-based a<b sweep would mishandle twin rows
        rows = sorted(grp.itertuples(), key=lambda r: (r.s, r.e, r.key))
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if a.s <= b.e and b.s <= a.e:
                    brute.append((a.key, b.key))
                    days[(a.key, b.key)] = (min(a.e, b.e) - max(a.s, b.s)).days + 1
    assert sorted(zip(got["key_a"], got["key_b"])) == sorted(brute)
    assert all(days[(r.key_a, r.key_b)] == r.overlap_days for r in got.itertuples())
    # the bucket-ownership rewrite must not duplicate any pair
    assert len(got) == len(brute)


def test_quantile_bins_are_balanced_and_ordered(spark, sf_dir):
    got = q_quantile_binning(spark, sf_dir).toPandas().sort_values("decile")
    n_orders = read_table(spark, sf_dir, "orders").count()
    assert got["n"].sum() == n_orders
    assert got["n"].max() - got["n"].min() <= 1  # ntile balance guarantee
    # bins tile the value range in order
    assert (got["lo"] <= got["hi"]).all()
    assert (got["hi"].values[:-1] <= got["lo"].values[1:] + 1e-9).all()


def test_pattern_counts_match_python_re(spark, sf_dir):
    got = q_pattern_match_sequences(spark, sf_dir).toPandas().set_index("user_id")
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        s = "".join(grp["c"])
        assert int(got.loc[uid, "n_events"]) == len(s)
        assert int(got.loc[uid, "view_to_purchase"]) == len(re.findall("v+p", s))
        assert int(got.loc[uid, "error_runs"]) == len(re.findall("ee+", s))
        assert int(got.loc[uid, "signup_funnels"]) == len(re.findall("svc*p", s))
