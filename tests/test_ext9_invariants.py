"""Definition-level checks for the ext9 batch: the point-in-time join
rewrite gets a literal per-customer replay, the Bloom join's sketch
contract (no false negatives, some false positives) is asserted, and
PMI/pareto/new-returning get independent pandas recomputes.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext9 import (
    q_bloom_filter_semijoin,
    q_new_vs_returning,
    q_pareto_80_20,
    q_pmi_collocations,
    q_point_in_time_join,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_pit_join_is_leakage_free(spark, sf_dir):
    got = q_point_in_time_join(spark, sf_dir).toPandas()
    orders = (
        read_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("cust"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .toPandas()
    )
    # literal replay: walk each customer's days in order; the segment
    # visible to day T is derived from spend strictly before T
    def tier(c):
        return "bronze" if c < 20_000_000 else ("silver" if c < 60_000_000 else "gold")

    expected = {}
    for cust, grp in orders.groupby("cust"):
        cum = 0
        seen_any = False
        for day, dgrp in grp.sort_values("d").groupby("d"):
            seg_before = tier(cum) if seen_any else "new"
            for ok in dgrp["o_orderkey"]:
                expected[ok] = seg_before
            cum += dgrp["cents"].sum()
            seen_any = True
    assert dict(zip(got["order_key"], got["segment_asof"])) == expected
    # every first-ever order must be 'new' (nothing strictly before it)
    firsts = orders.sort_values("d").groupby("cust").first()["o_orderkey"]
    tagged = got.set_index("order_key")["segment_asof"]
    assert (tagged.loc[firsts] == "new").all()


def test_pareto_head_crosses_eighty_percent(spark, sf_dir):
    got = q_pareto_80_20(spark, sf_dir).toPandas().sort_values("rk")
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"))
        .toPandas()
    )
    total = rev["cents"].sum()
    # ranks contiguous from 1; shares monotone; the last row crosses 80%
    assert list(got["rk"]) == list(range(1, len(got) + 1))
    assert got["cum_share"].is_monotonic_increasing
    assert got["cum_share"].iloc[-1] >= 0.8
    # the head WITHOUT its last element stays under 80%
    assert (got["cum_share"].iloc[-2] if len(got) > 1 else 0) < 0.8
    # and it is the smallest such head: recompute from scratch
    srt = rev.sort_values(["cents", "l_partkey"], ascending=[False, True])
    k = (srt["cents"].cumsum() - srt["cents"] < 0.8 * total).sum()
    assert len(got) == k


def test_bloom_matches_python_sketch_recompute(spark, sf_dir):
    got = q_bloom_filter_semijoin(spark, sf_dir).toPandas().iloc[0]
    vip = set(
        r["c_custkey"]
        for r in read_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .collect()
    )
    ordering_custs = set(
        r["o_custkey"] for r in read_table(spark, sf_dir, "orders").select("o_custkey").distinct().collect()
    )

    # rebuild the partitioned Bloom filter bit-for-bit in python
    import hashlib

    def pos(k, i):
        return int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[:8], 16) % 512

    bits = {(i, pos(k, i)) for k in vip for i in range(3)}
    passed = {
        k for k in ordering_custs if all((i, pos(k, i)) in bits for i in range(3))
    }
    # Bloom guarantee: no false negatives; counts match the sketch exactly
    assert vip & ordering_custs <= passed
    assert int(got["n_pass"]) == len(passed)
    assert int(got["n_true_members"]) == len(vip & ordering_custs)
    assert int(got["n_false_positives"]) == len(passed - vip)
    assert int(got["n_pass"]) == int(got["n_true_members"]) + int(got["n_false_positives"])


def test_pmi_matches_pandas_recompute(spark, sf_dir):
    got = q_pmi_collocations(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("text").toPandas()
    from collections import Counter

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in docs["text"]:
        ts = t.split(" ")
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    n_uni = sum(uni.values())
    n_big = sum(big.values())
    expected = {
        (a, b): math.log((c / n_big) / ((uni[a] / n_uni) * (uni[b] / n_uni)))
        for (a, b), c in big.items()
        if c >= 5
    }
    assert set(zip(got["a"], got["b"])) == set(expected)
    for r in got.itertuples():
        assert math.isclose(r.pmi, expected[(r.a, r.b)], abs_tol=1e-6)


def test_new_returning_partitions_dau(spark, sf_dir):
    got = q_new_vs_returning(spark, sf_dir).toPandas().sort_values("day")
    assert (got["dau"] == got["n_new"] + got["n_returning"]).all()
    # first day: everyone is new; cumulative curve ends at |users|
    assert got["n_returning"].iloc[0] == 0
    n_users = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert got["cum_users"].iloc[-1] == n_users
    assert got["cum_users"].is_monotonic_increasing
