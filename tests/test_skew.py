"""Salted-join correctness: identical results to a plain join on a frame
with one pathologically hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.skew import (
    salted_group_count,
    salted_join,
)


def _skewed_frames(spark):
    # 5000 rows of key 1 (hot), 50 rows spread over keys 2..11
    hot = spark.range(5000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(50).select((F.col("id") % 10 + 2).alias("k"), F.col("id").alias("v"))
    skewed = hot.union(cold)
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(1, 12)], "k long, name string")
    return skewed, small


def test_salted_join_matches_plain_join(spark):
    skewed, small = _skewed_frames(spark)
    plain = skewed.join(small, "k").groupBy("k", "name").count()
    salted = salted_join(skewed, small, "k", salt_factor=8).groupBy("k", "name").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_left_outer(spark):
    skewed, small = _skewed_frames(spark)
    missing = small.filter(F.col("k") <= 5)  # keys 6..11 unmatched
    plain = sorted(tuple(r) for r in skewed.join(missing, "k", "left").collect())
    salted = sorted(tuple(r) for r in salted_join(skewed, missing, "k", how="left").collect())
    assert plain == salted


def test_salted_group_count(spark):
    skewed, _ = _skewed_frames(spark)
    exact = {r.k: r["count"] for r in skewed.groupBy("k").count().collect()}
    got = {r.k: r.n for r in salted_group_count(skewed, "k").collect()}
    assert got == exact
