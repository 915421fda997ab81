"""Unit tests for the scalar expression library (SURVEY.md 2.8)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import (
    EARTH_RADIUS_KM,
    distance_km,
    parse_ts_multi,
    speed_kms,
)


def _law_of_cosines(lat1, lon1, lat2, lon2):
    """Independent reimplementation of FraudDistMetric.java:69-78."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    x = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(
        math.radians(lon1) - math.radians(lon2)
    )
    return math.acos(max(-1.0, min(1.0, x))) * EARTH_RADIUS_KM


def test_distance_known_pairs(spark):
    # (NYC, LA), (London, Paris) against the independent oracle.
    pairs = [
        (40.7128, -74.0060, 34.0522, -118.2437),
        (51.5074, -0.1278, 48.8566, 2.3522),
    ]
    df = spark.createDataFrame(pairs, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        distance_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for row, p in zip(got, pairs):
        assert abs(row.d - _law_of_cosines(*p)) < 1e-9
    # sanity: NYC-LA is ~3936 km by great circle
    assert abs(got[0].d - 3936) < 10


def test_distance_identical_points_is_exact_zero(spark):
    df = spark.createDataFrame([(12.34, 56.78)], "lat double, lon double")
    got = df.select(
        distance_km(F.col("lat"), F.col("lon"), F.col("lat"), F.col("lon")).alias("d")
    ).collect()[0]
    assert got.d == 0.0


def test_distance_null_propagates(spark):
    df = spark.createDataFrame([(1.0, 2.0, None, 4.0)], "a double, b double, c double, d double")
    got = df.select(distance_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")).collect()[0]
    assert got.d is None


def test_speed_guards_nonpositive_dt(spark):
    df = spark.createDataFrame(
        [(100.0, 10.0), (100.0, 0.0), (100.0, -5.0)], "dist double, dt double"
    )
    got = df.select(speed_kms(F.col("dist"), F.col("dt")).alias("s")).collect()
    assert got[0].s == 10.0
    assert got[1].s is None  # no division-by-zero, rule layer decides
    assert got[2].s is None


def test_row_uuid_shape(spark):
    # F3: uuid() with dashes stripped (FDProcBatch.txt:125) -- 32 hex chars,
    # unique per row, nondeterministic (excluded from oracle queries).
    from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import row_uuid

    got = spark.range(100).select(row_uuid().alias("u")).collect()
    assert all(len(r.u) == 32 and "-" not in r.u for r in got)
    assert len({r.u for r in got}) == 100


def test_parse_ts_multi_accepts_both_reference_formats(spark):
    # SURVEY.md 1.4(1): batch yyyy-MM-dd vs streaming dd-MM-yyyy.
    df = spark.createDataFrame(
        [("2024-03-01 10:00:00",), ("01-03-2024 10:00:00",), ("garbage",)], "ts string"
    )
    got = df.select(
        parse_ts_multi(F.col("ts"), ("yyyy-MM-dd HH:mm:ss", "dd-MM-yyyy HH:mm:ss")).alias("t")
    ).collect()
    assert got[0].t == got[1].t
    assert got[0].t is not None
    assert got[2].t is None
