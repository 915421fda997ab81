"""Incremental aggregate maintenance: batch-folded partials must equal a
full recompute, including across a simulated crash-replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.incremental import (
    finalize,
    incremental_agg_update,
    merge_partials,
    partials_of,
)


def _batches(spark):
    b1 = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    b2 = spark.createDataFrame(
        [(1, 30.0), (2, 5.0), (3, 7.0)], "k long, v double"
    )
    b3 = spark.createDataFrame([(3, 100.0)], "k long, v double")
    return b1, b2, b3


def test_merged_partials_equal_full_recompute(spark):
    b1, b2, b3 = _batches(spark)
    state = partials_of(b1, "k", "v")
    for b in (b2, b3):
        state = merge_partials(state, partials_of(b, "k", "v"), "k")
    got = {r["k"]: r for r in finalize(state).collect()}

    full = b1.unionAll(b2).unionAll(b3)
    exact = {
        r["k"]: r
        for r in full.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"), F.avg("v").alias("a"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.countDistinct("v").alias("nd"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        g = got[k]
        assert g["n"] == e["n"] and g["sum_v"] == e["s"]
        assert abs(g["avg_v"] - e["a"]) < 1e-12
        assert g["min_v"] == e["mn"] and g["max_v"] == e["mx"]
        # HLL exact at these tiny cardinalities
        assert g["approx_distinct_v"] == e["nd"]


def test_incremental_update_persisted_state(spark, tmp_path):
    b1, b2, b3 = _batches(spark)
    path = str(tmp_path / "aggstate")
    for b in (b1, b2, b3):
        incremental_agg_update(spark, path, b, "k", "v")
    got = {r["k"]: r for r in finalize(spark.read.parquet(path)).collect()}
    assert got[1]["n"] == 3 and got[1]["sum_v"] == 60.0
    assert got[2]["n"] == 2 and got[2]["approx_distinct_v"] == 1
    assert got[3]["max_v"] == 100.0
