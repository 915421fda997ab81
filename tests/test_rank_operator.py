"""operators/rank: the distributed two-level global rank must be
byte-identical to a literal single-partition row_number/ntile for any
total order (including heavy ties and desc orders), and its plan must
contain no unpartitioned ordered window over the input rows."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "v double, k bigint")


@pytest.fixture(scope="module")
def tied_df(spark):
    # 400 rows, only 17 distinct values -> every bucket boundary is a tie
    rows = [(float(i % 17), i) for i in range(400)]
    return _df(spark, rows).persist()


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_rank_matches_global_row_number(spark, tied_df, ascending, n_buckets):
    order = [F.col("v").asc() if ascending else F.col("v").desc(), F.col("k").asc()]
    got = {
        r["k"]: r["r"]
        for r in with_global_rank(
            tied_df, "v", order, ascending=ascending, n_buckets=n_buckets, rank_col="r"
        ).collect()
    }
    want = {
        r["k"]: r["r"]
        for r in tied_df.select(
            "k", F.row_number().over(Window.orderBy(*order)).cast("bigint").alias("r")
        ).collect()
    }
    assert got == want


def test_rank_plan_has_no_unpartitioned_window_over_input(spark, tied_df):
    from tests.test_plan_quality_registry import _unpartitioned_windows

    plan = (
        with_global_rank(tied_df, "v", [F.col("v").asc(), F.col("k").asc()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only allowed ordered-unpartitioned window is over the B-row
    # bucket-count table, recognizable by its _b ordering column
    for w in _unpartitioned_windows(plan):
        assert "_b#" in w, f"unpartitioned window over non-bucket input: {w}"


@pytest.mark.parametrize("n,k", [(1, 10), (7, 10), (10, 10), (403, 10), (4000, 7)])
def test_ntile_closed_form_matches_sql_ntile(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").cast("bigint").alias("rank"))
    got = df.select(
        "rank", ntile_from_rank(F.col("rank"), F.lit(n).cast("bigint"), k).alias("t")
    )
    want = spark.range(1, n + 1).select(
        F.col("id").alias("rank"),
        F.ntile(k).over(Window.orderBy("id")).alias("t"),
    )
    assert {(r["rank"], r["t"]) for r in got.collect()} == {
        (r["rank"], r["t"]) for r in want.collect()
    }


def test_rank_null_values_dropped(spark):
    df = spark.createDataFrame([(1.0, 1), (None, 2), (2.0, 3)], "v double, k bigint")
    out = with_global_rank(df, "v", [F.col("v").asc(), F.col("k").asc()], rank_col="r")
    assert {(r["k"], r["r"]) for r in out.collect()} == {(1, 1), (3, 2)}


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_prefix_sum_matches_literal_running_sum(spark, tied_df, n_buckets):
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r["k"]: r["cs"]
        for r in with_global_rank(
            tied_df, "v", order, n_buckets=n_buckets, prefix_sum={"cs": "k"}
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cs"] for r in tied_df.select("k", F.sum("k").over(w).alias("cs")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_prefix_max_excl_matches_literal_exclusive_max(spark, tied_df, n_buckets):
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        r["k"]: r["pm"]
        for r in with_global_rank(
            tied_df, "v", order, n_buckets=n_buckets, prefix_max_excl={"pm": "k"}
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["pm"] for r in tied_df.select("k", F.max("k").over(w).alias("pm")).collect()
    }
    # the global first row has an empty prefix -> NULL in both paths
    assert got == want


@pytest.mark.parametrize("n_buckets", [1, 4, 16])
def test_grouped_rank_matches_partitioned_row_number(spark, n_buckets):
    rows = [(i % 3, float((i * 7) % 11), i) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v double, k bigint").persist()
    order = [F.col("v").asc(), F.col("k").asc()]
    got = {
        (r["g"], r["k"]): (r["r"], r["cs"])
        for r in with_global_rank(
            df, "v", order, n_buckets=n_buckets, rank_col="r",
            prefix_sum={"cs": "k"}, partition_cols=["g"],
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r["g"], r["k"]): (r["r"], r["cs"])
        for r in df.select(
            "g",
            "k",
            F.row_number().over(w).cast("bigint").alias("r"),
            F.sum("k").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        ).collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def int_df(spark):
    # non-negative integer domain with heavy ties straddling the
    # DIV-2^bits bucket edges (values cluster around multiples of 8)
    rows = [((i * i * 31) % 997 // 4 * 4, i) for i in range(500)]
    return spark.createDataFrame(rows, "v bigint, k bigint").persist()


@pytest.mark.parametrize("bits", [2, 5, 16])
@pytest.mark.parametrize("ascending", [True, False])
def test_bucket_bits_rank_matches_global_row_number(spark, int_df, bits, ascending):
    order = [F.col("v").asc() if ascending else F.col("v").desc(), F.col("k").asc()]
    got = {
        r["k"]: (r["r"], r["cs"])
        for r in with_global_rank(
            int_df, "v", order, ascending=ascending, rank_col="r",
            prefix_sum={"cs": "k"}, bucket_bits=bits,
        ).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["k"]: (r["r"], r["cs"])
        for r in int_df.select(
            "k",
            F.row_number().over(w).cast("bigint").alias("r"),
            F.sum("k").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        ).collect()
    }
    assert got == want


def test_bucket_bits_plan_has_no_stats_pass_and_no_nested_loop(spark, int_df):
    from tests.test_plan_quality_registry import _unpartitioned_windows

    plan = (
        with_global_rank(
            int_df, "v", [F.col("v").asc(), F.col("k").asc()], bucket_bits=4
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cheap path must not pay the percentile stats job or the
    # broadcast range join of the generic path
    assert "approx_percentile" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for w in _unpartitioned_windows(plan):
        assert "_b#" in w, f"unpartitioned window over non-bucket input: {w}"


def test_grouped_rank_plan_has_no_unpartitioned_window(spark):
    from tests.test_plan_quality_registry import _unpartitioned_windows

    df = spark.createDataFrame(
        [(i % 3, float(i % 17), i) for i in range(100)], "g int, v double, k bigint"
    )
    plan = (
        with_global_rank(
            df, "v", [F.col("v").asc(), F.col("k").asc()], partition_cols=["g"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the grouped variant keeps EVERY window partitioned (by group or
    # by group+bucket) -- no unpartitioned ordered window at all
    assert _unpartitioned_windows(plan) == []
