"""Randomized Spark<->DuckDB parity fuzzing: a small query grammar
(filter x group-by x aggregate over orders) rendered BOTH as a DataFrame
program and as SQL, compared row-for-row. Seeded -- failures reproduce.

This is the generalization of the hand-written oracle queries: instead of
trusting that the 50+ curated queries cover the semantics space, sample
it. The grammar deliberately stays inside the engine-parity envelope the
curated suite established (rounded multi-step floats, cast integer
widths, total orders).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.oracle_check import canon_rows

N_CASES = 40

FILTERS = [
    # (spark_fn, sql) pairs, semantically identical
    (lambda df: df.filter(F.col("o_totalprice") > 200000), "o_totalprice > 200000"),
    (lambda df: df.filter(F.col("o_totalprice") <= 50000), "o_totalprice <= 50000"),
    (lambda df: df.filter(F.col("o_orderstatus") == "F"), "o_orderstatus = 'F'"),
    (lambda df: df.filter(F.col("o_orderstatus") != "P"), "o_orderstatus <> 'P'"),
    (lambda df: df.filter(F.col("o_custkey") % 7 == 0), "o_custkey % 7 = 0"),
    (
        lambda df: df.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")),
        "o_orderpriority IN ('1-URGENT', '5-LOW')",
    ),
    (
        lambda df: df.filter(F.col("o_orderdate") >= F.lit("1999-01-01")),
        "o_orderdate >= TIMESTAMP '1999-01-01'",
    ),
    (None, None),  # no filter
]

GROUPS = [
    [],
    ["o_orderstatus"],
    ["o_orderpriority"],
    ["o_orderstatus", "o_orderpriority"],
]

# builders are lambdas: Column objects need an active SparkSession, which
# doesn't exist at collection time
AGGS = [
    (lambda: F.count("*").alias("n"), "count(*) AS n"),
    (lambda: F.round(F.sum("o_totalprice"), 2).alias("total"),
     "round(sum(o_totalprice), 2) AS total"),
    (lambda: F.round(F.avg("o_totalprice"), 4).alias("avg_p"),
     "round(avg(o_totalprice), 4) AS avg_p"),
    (lambda: F.min("o_custkey").alias("min_c"), "min(o_custkey) AS min_c"),
    (lambda: F.max("o_orderkey").alias("max_o"), "max(o_orderkey) AS max_o"),
    (lambda: F.countDistinct("o_custkey").alias("nd_cust"),
     "count(DISTINCT o_custkey) AS nd_cust"),
    (lambda: F.round(F.min("o_totalprice") + F.max("o_totalprice"), 2).alias("span"),
     "round(min(o_totalprice) + max(o_totalprice), 2) AS span"),
    # round-3 aggregate surface
    (lambda: F.count_if(F.col("o_totalprice") > 200000).cast("bigint").alias("n_big"),
     "CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big"),
    (lambda: F.bool_and(F.col("o_totalprice") > 0).alias("all_pos"),
     "bool_and(o_totalprice > 0) AS all_pos"),
    (lambda: F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
     "bool_or(o_totalprice > 400000) AS any_huge"),
    (lambda: F.round(F.regr_slope(F.col("o_totalprice"), F.col("o_custkey")), 4).alias("slope"),
     "round(regr_slope(o_totalprice, o_custkey), 4) AS slope"),
    (lambda: F.max_by("o_custkey", "o_orderkey").cast("bigint").alias("last_cust"),
     "CAST(max_by(o_custkey, o_orderkey) AS BIGINT) AS last_cust"),
    (lambda: F.round(F.covar_pop(F.col("o_totalprice"), F.col("o_custkey")), 2).alias("cv"),
     "round(covar_pop(o_totalprice, o_custkey), 2) AS cv"),
    # late-round-3 additions: interpolated median + deterministic arg-min
    (lambda: F.round(F.median("o_totalprice"), 4).alias("med"),
     "round(median(o_totalprice), 4) AS med"),
    (lambda: F.min_by("o_custkey", "o_orderkey").cast("bigint").alias("first_cust"),
     "CAST(min_by(o_custkey, o_orderkey) AS BIGINT) AS first_cust"),
]


def _cases():
    rng = random.Random(20240813)
    out = []
    for i in range(N_CASES):
        f = rng.choice(FILTERS)
        g = rng.choice(GROUPS)
        aggs = rng.sample(AGGS, rng.randint(1, 3))
        out.append(pytest.param(f, g, aggs, id=f"case{i}"))
    return out


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("flt,groups,aggs", _cases())
def test_random_query_parity(flt, groups, aggs, spark, sf_dir, oracle):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

    df = read_table(spark, sf_dir, "orders")
    spark_fn, sql_pred = flt
    if spark_fn is not None:
        df = spark_fn(df)
    spark_aggs = [build() for build, _ in aggs]
    if groups:
        got = df.groupBy(*groups).agg(*spark_aggs)
    else:
        got = df.agg(*spark_aggs)

    sql = "SELECT "
    sql += ", ".join(([*groups] if groups else []) + [s for _, s in aggs])
    sql += " FROM orders"
    if sql_pred:
        sql += f" WHERE {sql_pred}"
    if groups:
        sql += " GROUP BY " + ", ".join(groups)

    s_cols, s_rows = canon_rows(got.toPandas())
    d_cols, d_rows = canon_rows(oracle.execute(sql).df())
    assert s_cols == d_cols
    assert s_rows == d_rows, f"mismatch for SQL: {sql}"
