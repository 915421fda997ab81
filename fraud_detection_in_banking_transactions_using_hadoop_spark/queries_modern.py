"""Modern SQL surface (Spark 4 features): recursive CTEs and the
VARIANT semi-structured type -- the two capabilities warehouse users
most often assume an engine lacks.

Both run as genuine spark.sql text (the feature under test is the SQL
frontend), registered through temp views built by read_table so
encoding normalization holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Recursive CTE: calendar densification (zero-filled weekly series).
# ---------------------------------------------------------------------------
@register(
    "recursive_calendar",
    """
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('week', max(o_orderdate)) - INTERVAL 182 DAY AS lo,
             date_trunc('week', max(o_orderdate)) AS hi
      FROM orders),
    weeks(wk) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT wk + INTERVAL 7 DAY FROM weeks, bounds WHERE wk < hi),
    counts AS (
      SELECT date_trunc('week', o_orderdate) AS wk,
             count(*) AS n, sum(o_totalprice) AS rev
      FROM orders GROUP BY date_trunc('week', o_orderdate))
    SELECT strftime(wk, '%Y-%m-%d') AS week,
           CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
           round(coalesce(rev, 0), 2) AS revenue
    FROM weeks LEFT JOIN counts USING (wk)
    """,
    tags=("modern", "recursive", "A1"),
)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled weekly order series via WITH RECURSIVE (Spark 4):
    the densification pattern that makes gap detection and moving
    averages correct over sparse weeks. The spine covers the trailing
    26 weeks: Spark's UnionLoopExec schedules one loop step PER LEVEL
    (~0.3 s each on local[32]), so recursion depth -- not data size --
    is the cost driver; for multi-year spines use sequence()+explode
    and keep recursion for genuinely iterative semantics. The fact
    aggregates once on the truncated week regardless."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_rc")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('week', max(o_orderdate)) - INTERVAL 182 DAY AS lo,
                 date_trunc('week', max(o_orderdate)) AS hi
          FROM v_orders_rc),
        weeks(wk) MAX RECURSION LEVEL 100 AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT wk + INTERVAL 7 DAY FROM weeks, bounds WHERE wk < hi),
        counts AS (
          SELECT date_trunc('week', o_orderdate) AS wk,
                 count(*) AS n, sum(o_totalprice) AS rev
          FROM v_orders_rc GROUP BY date_trunc('week', o_orderdate))
        SELECT date_format(wk, 'yyyy-MM-dd') AS week,
               CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
               round(coalesce(rev, 0), 2) AS revenue
        FROM weeks LEFT JOIN counts USING (wk)
        """
    )


# ---------------------------------------------------------------------------
# VARIANT: semi-structured JSON without a declared schema.
# ---------------------------------------------------------------------------
@register(
    "variant_props",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(json_extract(props, '$.k')::INTEGER) AS INTEGER) AS min_k,
           CAST(max(json_extract(props, '$.k')::INTEGER) AS INTEGER) AS max_k,
           CAST(sum(json_extract(props, '$.k')::INTEGER) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    tags=("modern", "variant", "json"),
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props parsed once into VARIANT (Spark 4's binary
    semi-structured type -- parse once, extract many, ~an order of
    magnitude cheaper than repeated get_json_object string parses at
    100 TB), then typed variant_get extraction feeding ordinary
    aggregates."""
    events = read_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )
