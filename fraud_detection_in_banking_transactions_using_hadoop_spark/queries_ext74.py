"""Extension batch 74: quantile treatment effects on the grouped
two-level rank plan.

Scale note: QTE asks WHERE in the outcome distribution a treatment
bites -- the mean-effect tests (welch_t, mann_whitney) can't see a
tails-only effect. Per-arm quantiles are exact 'first value whose
cumulative count reaches the rank' order statistics computed on
operators/rank.with_global_rank with partition_cols=["arm"]: the
per-arm spine is ~O(rows) (the measured o_totalprice cent spine), and
a plain 2-partition window would funnel half the table through one
task -- the grouped two-level plan fans each arm over its bucket
ranges instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_QTE_PCTS = (10, 25, 50, 75, 90)


@register(
    "quantile_treatment_effects",
    f"""
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    spine AS (
      SELECT arm, v, CAST(count(*) AS BIGINT) AS c
      FROM arms GROUP BY arm, v),
    cum AS (
      SELECT arm, v,
             sum(c) OVER (PARTITION BY arm ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER (PARTITION BY arm) AS n
      FROM spine),
    pcts AS (SELECT unnest(ARRAY{list(_QTE_PCTS)}) AS pct),
    qs AS (
      SELECT p.pct, c.arm, min(c.v) AS q
      FROM cum c JOIN pcts p ON 100 * c.cc >= p.pct * c.n
      GROUP BY p.pct, c.arm)
    SELECT CAST(a.pct AS INTEGER) AS quantile_pct,
           CAST(a.q AS BIGINT) AS urgent_cents,
           CAST(b.q AS BIGINT) AS low_cents,
           CAST(a.q - b.q AS BIGINT) AS qte_cents
    FROM qs a JOIN qs b ON a.pct = b.pct AND a.arm = 1 AND b.arm = 0
    """,
    tags=("causal", "quantile", "exact-arith"),
)
def q_quantile_treatment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QTE of URGENT priority on order totals at the 10/25/50/75/90th
    percentiles: per-arm exact order statistics from the GROUPED
    two-level rank plan (cumulative counts per arm restart via
    partition_cols), quantile = first value whose cumulative count
    reaches the rank (ties share), effect = urgent minus low per
    percentile. The 5-row percentile grid broadcasts; the closing join
    is constant-size."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = arms.groupBy("arm", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    totals = spine.groupBy("arm").agg(F.sum("c").cast("bigint").alias("n"))
    cum = (
        with_global_rank(
            spine, "v", [F.col("v")], prefix_sum={"cc": "c"}, partition_cols=["arm"]
        )
        .drop("global_rank")
        .join(F.broadcast(totals), "arm")
    )
    pcts = spark.range(0).sparkSession.createDataFrame(
        [(p,) for p in _QTE_PCTS], "pct int"
    )
    qs = (
        cum.join(F.broadcast(pcts), 100 * F.col("cc") >= F.col("pct") * F.col("n"))
        .groupBy("pct", "arm")
        .agg(F.min("v").alias("q"))
    )
    a = qs.where(F.col("arm") == 1).select("pct", F.col("q").alias("urgent_cents"))
    b = qs.where(F.col("arm") == 0).select("pct", F.col("q").alias("low_cents"))
    return a.join(b, "pct").select(
        F.col("pct").cast("int").alias("quantile_pct"),
        F.col("urgent_cents").cast("bigint").alias("urgent_cents"),
        F.col("low_cents").cast("bigint").alias("low_cents"),
        (F.col("urgent_cents") - F.col("low_cents")).cast("bigint").alias("qte_cents"),
    )
