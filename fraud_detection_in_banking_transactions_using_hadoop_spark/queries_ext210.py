"""Extension batch 210 (round 8): operations + layout diagnostics.

- oee_daily: Overall Equipment Effectiveness, the manufacturing KPI
  triple, read off the event stream per day: availability = observed
  active span / 24 h, performance = the day's event rate vs the best
  day's rate, quality = 1 - error-event share. OEE = A * P * Q. All
  three factors are ratios of exact integers (micros, counts).

- shuffle_skew_audit: the partition-skew read a 100 TB join planner
  needs BEFORE shuffling: for each candidate shuffle key, hash keys
  into 32 buckets with a PORTABLE hash (md5 prefix -- Spark's
  murmur and DuckDB's hash differ, so engine hashes can't be
  compared) and report max/mean bucket ratio and the coefficient of
  variation -- the two numbers that predict straggler tasks. Keys
  audited: o_custkey (row-weighted) and l_suppkey (line-weighted)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_B = 32  # audit buckets


@register(
    "oee_daily",
    """
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day,
             epoch_us(ts) AS us,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events),
    per AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(is_err) AS BIGINT) AS n_err,
             CAST(max(us) - min(us) AS BIGINT) AS span_us
      FROM ev GROUP BY day),
    best AS (
      SELECT max(CAST(n AS DOUBLE) / greatest(span_us, 1)) AS best_rate
      FROM per)
    SELECT strftime(p.day, '%Y-%m-%d') AS day, p.n AS n_events,
           round(CAST(p.span_us AS DOUBLE) / 86400000000.0, 6)
             AS availability,
           round((CAST(p.n AS DOUBLE) / greatest(p.span_us, 1))
                 / b.best_rate, 6) AS performance,
           round(1.0 - CAST(p.n_err AS DOUBLE) / p.n, 6) AS quality,
           round((CAST(p.span_us AS DOUBLE) / 86400000000.0)
                 * ((CAST(p.n AS DOUBLE) / greatest(p.span_us, 1))
                    / b.best_rate)
                 * (1.0 - CAST(p.n_err AS DOUBLE) / p.n), 6) AS oee
    FROM per p CROSS JOIN best b
    """,
    tags=("operations", "kpi", "calendar"),
)
def q_oee_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OEE per day from the event stream: availability (active span /
    24 h), performance (event rate vs the best day's rate -- the ideal
    cycle time proxy), quality (non-error share), and their product.
    Exact integer micros and counts under every ratio."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.session import (
        normalize_runtime_conf,
    )

    normalize_runtime_conf(spark)
    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    per = ev.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_err").cast("bigint").alias("n_err"),
        (F.max("us") - F.min("us")).cast("bigint").alias("span_us"),
    )
    best = per.agg(
        F.max(
            F.col("n").cast("double") / F.greatest(F.col("span_us"), F.lit(1))
        ).alias("best_rate")
    )
    avail = F.col("span_us").cast("double") / 86400000000.0
    perf = (
        F.col("n").cast("double") / F.greatest(F.col("span_us"), F.lit(1))
    ) / F.col("best_rate")
    qual = 1.0 - F.col("n_err").cast("double") / F.col("n")
    return per.crossJoin(F.broadcast(best)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("n_events"),
        F.round(avail, 6).alias("availability"),
        F.round(perf, 6).alias("performance"),
        F.round(qual, 6).alias("quality"),
        F.round(avail * perf * qual, 6).alias("oee"),
    )


_KEYS = (("orders", "o_custkey"), ("lineitem", "l_suppkey"))


def _bucket_sql(key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_B} AS INTEGER)"
    )


def _bucket_spark(key: str) -> str:
    return (
        f"CAST(CAST(conv(substring(md5(CAST({key} AS STRING)), 1, 8),"
        f" 16, 10) AS BIGINT) % {_B} AS INT)"
    )


@register(
    "shuffle_skew_audit",
    " UNION ALL ".join(
        f"""
    SELECT '{tbl}.{key}' AS shuffle_key,
           CAST(count(DISTINCT b) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket,
           round(CAST(max(n) AS DOUBLE) * {_B} / sum(n), 6)
             AS max_over_mean,
           round(sqrt(CAST(sum(CAST(n AS HUGEINT) * n) AS DOUBLE)
                      * {_B} / (CAST(sum(n) AS DOUBLE)
                                * CAST(sum(n) AS DOUBLE)) - 1.0), 6)
             AS cv
    FROM (SELECT {_bucket_sql(key)} AS b, CAST(count(*) AS BIGINT) AS n
          FROM {tbl} GROUP BY 1) x
    """
        for tbl, key in _KEYS
    ),
    tags=("layout", "skew", "planner"),
)
def q_shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew audit: hash each candidate join key into 32
    portable md5 buckets and report the straggler predictors --
    max-bucket / mean-bucket ratio and the coefficient of variation of
    bucket sizes (sqrt(B * sum n^2 / (sum n)^2 - 1), exact integer
    moments). ~1.0x / ~0 = safe to shuffle; a hot key shows up as
    max_over_mean >> 1 and is the salting trigger."""
    parts = []
    for tbl, key in _KEYS:
        t = read_table(spark, sf_dir, tbl)
        bdf = t.selectExpr(f"{_bucket_spark(key)} AS b").groupBy("b").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        agg = (
            bdf.agg(
                F.countDistinct("b").cast("bigint").alias("n_buckets"),
                F.max("n").cast("bigint").alias("max_bucket"),
                F.round(
                    F.max("n").cast("double") * _B / F.sum("n"), 6
                ).alias("max_over_mean"),
                F.round(
                    F.sqrt(
                        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
                        .cast("double")
                        * _B
                        / (
                            F.sum("n").cast("double")
                            * F.sum("n").cast("double")
                        )
                        - 1.0
                    ),
                    6,
                ).alias("cv"),
            )
        )
        parts.append(
            agg.select(
                F.lit(f"{tbl}.{key}").alias("shuffle_key"),
                "n_buckets",
                "max_bucket",
                "max_over_mean",
                "cv",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
