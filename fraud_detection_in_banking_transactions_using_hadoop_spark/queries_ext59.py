"""Extension batch 59: Bernoulli CUSUM rate monitoring and the Kish
effective sample size.

Scale notes (the 100 TB story per query):
- bernoulli_cusum_monitor is SPC for RATES (the value-based CUSUM
  can't monitor a proportion): daily return-rate log-likelihood-ratio
  weights as exact e6 integers, and the one-sided CUSUM recursion
  S_t = max(0, S_{t-1} + w_t) rewritten with the clamp closed form
  S_t = cum_t - min(0, running-min of cum) -- a prefix sum and a
  prefix min on the bounded daily spine instead of a sequential scan.
  Alarm days are where S crosses h.
- kish_ess is the survey-weighting health check: effective sample
  size (sum w)^2 / sum w^2 of an importance-weighted sample. Exact
  integer weight moments -> one closing division; ESS/n far below 1
  means the weights (here balance-proportional) are doing more
  variance damage than bias repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# LLR weights (e6 ints) for H0: p0 = 0.24 vs H1: p1 = 0.30, precomputed
# in Python so neither engine evaluates a log:
import math

_P0, _P1 = 0.24, 0.30
_W_RET = round(1e6 * math.log(_P1 / _P0))  # weight per returned order
_W_OK = round(1e6 * math.log((1 - _P1) / (1 - _P0)))  # per clean order
_H_E6 = 3_000_000  # alarm threshold h = 3.0 in LLR units


@register(
    "bernoulli_cusum_monitor",
    f"""
    WITH lab AS (
      SELECT o.o_orderdate AS d,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    daily AS (
      SELECT d,
             CAST(sum(y) * {_W_RET} + sum(1 - y) * ({_W_OK}) AS BIGINT) AS w
      FROM lab GROUP BY d
    ),
    cum AS (
      SELECT d, w,
             sum(w) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM daily
    ),
    clamped AS (
      SELECT d, cw,
             least(coalesce(min(cw) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0)
               AS floor_cw
      FROM cum
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(cw - floor_cw) AS BIGINT) AS max_s_e6,
           CAST(sum(CASE WHEN cw - floor_cw > {_H_E6} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days
    FROM clamped
    """,
    tags=("spc", "cusum", "fraud"),
)
def q_bernoulli_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided Bernoulli CUSUM of the daily return rate against
    p0 = 0.24 drifting to p1 = 0.30: per-day LLR weights are exact e6
    integers (Python-precomputed log constants), and the clamped
    recursion is the closed form S_t = cum_t - min(0, prefix-min of
    cum) -- two bounded-spine windows, zero sequential state. Alarm
    when S > 3.0."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lab = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        F.col("o_orderdate").alias("d"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    daily = lab.groupBy("d").agg(
        (F.sum("y") * _W_RET + F.sum(1 - F.col("y")) * _W_OK)
        .cast("bigint")
        .alias("w")
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    cum = daily.select("d", F.sum("w").over(w_cum).alias("cw"))
    clamped = cum.select(
        "d",
        "cw",
        F.least(
            F.coalesce(F.min("cw").over(w_prev), F.lit(0)), F.lit(0)
        ).alias("floor_cw"),
    )
    s = F.col("cw") - F.col("floor_cw")
    return clamped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max(s).cast("bigint").alias("max_s_e6"),
        F.sum(F.when(s > _H_E6, 1).otherwise(0)).cast("bigint").alias("n_alarm_days"),
    )


# ---------------------------------------------------------------------------
# Kish effective sample size of balance-proportional weights.
# ---------------------------------------------------------------------------
@register(
    "kish_ess",
    """
    WITH w AS (
      SELECT greatest(CAST(round(c_acctbal * 100, 0) AS BIGINT), 1) AS wt
      FROM customer
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(wt) AS HUGEINT) AS s1,
             sum(CAST(wt AS HUGEINT) * wt) AS s2
      FROM w
    )
    SELECT n,
           round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(s2 AS DOUBLE), 6) AS ess,
           CAST((1000000 * CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(s2 AS DOUBLE), 0) AS BIGINT)) // n AS BIGINT)
             AS ess_ratio_ppm
    FROM s
    """,
    tags=("survey", "weights", "ess"),
)
def q_kish_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ESS = (sum w)^2 / sum w^2 for balance-proportional importance
    weights (cents, clipped to >= 1): exact integer weight moments in
    HUGEINT/decimal, one closing division, plus ESS/n in ppm -- the
    design-effect number that tells you what the weighting actually
    cost in variance."""
    cust = read_table(spark, sf_dir, "customer")
    w = cust.select(
        F.greatest(
            F.expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)"), F.lit(1).cast("bigint")
        ).alias("wt")
    )
    s = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("wt").cast(_DEC).alias("s1"),
        F.sum(F.col("wt").cast(_DEC) * F.col("wt")).cast(_DEC).alias("s2"),
    )
    ess = F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("s2").cast(
        "double"
    )
    return s.select(
        "n",
        F.round(ess, 6).alias("ess"),
        F.expr(
            "CAST((1000000 * CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
            " / CAST(s2 AS DOUBLE), 0) AS BIGINT)) DIV n AS BIGINT)"
        ).alias("ess_ratio_ppm"),
    )
