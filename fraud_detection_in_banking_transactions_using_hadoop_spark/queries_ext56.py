"""Extension batch 56: Simpson's-paradox detection, longest streak,
and last-digit uniformity.

Scale notes (the 100 TB story per query):
- simpsons_paradox_check compares the pooled high-priority return-rate
  difference against every segment's within-stratum difference: sign
  flips are Simpson's paradox in the wild, the single most common way
  a dashboard lies. Exact integer counts per stratum plus a 1-row
  pooled broadcast; the flip flag is pure integer cross-multiplication
  (no division at all).
- longest_increase_streak finds the longest run of strictly rising
  daily revenue via the island trick (streak breaks from a lag
  comparison, island ids from the prefix sum) on the bounded spine --
  the record-keeping query behind "N days of growth" banners.
- last_digit_uniformity is the auditor's other digit test: invoice
  LAST cent digits should be uniform (unlike leading digits/Benford);
  humans inventing numbers fail it. Chi-square against uniform(10)
  from exact digit counts, e9-int terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Simpson's paradox detector: pooled vs per-segment direction.
# ---------------------------------------------------------------------------
@register(
    "simpsons_paradox_check",
    """
    WITH lab AS (
      SELECT c.c_mktsegment AS seg,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS t,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    per AS (
      SELECT seg,
             CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS k_t,
             CAST(sum(t) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS k_c,
             CAST(sum(1 - t) AS BIGINT) AS n_c
      FROM lab GROUP BY seg
      HAVING sum(t) > 0 AND sum(1 - t) > 0
    ),
    pooled AS (
      SELECT CAST(sum(k_t) AS BIGINT) AS pk_t, CAST(sum(n_t) AS BIGINT) AS pn_t,
             CAST(sum(k_c) AS BIGINT) AS pk_c, CAST(sum(n_c) AS BIGINT) AS pn_c
      FROM per
    )
    SELECT per.seg, per.k_t, per.n_t, per.k_c, per.n_c,
           CAST(CASE WHEN per.k_t * per.n_c > per.k_c * per.n_t THEN 1
                     WHEN per.k_t * per.n_c < per.k_c * per.n_t THEN -1
                     ELSE 0 END AS INTEGER) AS stratum_sign,
           CAST(CASE WHEN p.pk_t * p.pn_c > p.pk_c * p.pn_t THEN 1
                     WHEN p.pk_t * p.pn_c < p.pk_c * p.pn_t THEN -1
                     ELSE 0 END AS INTEGER) AS pooled_sign,
           CAST(CASE WHEN (CASE WHEN per.k_t * per.n_c > per.k_c * per.n_t
                           THEN 1 WHEN per.k_t * per.n_c < per.k_c * per.n_t
                           THEN -1 ELSE 0 END)
                      * (CASE WHEN p.pk_t * p.pn_c > p.pk_c * p.pn_t THEN 1
                         WHEN p.pk_t * p.pn_c < p.pk_c * p.pn_t THEN -1
                         ELSE 0 END) < 0
                THEN 1 ELSE 0 END AS INTEGER) AS is_reversed
    FROM per CROSS JOIN pooled p
    """,
    tags=("stats", "simpson", "causal"),
)
def q_simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-direction comparison by pure integer cross-multiplication
    (k_t*n_c vs k_c*n_t -- no division, no floats): per-segment sign
    vs the pooled sign, with is_reversed flagging paradox strata. One
    groupBy to 5 rows + a 1-row pooled broadcast."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    lab = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li_r, o.o_orderkey == li_r.l_orderkey, "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("t"),
            F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
        )
    )
    per = (
        lab.groupBy("seg")
        .agg(
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).cast("bigint").alias("k_t"),
            F.sum("t").cast("bigint").alias("n_t"),
            F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).cast("bigint").alias("k_c"),
            F.sum(1 - F.col("t")).cast("bigint").alias("n_c"),
        )
        .where((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )
    pooled = per.agg(
        F.sum("k_t").cast("bigint").alias("pk_t"),
        F.sum("n_t").cast("bigint").alias("pn_t"),
        F.sum("k_c").cast("bigint").alias("pk_c"),
        F.sum("n_c").cast("bigint").alias("pn_c"),
    )

    def sign(kt, nc, kc, nt):
        return (
            F.when(F.col(kt) * F.col(nc) > F.col(kc) * F.col(nt), 1)
            .when(F.col(kt) * F.col(nc) < F.col(kc) * F.col(nt), -1)
            .otherwise(0)
        )

    ssign = sign("k_t", "n_c", "k_c", "n_t")
    psign = sign("pk_t", "pn_c", "pk_c", "pn_t")
    return per.crossJoin(F.broadcast(pooled)).select(
        "seg",
        "k_t",
        "n_t",
        "k_c",
        "n_c",
        ssign.cast("integer").alias("stratum_sign"),
        psign.cast("integer").alias("pooled_sign"),
        F.when(ssign * psign < 0, 1).otherwise(0).cast("integer").alias("is_reversed"),
    )


# ---------------------------------------------------------------------------
# Longest strictly-increasing daily revenue streak.
# ---------------------------------------------------------------------------
@register(
    "longest_increase_streak",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    marked AS (
      SELECT d, c,
             CASE WHEN c > lag(c) OVER (ORDER BY d) THEN 0 ELSE 1 END
               AS brk
      FROM days
    ),
    islands AS (
      SELECT d, sum(brk) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM marked
    ),
    runs AS (
      SELECT isl, CAST(count(*) AS BIGINT) AS len,
             min(d) AS start_d, max(d) AS end_d
      FROM islands GROUP BY isl
    )
    SELECT len AS streak_days,
           strftime(start_d, '%Y-%m-%d') AS start_date,
           strftime(end_d, '%Y-%m-%d') AS end_date
    FROM runs ORDER BY len DESC, start_d LIMIT 1
    """,
    tags=("timeseries", "streak", "records"),
)
def q_longest_increase_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of strictly rising daily revenue via the island
    trick: a break flag from lag comparison (the first day counts as a
    break), island ids from the prefix sum, run lengths from one
    groupBy; deterministic earliest-start tiebreak. Bounded spine
    windows only."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d")
    marked = days.select(
        "d",
        F.when(F.col("c") > F.lag("c").over(w), 0).otherwise(1).alias("brk"),
    )
    islands = marked.select(
        "d",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("isl"),
    )
    runs = islands.groupBy("isl").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("start_date"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("end_date"),
    )
    return (
        runs.select("streak_days", "start_date", "end_date")
        .orderBy(F.col("streak_days").desc(), "start_date")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# Last-digit uniformity audit.
# ---------------------------------------------------------------------------
@register(
    "last_digit_uniformity",
    f"""
    WITH digits AS (
      SELECT {_CENTS} % 10 AS dig FROM orders
    ),
    per AS (SELECT dig, CAST(count(*) AS BIGINT) AS n FROM digits
            GROUP BY dig),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM per)
    SELECT p.dig AS last_digit, p.n,
           CAST(round(1000000000.0
             * (p.n - CAST(t.nn AS DOUBLE) / 10)
             * (p.n - CAST(t.nn AS DOUBLE) / 10)
             / (CAST(t.nn AS DOUBLE) / 10), 0) AS BIGINT) AS chi2_term_e9
    FROM per p CROSS JOIN tot t
    """,
    tags=("fraud", "audit", "digits"),
)
def q_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last cent digits should be uniform; invented numbers aren't.
    Chi-square terms against uniform(10) as e9 integers (order-free
    sum = the statistic, df = 9). One groupBy to 10 rows."""
    orders = read_table(spark, sf_dir, "orders")
    per = orders.select(F.expr(f"{_CENTS} % 10").alias("dig")).groupBy("dig").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = per.agg(F.sum("n").cast("bigint").alias("nn"))
    e = F.col("nn").cast("double") / 10
    term = F.round(F.lit(1000000000.0) * (F.col("n") - e) * (F.col("n") - e) / e, 0).cast(
        "bigint"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("dig").alias("last_digit"), "n", term.alias("chi2_term_e9")
    )
