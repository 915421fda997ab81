"""Extension batch 236 (round 11): two classical completions.

- brown_forsythe_levene: THE standard homoscedasticity test (the
  median-centered Levene variant), closing the variance-test tier next
  to Fligner-Killeen (rank-based) and Bartlett-class moments. Exact
  arithmetic end-to-end: deviations are taken from DOUBLED medians
  (z = |2x - 2*med|, and 2*med = a + b is an exact integral double for
  any interpolated median of integers, so the BIGINT cast agrees
  cross-engine -- the r6 double->BIGINT rounding trap never fires);
  the one-way ANOVA on z runs in the ext26 integer-moment form with
  the r10 width lessons (s^2/n via HUGEINT/DECIMAL38 floor division,
  never round(double)), and the W statistic is emitted as the exact
  integer (1e6 * ssb * (n-k)) DIV ((k-1) * ssw).

- log_loss_forecaster: the proper-scoring-rule companion to
  brier_decomposition -- negative log likelihood of the
  Laplace-smoothed weekday purchase-rate forecaster ((k+1)/(n+2),
  bounded away from ln 0), trained on days 1-20 and scored on days
  21+. The loss decomposes over the 14 (weekday, outcome) cells, so
  each libm ln() evaluates ONCE per cell on an exact rational and is
  e9-quantized before the N-weighted exact-integer sum (the
  order-free-sum discipline); weekday labels partition but are never
  output (the CLAUDE.md dow-label rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "brown_forsythe_levene",
    """
    WITH x AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100 AS v
      FROM orders),
    med AS (
      SELECT g, CAST(2 * median(v) AS BIGINT) AS med2
      FROM x GROUP BY g),
    z AS (
      SELECT x.g, abs(2 * x.v - m.med2) AS z
      FROM x JOIN med m ON m.g = x.g),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS BIGINT) AS s,
             CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS q
      FROM z GROUP BY g),
    terms AS (
      SELECT n, s, q,
             (CAST(s AS HUGEINT) * s) // n AS wb
      FROM grp),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s) AS HUGEINT) AS ss,
             CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(wb) AS HUGEINT) AS b_sum,
             CAST(sum(q - wb) AS HUGEINT) AS w_sum
      FROM terms)
    SELECT nn AS n_total, kk AS n_groups,
           CAST(b_sum - (ss * ss) // nn AS BIGINT) AS ssb,
           CAST(w_sum AS BIGINT) AS ssw,
           CAST((1000000 * (b_sum - (ss * ss) // nn) * (nn - kk))
                // ((kk - 1) * w_sum) AS BIGINT) AS w_stat_e6
    FROM tot
    """,
    tags=("stats", "variance-test", "exact-arith"),
)
def q_brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) across order priorities
    (module docstring): doubled-median deviations keep everything in
    BIGINT; ANOVA-on-z in exact integer moments; W emitted at e6 by
    integer division."""
    orders = read_table(spark, sf_dir, "orders")
    x = orders.select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100").alias(
            "v"
        ),
    )
    med = x.groupBy("g").agg(
        F.expr("CAST(2 * median(v) AS BIGINT)").alias("med2")
    )
    z = x.join(med, "g").select("g", F.expr("abs(2 * v - med2)").alias("z"))
    grp = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(z AS DECIMAL(38,0)) * z"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    terms = grp.select(
        "n",
        "s",
        "q",
        F.expr("(CAST(s AS DECIMAL(38,0)) * s) DIV n")
        .cast("decimal(38,0)")
        .alias("wb"),
    )
    tot = terms.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.col("s").cast("decimal(38,0)")).cast("decimal(38,0)").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum("wb").cast("decimal(38,0)").alias("b_sum"),
        F.sum(F.col("q") - F.col("wb")).cast("decimal(38,0)").alias("w_sum"),
    )
    return tot.selectExpr(
        "nn AS n_total",
        "kk AS n_groups",
        "CAST(b_sum - (ss * ss) DIV nn AS BIGINT) AS ssb",
        "CAST(w_sum AS BIGINT) AS ssw",
        "CAST((1000000 * (b_sum - (ss * ss) DIV nn) * (nn - kk))"
        " DIV ((kk - 1) * w_sum) AS BIGINT) AS w_stat_e6",
    )


@register(
    "log_loss_forecaster",
    """
    WITH lab AS (
      SELECT dayofweek(CAST(ts AS DATE)) % 7 AS dow,
             CAST(strftime(ts, '%d') AS INTEGER) AS dom,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    train AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS k
      FROM lab WHERE dom <= 20 GROUP BY dow),
    test AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS m, CAST(sum(y) AS BIGINT) AS kp
      FROM lab WHERE dom > 20 GROUP BY dow),
    cells AS (
      SELECT t.m, t.kp,
             CAST(floor(1e9 * (-ln((CAST(tr.k AS DOUBLE) + 1) / (tr.n + 2)))
                  + 0.5) AS BIGINT) AS lp1,
             CAST(floor(1e9 * (-ln(1 - (CAST(tr.k AS DOUBLE) + 1) / (tr.n + 2)))
                  + 0.5) AS BIGINT) AS lp0
      FROM test t JOIN train tr ON tr.dow = t.dow)
    SELECT CAST(sum(m) AS BIGINT) AS n_test,
           CAST(sum(kp) AS BIGINT) AS n_pos,
           CAST(sum(kp * lp1 + (m - kp) * lp0) AS BIGINT) AS loss_sum_e9,
           CAST(sum(kp * lp1 + (m - kp) * lp0) // sum(m) AS BIGINT)
             AS logloss_e9
    FROM cells
    """,
    tags=("eval", "scoring-rule", "exact-arith"),
)
def q_log_loss_forecaster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative log likelihood of the Laplace-smoothed weekday
    purchase forecaster (module docstring): ln evaluated once per
    (weekday, outcome) cell on an exact rational, e9-quantized, then
    exact-integer weighted sums."""
    ev = read_table(spark, sf_dir, "events")
    lab = ev.select(
        F.expr("dayofweek(CAST(ts AS DATE)) % 7").alias("dow"),
        F.dayofmonth("ts").alias("dom"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    train = (
        lab.where("dom <= 20")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("k"),
        )
    )
    test = (
        lab.where("dom > 20")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum("y").cast("bigint").alias("kp"),
        )
    )
    cells = test.join(train, "dow").select(
        "m",
        "kp",
        F.expr(
            "CAST(floor(1e9 * (-ln((CAST(k AS DOUBLE) + 1) / (n + 2))) + 0.5)"
            " AS BIGINT)"
        ).alias("lp1"),
        F.expr(
            "CAST(floor(1e9 * (-ln(1 - (CAST(k AS DOUBLE) + 1) / (n + 2))) + 0.5)"
            " AS BIGINT)"
        ).alias("lp0"),
    )
    return cells.agg(
        F.sum("m").cast("bigint").alias("n_test"),
        F.sum("kp").cast("bigint").alias("n_pos"),
        F.sum(F.expr("kp * lp1 + (m - kp) * lp0"))
        .cast("bigint")
        .alias("loss_sum_e9"),
        F.expr(
            "CAST(sum(kp * lp1 + (m - kp) * lp0) DIV sum(m) AS BIGINT)"
        ).alias("logloss_e9"),
    )
