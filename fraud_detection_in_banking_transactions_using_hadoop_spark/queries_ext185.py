"""Extension batch 185 (round 6): effect-size completions -- the
ANOVA effect sizes (eta^2, the less-biased omega^2, and Cohen's f)
for the day-of-week revenue ANOVA that anova_dow_revenue only
F-tests ("significant" at n = 15k is cheap; these say HOW MUCH of
the variance the weekday actually explains), and Hedges' g for the
weekend-vs-weekday daily-revenue contrast (Cohen's d with the exact
small-sample correction factor 1 - 3/(4 df - 1) that de-biases the
pooled-SD denominator).

Cross-engine discipline: all sums of squares fold from exact integer
dollar moments with the anova_dow_revenue wb/ww rounding convention;
weekday identity comes from engine-neutral date arithmetic (days
since Monday 1992-01-06, mod 7) because dayofweek() % 7 MAPS
DIFFERENT LABELS in Spark vs DuckDB (CLAUDE.md) -- safe for
partitioning, wrong for picking which days are the weekend."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# days since this Monday, mod 7 -> 0=Mon .. 5=Sat, 6=Sun (engine-neutral)
_MONDAY = "1992-01-06"


@register(
    "anova_effect_sizes",
    """
    WITH x AS (
      SELECT dayofweek(o_orderdate) % 7 AS dow,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100 AS c
      FROM orders),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM x GROUP BY dow),
    terms AS (
      SELECT n, s, q,
             CAST(round(CAST(s AS DOUBLE) * s / n, 0) AS BIGINT) AS wb
      FROM g),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
             CAST(sum(q) AS BIGINT) AS qq, CAST(sum(wb) AS BIGINT) AS wbs,
             CAST(count(*) AS BIGINT) AS k
      FROM terms),
    ssq AS (
      SELECT nn, k,
             wbs - CAST(round(CAST(ss AS DOUBLE) * ss / nn, 0) AS BIGINT)
               AS ssb,
             qq - CAST(round(CAST(ss AS DOUBLE) * ss / nn, 0) AS BIGINT)
               AS sst,
             qq - wbs AS ssw
      FROM tot)
    SELECT nn AS n_orders, k AS n_groups,
           round(CAST(ssb AS DOUBLE) / sst, 6) AS eta_squared,
           round((ssb - (k - 1.0) * (CAST(ssw AS DOUBLE) / (nn - k)))
                 / (sst + CAST(ssw AS DOUBLE) / (nn - k)), 6) + 0.0
             AS omega_squared,
           round(sqrt(CAST(ssb AS DOUBLE) / ssw), 6) AS cohens_f
    FROM ssq
    """,
    tags=("stats", "anova", "effect-size"),
)
def q_anova_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes for the day-of-week revenue ANOVA: eta^2 =
    SSB/SST (variance explained, upward-biased), omega^2 =
    (SSB - (k-1) MSW)/(SST + MSW) (the unbiased population estimate
    -- can go slightly negative under a true null, which is exactly
    the point), and Cohen's f = sqrt(SSB/SSW). anova_dow_revenue
    already prints the F statistic; at n ~ 15k even a vanishing
    weekday effect is "significant", and these three say whether it
    MATTERS. Same exact integer dollar moments and wb rounding
    convention as the ANOVA query."""
    orders = read_table(spark, sf_dir, "orders")
    x = orders.select(
        (F.dayofweek("o_orderdate") % 7).alias("dow"),
        F.expr(
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100"
        ).alias("c"),
    )
    g = x.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    terms = g.select(
        "n",
        "s",
        "q",
        F.round(F.col("s").cast("double") * F.col("s") / F.col("n"), 0)
        .cast("bigint")
        .alias("wb"),
    )
    tot = terms.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("q").cast("bigint").alias("qq"),
        F.sum("wb").cast("bigint").alias("wbs"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    grand = (
        F.round(F.col("ss").cast("double") * F.col("ss") / F.col("nn"), 0)
        .cast("bigint")
    )
    ssq = tot.select(
        "nn",
        "k",
        (F.col("wbs") - grand).alias("ssb"),
        (F.col("qq") - grand).alias("sst"),
        (F.col("qq") - F.col("wbs")).alias("ssw"),
    )
    msw = F.col("ssw").cast("double") / (F.col("nn") - F.col("k"))
    return ssq.select(
        F.col("nn").alias("n_orders"),
        F.col("k").alias("n_groups"),
        F.round(F.col("ssb").cast("double") / F.col("sst"), 6).alias(
            "eta_squared"
        ),
        (
            F.round(
                (F.col("ssb") - (F.col("k") - 1.0) * msw)
                / (F.col("sst") + msw),
                6,
            )
            + F.lit(0.0)
        ).alias("omega_squared"),
        F.round(
            F.sqrt(F.col("ssb").cast("double") / F.col("ssw")), 6
        ).alias("cohens_f"),
    )


@register(
    "hedges_g_weekend",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    lab AS (
      SELECT v,
             CASE WHEN ((datediff('day', DATE '{_MONDAY}',
                                  CAST(d AS DATE)) % 7) + 7) % 7
                       >= 5 THEN 1 ELSE 0 END AS wk
      FROM daily),
    g AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      FROM lab GROUP BY wk),
    w AS (
      SELECT max(CASE WHEN wk = 1 THEN n END) AS n1,
             max(CASE WHEN wk = 1 THEN s END) AS s1,
             max(CASE WHEN wk = 1 THEN q END) AS q1,
             max(CASE WHEN wk = 0 THEN n END) AS n0,
             max(CASE WHEN wk = 0 THEN s END) AS s0,
             max(CASE WHEN wk = 0 THEN q END) AS q0
      FROM g),
    st AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s0 AS DOUBLE) / n0 AS m0,
             sqrt(((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                   + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0))
                  / (n1 + n0 - 2)) AS sp
      FROM w)
    SELECT CAST(n1 AS BIGINT) AS n_weekend,
           CAST(n0 AS BIGINT) AS n_weekday,
           round(m1 - m0, 2) + 0.0 AS mean_diff_dollars,
           round((m1 - m0) / sp, 6) + 0.0 AS cohens_d,
           round(1.0 - 3.0 / (4.0 * (n1 + n0 - 2) - 1.0), 6)
             AS correction,
           round((m1 - m0) / sp
                 * (1.0 - 3.0 / (4.0 * (n1 + n0 - 2) - 1.0)), 6) + 0.0
             AS hedges_g
    FROM st
    """,
    tags=("stats", "effect-size", "hedges"),
)
def q_hedges_g_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hedges' g for weekend vs weekday daily revenue: Cohen's d =
    (mean_weekend - mean_weekday)/s_pooled times the exact
    small-sample correction J = 1 - 3/(4 df - 1) (the pooled SD is
    upward-biased at small df; g is the de-biased standard in
    meta-analysis). Weekday identity uses engine-neutral date
    arithmetic -- days since Monday 1992-01-06 mod 7, >= 5 = weekend
    -- because Spark's and DuckDB's dayofweek() % 7 assign DIFFERENT
    labels to the same day. Exact integer dollar moments throughout."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    dow = (
        (F.datediff(F.col("d"), F.lit(_MONDAY).cast("date")) % 7) + 7
    ) % 7
    lab = daily.select(
        "v", F.when(dow >= 5, 1).otherwise(0).alias("wk")
    )
    g = lab.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("wk") == wkv, F.col(c))).alias(
                f"{c}{wkv}"
            )
            for wkv in (1, 0)
            for c in ("n", "s", "q")
        ]
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    sp = F.sqrt(
        (
            (
                F.col("q1").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
            )
            + (
                F.col("q0").cast("double")
                - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
            )
        )
        / (F.col("n1") + F.col("n0") - 2)
    )
    corr = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n0") - 2) - 1.0)
    return w.select(
        F.col("n1").cast("bigint").alias("n_weekend"),
        F.col("n0").cast("bigint").alias("n_weekday"),
        (F.round(m1 - m0, 2) + F.lit(0.0)).alias("mean_diff_dollars"),
        (F.round((m1 - m0) / sp, 6) + F.lit(0.0)).alias("cohens_d"),
        F.round(corr, 6).alias("correction"),
        (F.round((m1 - m0) / sp * corr, 6) + F.lit(0.0)).alias(
            "hedges_g"
        ),
    )
