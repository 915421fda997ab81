"""Extension batch 157 (round 6): the medcouple (Brys-Hubert-Struyf
robust skewness: the median of a pairwise kernel, 25% breakdown --
the statistic behind the ADJUSTED boxplot whose fences stop
mis-flagging skewed-but-clean data) with its adjusted fences and
outlier counts, and the Kolmogorov-Zurbenko filter (three iterated
5-day moving averages: the epidemiology/air-quality standard for
separating signal from noise, with a provable near-Gaussian kernel).

Cross-engine discipline:
- medcouple: the kernel h = ((xj-med)-(med-xi))/(xj-xi) is one double
  expression per pair over exact integers; its MEDIAN is selected by
  exact cumulative counts over the h-value spine (doubles ORDER
  identically in both engines -- they are compared, never summed).
  Pairs are left-of-median x right-of-median over the calendar-bounded
  daily spine.
- KZ: iterated window SUMS stay exact integers scaled by 5^k (the
  division by 125 happens once at the end), so the smoothed series
  and its variance-reduction ratio are exact-integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


@register(
    "medcouple_skew_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    ranked AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    med AS (
      SELECT min(CASE WHEN 2 * rk >= n THEN v END) AS m,
             min(CASE WHEN 4 * rk >= n THEN v END) AS q1,
             min(CASE WHEN 4 * rk >= 3 * n THEN v END) AS q3
      FROM ranked),
    h AS (
      SELECT ((CAST(b.v AS DOUBLE) - m.m) - (m.m - a.v))
               / (CAST(b.v AS DOUBLE) - a.v) AS hv
      FROM daily a CROSS JOIN med m JOIN daily b
        ON a.v <= m.m AND b.v >= m.m AND a.v < b.v),
    hs AS (
      SELECT hv, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY hv),
    hr AS (
      SELECT hv, sum(c) OVER (ORDER BY hv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER () AS nh
      FROM hs),
    mc AS (SELECT min(CASE WHEN 2 * cc >= nh THEN hv END) AS mc FROM hr),
    fences AS (
      SELECT m.m, m.q1, m.q3, c.mc,
             CASE WHEN c.mc >= 0
                  THEN m.q1 - 1.5 * exp(-4.0 * c.mc) * (m.q3 - m.q1)
                  ELSE m.q1 - 1.5 * exp(-3.0 * c.mc) * (m.q3 - m.q1) END
               AS lo,
             CASE WHEN c.mc >= 0
                  THEN m.q3 + 1.5 * exp(3.0 * c.mc) * (m.q3 - m.q1)
                  ELSE m.q3 + 1.5 * exp(4.0 * c.mc) * (m.q3 - m.q1) END
               AS hi
      FROM med m CROSS JOIN mc c)
    SELECT round(f.mc, 6) + 0.0 AS medcouple,
           CAST(f.m AS BIGINT) AS median_dollars,
           round(f.lo, 2) AS adjusted_fence_lo,
           round(f.hi, 2) AS adjusted_fence_hi,
           (SELECT CAST(sum(CASE WHEN d2.v < f.lo THEN 1 ELSE 0 END)
                   AS BIGINT) FROM daily d2) AS n_low_outliers,
           (SELECT CAST(sum(CASE WHEN d2.v > f.hi THEN 1 ELSE 0 END)
                   AS BIGINT) FROM daily d2) AS n_high_outliers
    FROM fences f
    """,
    tags=("stats", "robust", "outlier"),
)
def q_medcouple_skew_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medcouple of daily revenue + the Hubert-Vandervieren ADJUSTED
    boxplot fences (Q1 - 1.5 e^{-4MC} IQR, Q3 + 1.5 e^{3MC} IQR for
    MC >= 0; exponents swap for MC < 0) and the resulting outlier
    counts -- on right-skewed spend data the plain Tukey fences flag
    healthy busy days; the medcouple-adjusted ones don't. The kernel
    median is an exact count-based order statistic over the pair-value
    spine (pairs = left-of-median x right-of-median, calendar-
    bounded); equal-to-median tie pairs with xi = xj are excluded
    (the degenerate kernel), documented."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    wr = Window.orderBy("v", "d")
    ranked = daily.select(
        "v",
        F.row_number().over(wr).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    med = ranked.agg(
        F.min(F.when(2 * F.col("rk") >= F.col("n"), F.col("v"))).alias("m"),
        F.min(F.when(4 * F.col("rk") >= F.col("n"), F.col("v"))).alias("q1"),
        F.min(F.when(4 * F.col("rk") >= 3 * F.col("n"), F.col("v"))).alias(
            "q3"
        ),
    )
    a = daily.select(F.col("v").alias("va"))
    b = daily.select(F.col("v").alias("vb"))
    h = (
        a.crossJoin(F.broadcast(med))
        .join(
            b,
            (F.col("va") <= F.col("m"))
            & (F.col("vb") >= F.col("m"))
            & (F.col("va") < F.col("vb")),
        )
        .select(
            (
                (
                    (F.col("vb").cast("double") - F.col("m"))
                    - (F.col("m") - F.col("va"))
                )
                / (F.col("vb").cast("double") - F.col("va"))
            ).alias("hv")
        )
    )
    hs = h.groupBy("hv").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wh = Window.orderBy("hv").rowsBetween(Window.unboundedPreceding, 0)
    hr = hs.select(
        "hv",
        F.sum("c").over(wh).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("nh"),
    )
    mc = hr.agg(
        F.min(F.when(2 * F.col("cc") >= F.col("nh"), F.col("hv"))).alias("mc")
    )
    fences = med.crossJoin(F.broadcast(mc)).select(
        "m",
        "q1",
        "q3",
        "mc",
        F.when(
            F.col("mc") >= 0,
            F.col("q1")
            - 1.5 * F.exp(-4.0 * F.col("mc")) * (F.col("q3") - F.col("q1")),
        )
        .otherwise(
            F.col("q1")
            - 1.5 * F.exp(-3.0 * F.col("mc")) * (F.col("q3") - F.col("q1"))
        )
        .alias("lo"),
        F.when(
            F.col("mc") >= 0,
            F.col("q3")
            + 1.5 * F.exp(3.0 * F.col("mc")) * (F.col("q3") - F.col("q1")),
        )
        .otherwise(
            F.col("q3")
            + 1.5 * F.exp(4.0 * F.col("mc")) * (F.col("q3") - F.col("q1"))
        )
        .alias("hi"),
    )
    counts = (
        daily.crossJoin(F.broadcast(fences))
        .agg(
            F.sum(F.when(F.col("v") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low_outliers"),
            F.sum(F.when(F.col("v") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high_outliers"),
        )
    )
    return fences.crossJoin(F.broadcast(counts)).select(
        (F.round(F.col("mc"), 6) + F.lit(0.0)).alias("medcouple"),
        F.col("m").cast("bigint").alias("median_dollars"),
        F.round(F.col("lo"), 2).alias("adjusted_fence_lo"),
        F.round(F.col("hi"), 2).alias("adjusted_fence_hi"),
        "n_low_outliers",
        "n_high_outliers",
    )


@register(
    "kz_filter_smoothness",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    p1 AS (
      SELECT d, cents,
             sum(cents) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s1,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS c1
      FROM daily),
    p2 AS (
      SELECT d, cents, s1,
             sum(s1) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s2,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS c2
      FROM p1 WHERE c1 = 5),
    p3 AS (
      SELECT d, cents,
             sum(s2) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS s3,
             count(*) OVER (ORDER BY d
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS c3
      FROM p2 WHERE c2 = 5),
    kz AS (
      SELECT cents, s3 FROM p3 WHERE c3 = 5),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sr,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS srr,
             CAST(sum(CAST(s3 AS HUGEINT)) AS HUGEINT) AS sk,
             CAST(sum(CAST(s3 AS HUGEINT) * s3) AS HUGEINT) AS skk
      FROM kz)
    SELECT CAST(n AS BIGINT) AS n_days_smoothed,
           round(sqrt(CAST(n * srr - sr * sr AS DOUBLE)) / CAST(n AS DOUBLE)
                 / 100.0, 2) AS sd_raw_dollars,
           round(sqrt(CAST(n * skk - sk * sk AS DOUBLE)) / CAST(n AS DOUBLE)
                 / 125.0 / 100.0, 2) AS sd_kz_dollars,
           round(CAST(n * skk - sk * sk AS DOUBLE) / 15625.0
                 / CAST(n * srr - sr * sr AS DOUBLE), 6) AS variance_ratio
    FROM mom
    """,
    tags=("timeseries", "smoothing", "exact-arith"),
)
def q_kz_filter_smoothness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Zurbenko KZ(5,3) filter on daily revenue: three
    iterated centered 5-day moving SUMS (exact integers scaled by 125;
    each pass keeps only complete windows, trimming 2 days per side),
    then the variance-reduction ratio var(KZ)/var(raw) over the
    surviving days. KZ's iterated-MA kernel is near-Gaussian with
    sharp high-frequency cutoff -- the standard trend extractor when
    you need provable attenuation, done here without a single float
    until the final ratios."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w5 = Window.orderBy("d").rowsBetween(-2, 2)
    p1 = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w5).alias("s1"),
        F.count(F.lit(1)).over(w5).alias("c1"),
    ).where(F.col("c1") == 5)
    p2 = p1.select(
        "d",
        "cents",
        F.sum("s1").over(w5).alias("s2"),
        F.count(F.lit(1)).over(w5).alias("c2"),
    ).where(F.col("c2") == 5)
    p3 = p2.select(
        "cents",
        F.sum("s2").over(w5).alias("s3"),
        F.count(F.lit(1)).over(w5).alias("c3"),
    ).where(F.col("c3") == 5)
    mom = p3.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("cents").cast(_DEC)).cast(_DEC).alias("sr"),
        F.sum(F.col("cents").cast(_DEC) * F.col("cents")).cast(_DEC).alias("srr"),
        F.sum(F.col("s3").cast(_DEC)).cast(_DEC).alias("sk"),
        F.sum(F.col("s3").cast(_DEC) * F.col("s3")).cast(_DEC).alias("skk"),
    )
    vr = (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast("double")
    vk = (F.col("n") * F.col("skk") - F.col("sk") * F.col("sk")).cast("double")
    nd = F.col("n").cast("double")
    return mom.select(
        F.col("n").cast("bigint").alias("n_days_smoothed"),
        F.round(F.sqrt(vr) / nd / 100.0, 2).alias("sd_raw_dollars"),
        F.round(F.sqrt(vk) / nd / 125.0 / 100.0, 2).alias("sd_kz_dollars"),
        F.round(vk / 15625.0 / vr, 6).alias("variance_ratio"),
    )
