"""Extension batch 179 (round 6): the robust-estimation completions --
the classical robust-location suite (Gastwirth's 0.3/0.4/0.3 tertile
blend, Tukey's trimean, the midhinge) printed against mean and median
so the skew of daily revenue is read as the SPREAD of five location
estimates, the ISO 22514 percentile-method capability index for
non-normal processes (replace 6 sigma with the P99.865 - P0.135
span -- the fix when process_capability_cpk's normal assumption is
the thing being violated), and the biweight midcorrelation (the
robust correlation whose univariate scale, biweight_midvariance,
already ships: outlying days get smoothly zero weight instead of
dominating the Pearson cross-moment).

Cross-engine discipline: all order statistics are exact nearest-rank
selections on the (value, date) spine; biweight weights evaluate as
one shared double expression from integer medians/MADs and each
weighted product e-3-quantizes per row before the correlation sums."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

_DAILY2_SQL = """
    daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS n_ord,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS ac
      FROM orders GROUP BY o_orderdate)
"""


def _daily2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ord"),
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v"),
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV CAST(count(*) AS BIGINT) AS BIGINT)"
        ).alias("ac"),
    )


@register(
    "robust_location_suite",
    f"""
    WITH {_DAILY2_SQL},
    r AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    q AS (
      SELECT max(CASE WHEN rk = CAST(ceil(0.25 * n) AS BIGINT) THEN v END)
               AS q1,
             max(CASE WHEN rk = CAST(ceil(0.50 * n) AS BIGINT) THEN v END)
               AS q2,
             max(CASE WHEN rk = CAST(ceil(0.75 * n) AS BIGINT) THEN v END)
               AS q3,
             max(CASE WHEN rk = CAST(ceil(1.0 / 3.0 * n) AS BIGINT) THEN v
                 END) AS t1,
             max(CASE WHEN rk = CAST(ceil(2.0 / 3.0 * n) AS BIGINT) THEN v
                 END) AS t2,
             CAST(sum(v) AS HUGEINT) AS s1, max(n) AS n
      FROM r)
    SELECT n AS n_days,
           round(CAST(s1 AS DOUBLE) / n, 2) AS mean_dollars,
           CAST(q2 AS BIGINT) AS median_dollars,
           round(0.3 * t1 + 0.4 * q2 + 0.3 * t2, 2) AS gastwirth_dollars,
           round((q1 + 2.0 * q2 + q3) / 4.0, 2) AS trimean_dollars,
           round((q1 + q3) / 2.0, 2) AS midhinge_dollars,
           round((CAST(s1 AS DOUBLE) / n - q2)
                 / ((q3 - q1) / 2.0), 6) + 0.0 AS mean_median_gap_iqr
    FROM q
    """,
    tags=("robust", "location", "suite"),
)
def q_robust_location_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five location estimates of daily revenue on one exact rank
    spine: mean, median, Gastwirth (0.3 T1 + 0.4 median + 0.3 T2 --
    the estimator with guaranteed 80%+ efficiency across symmetric
    distributions), Tukey's trimean (quartile-weighted), and the
    midhinge. Their SPREAD is the robustness story: on symmetric
    data all five coincide; the (mean - median)/half-IQR gap printed
    last is the standardized skew pull the mean suffers and the
    robust four do not."""
    daily = _daily2(spark, sf_dir)
    r = daily.select(
        "v",
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias(
            "rk"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    sel = {
        "q1": "0.25", "q2": "0.50", "q3": "0.75",
        "t1": "1.0 / 3.0", "t2": "2.0 / 3.0",
    }
    q = r.agg(
        *[
            F.max(
                F.when(
                    F.col("rk")
                    == F.expr(f"CAST(ceil({p} * n) AS BIGINT)"),
                    F.col("v"),
                )
            ).alias(name)
            for name, p in sel.items()
        ],
        F.sum("v").cast(_DEC).alias("s1"),
        F.max("n").alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    return q.select(
        F.col("n").alias("n_days"),
        F.round(mean, 2).alias("mean_dollars"),
        F.col("q2").cast("bigint").alias("median_dollars"),
        F.round(
            0.3 * F.col("t1") + 0.4 * F.col("q2") + 0.3 * F.col("t2"), 2
        ).alias("gastwirth_dollars"),
        F.round(
            (F.col("q1") + 2.0 * F.col("q2") + F.col("q3")) / 4.0, 2
        ).alias("trimean_dollars"),
        F.round((F.col("q1") + F.col("q3")) / 2.0, 2).alias(
            "midhinge_dollars"
        ),
        (
            F.round(
                (mean - F.col("q2"))
                / ((F.col("q3") - F.col("q1")) / 2.0),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_median_gap_iqr"),
    )


@register(
    "cpk_percentile_nonnormal",
    f"""
    WITH {_DAILY2_SQL},
    r AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    q AS (
      SELECT max(CASE WHEN rk = CAST(ceil(0.00135 * n) AS BIGINT) THEN v END)
               AS p_lo,
             max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN v END)
               AS p_med,
             max(CASE WHEN rk = CAST(ceil(0.99865 * n) AS BIGINT) THEN v END)
               AS p_hi,
             CAST(sum(v) AS HUGEINT) AS s1,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
             max(n) AS n
      FROM r),
    lim AS (
      -- spec limits: median +- 50% (a synthetic tolerance band wide
      -- enough to be meaningful at every SF)
      SELECT n, p_lo, p_med, p_hi, s1, s2,
             0.5 * p_med AS lsl, 1.5 * p_med AS usl
      FROM q)
    SELECT n AS n_days,
           CAST(p_lo AS BIGINT) AS p00135_dollars,
           CAST(p_hi AS BIGINT) AS p99865_dollars,
           round(least((usl - p_med) / (CAST(p_hi AS DOUBLE) - p_med),
                       (p_med - lsl) / (CAST(p_med AS DOUBLE) - p_lo)), 4)
             AS cpk_percentile,
           round(least((usl - CAST(s1 AS DOUBLE) / n)
                       / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n),
                       (CAST(s1 AS DOUBLE) / n - lsl)
                       / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n)),
                 4) AS cpk_normal,
           round(least((usl - p_med) / (CAST(p_hi AS DOUBLE) - p_med),
                       (p_med - lsl) / (CAST(p_med AS DOUBLE) - p_lo))
                 - least((usl - CAST(s1 AS DOUBLE) / n)
                       / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n),
                       (CAST(s1 AS DOUBLE) / n - lsl)
                       / (3.0 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n)),
                 4) + 0.0 AS percentile_minus_normal
    FROM lim
    """,
    tags=("spc", "capability", "nonnormal"),
)
def q_cpk_percentile_nonnormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO 22514 percentile-method capability for daily revenue
    against a median +-50% tolerance band: Cpk_percentile = min((USL -
    median)/(P99.865 - median), (median - LSL)/(median - P0.135)) --
    the 3-sigma half-spans replaced by the EMPIRICAL 0.135% tails, so
    skew and fat tails enter the index instead of violating it. The
    normal-theory Cpk prints beside it; their signed difference is
    the capability error the normal assumption would commit (negative
    = the normal formula flatters the process). Exact order
    statistics; exact integer moments."""
    daily = _daily2(spark, sf_dir)
    r = daily.select(
        "v",
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias(
            "rk"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    q = r.agg(
        *[
            F.max(
                F.when(
                    F.col("rk")
                    == F.expr(f"CAST(ceil({p} * n) AS BIGINT)"),
                    F.col("v"),
                )
            ).alias(name)
            for name, p in (
                ("p_lo", "0.00135"),
                ("p_med", "0.5"),
                ("p_hi", "0.99865"),
            )
        ],
        F.sum("v").cast(_DEC).alias("s1"),
        F.sum(F.col("v").cast(_DEC) * F.col("v")).cast(_DEC).alias("s2"),
        F.max("n").alias("n"),
    )
    lsl = 0.5 * F.col("p_med")
    usl = 1.5 * F.col("p_med")
    sig = (
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
        )
        / F.col("n")
    )
    mean = F.col("s1").cast("double") / F.col("n")
    cpk_p = F.least(
        (usl - F.col("p_med"))
        / (F.col("p_hi").cast("double") - F.col("p_med")),
        (F.col("p_med") - lsl)
        / (F.col("p_med").cast("double") - F.col("p_lo")),
    )
    cpk_n = F.least(
        (usl - mean) / (3.0 * sig), (mean - lsl) / (3.0 * sig)
    )
    return q.select(
        F.col("n").alias("n_days"),
        F.col("p_lo").cast("bigint").alias("p00135_dollars"),
        F.col("p_hi").cast("bigint").alias("p99865_dollars"),
        F.round(cpk_p, 4).alias("cpk_percentile"),
        F.round(cpk_n, 4).alias("cpk_normal"),
        (F.round(cpk_p - cpk_n, 4) + F.lit(0.0)).alias(
            "percentile_minus_normal"
        ),
    )


@register(
    "biweight_midcorrelation",
    f"""
    WITH {_DAILY2_SQL},
    rx AS (
      SELECT v, ac, d,
             CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rkx,
             CAST(row_number() OVER (ORDER BY ac, d) AS BIGINT) AS rky,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    med AS (
      SELECT max(CASE WHEN rkx = CAST(ceil(0.5 * n) AS BIGINT) THEN v END)
               AS mx,
             max(CASE WHEN rky = CAST(ceil(0.5 * n) AS BIGINT) THEN ac
                 END) AS my,
             max(n) AS n
      FROM rx),
    ad AS (
      SELECT r2.d, r2.v, r2.ac, m.mx, m.my, m.n,
             abs(r2.v - m.mx) AS adx, abs(r2.ac - m.my) AS ady
      FROM rx r2 CROSS JOIN med m),
    madr AS (
      SELECT d, v, ac, mx, my, n, adx, ady,
             CAST(row_number() OVER (ORDER BY adx, d) AS BIGINT) AS rax,
             CAST(row_number() OVER (ORDER BY ady, d) AS BIGINT) AS ray
      FROM ad),
    mads AS (
      SELECT max(CASE WHEN rax = CAST(ceil(0.5 * n) AS BIGINT) THEN adx END)
               AS madx,
             max(CASE WHEN ray = CAST(ceil(0.5 * n) AS BIGINT) THEN ady END)
               AS mady
      FROM madr),
    wz AS (
      SELECT (CAST(a.v AS DOUBLE) - a.mx) / (9.0 * s.madx) AS ux,
             (CAST(a.ac AS DOUBLE) - a.my) / (9.0 * s.mady) AS uy,
             CAST(a.v AS DOUBLE) - a.mx AS dx,
             CAST(a.ac AS DOUBLE) - a.my AS dy
      FROM ad a CROSS JOIN mads s),
    terms AS (
      SELECT CASE WHEN abs(ux) < 1.0 THEN
               dx * (1.0 - ux * ux) * (1.0 - ux * ux) ELSE 0.0 END AS ax,
             CASE WHEN abs(uy) < 1.0 THEN
               dy * (1.0 - uy * uy) * (1.0 - uy * uy) ELSE 0.0 END AS ay
      FROM wz),
    qs AS (
      SELECT CAST(sum(CAST(floor(ax * ay * 1e-3 + 0.5) AS BIGINT))
                  AS HUGEINT) AS sxy_em3,
             CAST(sum(CAST(floor(ax * ax * 1e-3 + 0.5) AS BIGINT))
                  AS HUGEINT) AS sxx_em3,
             CAST(sum(CAST(floor(ay * ay * 1e-3 + 0.5) AS BIGINT))
                  AS HUGEINT) AS syy_em3,
             CAST(count(*) AS BIGINT) AS n
      FROM terms)
    SELECT n AS n_days,
           round(CAST(sxy_em3 AS DOUBLE)
                 / sqrt(CAST(sxx_em3 AS DOUBLE)
                        * CAST(syy_em3 AS DOUBLE)), 6) + 0.0
             AS bicor_ticket_revenue
    FROM qs
    """,
    tags=("robust", "correlation", "biweight"),
)
def q_biweight_midcorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biweight midcorrelation between daily average ticket size
    (order value in cents) and daily revenue: deviations weighted by
    Tukey's biweight (1 - u^2)^2 with u = (x - median)/(9 MAD), so
    days beyond 9 MADs get exactly zero weight and outliers cannot
    manufacture or destroy the correlation the way they do Pearson's.
    The ticket column (not raw order COUNT) keeps the y-MAD strictly
    positive at every SF -- at tiny SF most days hold the same count
    and a count-MAD degenerates to 0. Medians and MADs are exact
    order statistics; weighted products e-3-quantize per row before
    the sums. The bivariate completion of biweight_midvariance."""
    daily = _daily2(spark, sf_dir)
    rx = daily.select(
        "d",
        "v",
        "ac",
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias(
            "rkx"
        ),
        F.row_number()
        .over(Window.orderBy("ac", "d"))
        .cast("bigint")
        .alias("rky"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    med = rx.agg(
        F.max(
            F.when(
                F.col("rkx") == F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                F.col("v"),
            )
        ).alias("mx"),
        F.max(
            F.when(
                F.col("rky") == F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                F.col("ac"),
            )
        ).alias("my"),
    )
    ad = rx.crossJoin(F.broadcast(med)).select(
        "d",
        "v",
        "ac",
        "mx",
        "my",
        F.col("n"),
        F.abs(F.col("v") - F.col("mx")).alias("adx"),
        F.abs(F.col("ac") - F.col("my")).alias("ady"),
    )
    madr = ad.select(
        "*",
        F.row_number()
        .over(Window.orderBy("adx", "d"))
        .cast("bigint")
        .alias("rax"),
        F.row_number()
        .over(Window.orderBy("ady", "d"))
        .cast("bigint")
        .alias("ray"),
    )
    mads = madr.agg(
        F.max(
            F.when(
                F.col("rax") == F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                F.col("adx"),
            )
        ).alias("madx"),
        F.max(
            F.when(
                F.col("ray") == F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                F.col("ady"),
            )
        ).alias("mady"),
    )
    wz = ad.crossJoin(F.broadcast(mads)).select(
        (
            (F.col("v").cast("double") - F.col("mx"))
            / (9.0 * F.col("madx"))
        ).alias("ux"),
        (
            (F.col("ac").cast("double") - F.col("my"))
            / (9.0 * F.col("mady"))
        ).alias("uy"),
        (F.col("v").cast("double") - F.col("mx")).alias("dx"),
        (F.col("ac").cast("double") - F.col("my")).alias("dy"),
    )
    ax = F.when(
        F.abs(F.col("ux")) < 1.0,
        F.col("dx")
        * (1.0 - F.col("ux") * F.col("ux"))
        * (1.0 - F.col("ux") * F.col("ux")),
    ).otherwise(0.0)
    ay = F.when(
        F.abs(F.col("uy")) < 1.0,
        F.col("dy")
        * (1.0 - F.col("uy") * F.col("uy"))
        * (1.0 - F.col("uy") * F.col("uy")),
    ).otherwise(0.0)
    terms = wz.select(ax.alias("ax"), ay.alias("ay"))
    qs = terms.agg(
        F.sum(
            F.floor(F.col("ax") * F.col("ay") * 1e-3 + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("sxy_em3"),
        F.sum(
            F.floor(F.col("ax") * F.col("ax") * 1e-3 + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("sxx_em3"),
        F.sum(
            F.floor(F.col("ay") * F.col("ay") * 1e-3 + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("syy_em3"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return qs.select(
        F.col("n").alias("n_days"),
        (
            F.round(
                F.col("sxy_em3").cast("double")
                / F.sqrt(
                    F.col("sxx_em3").cast("double")
                    * F.col("syy_em3").cast("double")
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("bicor_ticket_revenue"),
    )
