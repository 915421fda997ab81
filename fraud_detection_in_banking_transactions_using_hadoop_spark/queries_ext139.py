"""Extension batch 139 (round 6): small-sample interval inference via
the Wilson-Hilferty chi-square quantile (Garwood-style exact Poisson
rate CIs per event type, a two-sided normal tolerance interval for
daily revenue) and sample entropy (the regularity statistic behind
physiological/fraud burst monitors -- complements permutation_entropy,
which sees only ordinal patterns, with an amplitude-aware template
match).

Cross-engine discipline:
- Normal quantiles enter as PYTHON-SIDE LITERALS embedded identically
  in both SQL texts (the Holm/ext132 trick); the Wilson-Hilferty cube
  chi2_p(df) ~ df*(1 - 2/(9df) + z_p*sqrt(2/(9df)))^3 is then a pure
  double expression over exact integer df.
- sample_entropy_daily: the match radius r is an exact BIGINT
  (floor of 0.2*population sd from integer moments), so every
  template comparison is integer-vs-integer and the A/B counts are
  exact; SampEn = -ln(A/B) is one double log.

Scale notes (the 100 TB story):
- garwood_poisson_ci / normal_tolerance_interval: one aggregation
  each (per-type counts / integer revenue moments), then scalar
  double math -- nothing grows with rows.
- sample_entropy_daily: the template pair join is |days|^2/2, a
  CALENDAR-bounded constant (the hoeffding_d_daily precedent), never
  a fact-table pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# python-side normal quantile literals (statistics.NormalDist), shared
# verbatim by both engines
_Z_025 = -1.9599639845400538
_Z_975 = 1.9599639845400536
_Z_995 = 2.5758293035489
_Z_05 = -1.6448536269514726


def _wh_chi2(z: float, df: str) -> str:
    """Wilson-Hilferty chi-square quantile as shared SQL text:
    df * (1 - 2/(9 df) + z * sqrt(2/(9 df)))^3 over integer df."""
    d = f"CAST({df} AS DOUBLE)"
    core = f"(1.0 - 2.0 / (9.0 * {d}) + {z!r} * sqrt(2.0 / (9.0 * {d})))"
    return f"({d} * {core} * {core} * {core})"


@register(
    "garwood_poisson_ci",
    f"""
    WITH days_t AS (
      SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
      FROM events),
    k_t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY event_type)
    SELECT k.event_type, k.k AS n_events, d.n_days,
           round(CAST(k.k AS DOUBLE) / d.n_days, 6) AS rate_per_day,
           round({_wh_chi2(_Z_025, "2 * k.k")} / 2.0 / d.n_days, 6)
             AS rate_lo_95,
           round({_wh_chi2(_Z_975, "2 * k.k + 2")} / 2.0 / d.n_days, 6)
             AS rate_hi_95
    FROM k_t k CROSS JOIN days_t d
    ORDER BY k.event_type
    """,
    tags=("stats", "inference", "poisson"),
)
def q_garwood_poisson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Garwood-style 95% CI for each event type's daily rate: the
    exact Poisson bounds chi2(0.025, 2k)/2 and chi2(0.975, 2k+2)/2
    evaluated through the Wilson-Hilferty cube (relative error < 1e-3
    for k >= 5, conservative like the exact interval). Per-type counts
    are one aggregation; the quantile math is scalar doubles over the
    exact integer k."""
    events = read_table(spark, sf_dir, "events")
    days_t = events.agg(
        F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias("n_days")
    )
    k_t = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    j = k_t.crossJoin(F.broadcast(days_t))
    return j.select(
        "event_type",
        F.col("k").alias("n_events"),
        "n_days",
        F.round(F.col("k").cast("double") / F.col("n_days"), 6).alias(
            "rate_per_day"
        ),
        F.round(
            F.expr(_wh_chi2(_Z_025, "2 * k")) / 2.0 / F.col("n_days"), 6
        ).alias("rate_lo_95"),
        F.round(
            F.expr(_wh_chi2(_Z_975, "2 * k + 2")) / 2.0 / F.col("n_days"), 6
        ).alias("rate_hi_95"),
    ).orderBy("event_type")


@register(
    "normal_tolerance_interval",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
      FROM daily)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2)
             AS mean_dollars,
           round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)) / 100.0, 2)
             AS sd_dollars,
           round({_Z_995!r} * sqrt(CAST(n - 1 AS DOUBLE) * (1.0 + 1.0 / n)
                 / {_wh_chi2(_Z_05, "n - 1")}), 6) AS k2_factor,
           round((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  - {_Z_995!r} * sqrt(CAST(n - 1 AS DOUBLE) * (1.0 + 1.0 / n)
                    / {_wh_chi2(_Z_05, "n - 1")})
                    * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)))
                 / 100.0, 2) AS tol_lo_dollars,
           round((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                  + {_Z_995!r} * sqrt(CAST(n - 1 AS DOUBLE) * (1.0 + 1.0 / n)
                    / {_wh_chi2(_Z_05, "n - 1")})
                    * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)))
                 / 100.0, 2) AS tol_hi_dollars
    FROM mom
    """,
    tags=("stats", "inference", "quality"),
)
def q_normal_tolerance_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided normal tolerance interval for daily revenue covering
    99% of days with 95% confidence (Howe's method): mean +/- k2*s
    with k2 = z_.995 * sqrt(df*(1 + 1/n)/chi2(0.05, df)). Unlike a
    confidence interval (which shrinks with n), this bounds the days
    themselves -- the SLA-setting primitive. Exact integer moments;
    the chi-square quantile is the shared Wilson-Hilferty text with
    the z literals embedded identically in both engines."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("cents").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("cents").cast(_DEC) * F.col("cents")).cast(_DEC).alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / F.col("n").cast("double")
        / (F.col("n") - 1).cast("double")
    )
    k2 = F.lit(_Z_995) * F.sqrt(
        (F.col("n") - 1).cast("double")
        * (1.0 + 1.0 / F.col("n").cast("double"))
        / F.expr(_wh_chi2(_Z_05, "n - 1"))
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(mean / 100.0, 2).alias("mean_dollars"),
        F.round(sd / 100.0, 2).alias("sd_dollars"),
        F.round(k2, 6).alias("k2_factor"),
        F.round((mean - k2 * sd) / 100.0, 2).alias("tol_lo_dollars"),
        F.round((mean + k2 * sd) / 100.0, 2).alias("tol_hi_dollars"),
    )


@register(
    "sample_entropy_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, cents,
             lead(cents, 1) OVER (ORDER BY d) AS x1,
             lead(cents, 2) OVER (ORDER BY d) AS x2
      FROM daily),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
      FROM daily),
    r_t AS (
      SELECT CAST(floor(0.2 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        / CAST(n AS DOUBLE)) AS BIGINT) AS r
      FROM mom),
    tpl AS (
      SELECT rn, cents, x1, x2 FROM s WHERE x2 IS NOT NULL),
    pairs AS (
      SELECT CAST(sum(CASE WHEN abs(a.cents - b.cents) <= r.r
                            AND abs(a.x1 - b.x1) <= r.r
                       THEN 1 ELSE 0 END) AS BIGINT) AS b_m,
             CAST(sum(CASE WHEN abs(a.cents - b.cents) <= r.r
                            AND abs(a.x1 - b.x1) <= r.r
                            AND abs(a.x2 - b.x2) <= r.r
                       THEN 1 ELSE 0 END) AS BIGINT) AS a_m
      FROM tpl a JOIN tpl b ON a.rn < b.rn CROSS JOIN r_t r)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           (SELECT r FROM r_t) AS r_cents,
           p.b_m AS template_matches_m2,
           p.a_m AS template_matches_m3,
           round(-ln(CAST(p.a_m AS DOUBLE) / p.b_m), 6) AS sample_entropy
    FROM pairs p
    """,
    tags=("timeseries", "complexity", "exact-arith"),
)
def q_sample_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (m=2, r=0.2*sd) of daily revenue: the negative
    log of the conditional probability that two days matching for 2
    consecutive values (Chebyshev distance <= r) still match at the
    3rd. Low SampEn = repetitive dynamics; high = irregular. The
    radius is an exact integer from the population-sd moments, every
    comparison is integer-vs-integer, and the pair join is the
    calendar-bounded |days|^2/2 template join (allowlisted like
    hoeffding_d_daily) -- never a fact-table pair join."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d")
    s = daily.select(
        F.row_number().over(w).cast("bigint").alias("rn"),
        "cents",
        F.lead("cents", 1).over(w).alias("x1"),
        F.lead("cents", 2).over(w).alias("x2"),
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("cents").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("cents").cast(_DEC) * F.col("cents")).cast(_DEC).alias("sxx"),
    )
    r_t = mom.select(
        F.floor(
            0.2
            * F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
            )
            / F.col("n").cast("double")
        )
        .cast("bigint")
        .alias("r")
    )
    tpl = s.where(F.col("x2").isNotNull())
    a = tpl.alias("a")
    b = tpl.alias("b")
    m2 = (
        (F.abs(F.col("a.cents") - F.col("b.cents")) <= F.col("r"))
        & (F.abs(F.col("a.x1") - F.col("b.x1")) <= F.col("r"))
    )
    m3 = m2 & (F.abs(F.col("a.x2") - F.col("b.x2")) <= F.col("r"))
    pairs = (
        a.join(b, F.col("a.rn") < F.col("b.rn"))
        .crossJoin(F.broadcast(r_t))
        .agg(
            F.sum(F.when(m2, 1).otherwise(0)).cast("bigint").alias("b_m"),
            F.sum(F.when(m3, 1).otherwise(0)).cast("bigint").alias("a_m"),
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        pairs.crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(r_t))
        .select(
            "n_days",
            F.col("r").alias("r_cents"),
            F.col("b_m").alias("template_matches_m2"),
            F.col("a_m").alias("template_matches_m3"),
            F.round(
                -F.log(F.col("a_m").cast("double") / F.col("b_m")), 6
            ).alias("sample_entropy"),
        )
    )
