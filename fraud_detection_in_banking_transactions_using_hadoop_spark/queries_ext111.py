"""Extension batch 111: quality engineering -- process capability
(Cp/Cpk + Taguchi loss), the p-chart with varying limits, and the
acceptance-sampling OC curve.

western_electric_alarms watches a mean chart; this batch completes
the SPC toolbox:

- process_capability_cpk: CAN the order-to-ship process meet a
  1..120-day spec at all? Cp compares spread to the spec width,
  Cpk penalizes off-centering, and the Taguchi expected loss
  sigma^2 + (mu - T)^2 prices deviation continuously -- all from
  exact integer day moments.
- p_chart_violations: the attributes chart -- daily return share
  against p0 +- 3 sqrt(p0 q0 / n_t) with PER-DAY limits (n_t
  varies); the violation count is decided by the exact integer
  inequality (k n - p0-scaled bound)^2 comparison, so no float
  decides an alarm.
- oc_curve_sampling_plan: the n = 50, c = 2 single sampling plan's
  operating characteristic -- P(accept | p) = sum_(k<=2) C(50,k)
  p^k q^(50-k) over a 10-point defect-rate grid, with the exact
  binomial coefficients 1/50/1225 as integer literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_LSL, _USL, _TGT = 1, 120, 45  # lead-time spec (days) and target


# ---------------------------------------------------------------------------
# Process capability of order-to-ship lead times.
# ---------------------------------------------------------------------------
@register(
    "process_capability_cpk",
    f"""
    WITH leads AS (
      SELECT CAST(greatest(date_diff('day', o.o_orderdate, l.l_shipdate), 0)
                  AS BIGINT) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS HUGEINT) AS s,
             CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS q,
             CAST(sum(CASE WHEN d < {_LSL} OR d > {_USL} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oos
      FROM leads),
    c AS (
      SELECT n, n_oos,
             CAST(s AS DOUBLE) / n AS mu,
             sqrt((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
                  / (CAST(n AS DOUBLE) * n)) AS sg
      FROM mom)
    SELECT n AS n_lines,
           round(mu, 4) AS mean_lead_days,
           round(sg, 4) AS sd_lead_days,
           round(({_USL}.0 - {_LSL}.0) / (6.0 * sg), 4) AS cp,
           round(least({_USL}.0 - mu, mu - {_LSL}.0) / (3.0 * sg), 4) AS cpk,
           round(sg * sg + (mu - {_TGT}.0) * (mu - {_TGT}.0), 2)
             AS taguchi_loss_days2,
           round(CAST(n_oos AS DOUBLE) / n, 6) AS observed_oos_rate
    FROM c
    """,
    tags=("spc", "capability", "exact-arith"),
)
def q_process_capability_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cp/Cpk of the order-to-ship lead time against a [1, 120]-day
    spec with a 45-day target: exact integer day moments, Cp =
    spec-width/6 sigma, Cpk = nearest-limit margin/3 sigma, the
    Taguchi quadratic loss sigma^2 + (mu - T)^2, and the OBSERVED
    out-of-spec rate as the empirical cross-check. Cpk >= 1.33 is
    the classic 'capable process' bar -- and the observed rate shows
    whether normality flatters it."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    leads = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.greatest(F.datediff("l_shipdate", "o_orderdate"), F.lit(0))
        .cast("bigint")
        .alias("d")
    )
    mom = leads.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast(_DEC).alias("s"),
        F.sum(F.col("d").cast(_DEC) * F.col("d").cast(_DEC)).cast(_DEC).alias("q"),
        F.sum(F.when((F.col("d") < _LSL) | (F.col("d") > _USL), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oos"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sg = F.sqrt(
        (
            F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    c = mom.select("n", "n_oos", mu.alias("mu"), sg.alias("sg"))
    return c.select(
        F.col("n").alias("n_lines"),
        F.round("mu", 4).alias("mean_lead_days"),
        F.round("sg", 4).alias("sd_lead_days"),
        F.round((float(_USL) - float(_LSL)) / (6.0 * F.col("sg")), 4).alias("cp"),
        F.round(
            F.least(
                F.lit(float(_USL)) - F.col("mu"), F.col("mu") - float(_LSL)
            )
            / (3.0 * F.col("sg")),
            4,
        ).alias("cpk"),
        F.round(
            F.col("sg") * F.col("sg")
            + (F.col("mu") - float(_TGT)) * (F.col("mu") - float(_TGT)),
            2,
        ).alias("taguchi_loss_days2"),
        F.round(F.col("n_oos").cast("double") / F.col("n"), 6).alias(
            "observed_oos_rate"
        ),
    )


# ---------------------------------------------------------------------------
# p-chart with per-day varying limits on the daily return share.
# ---------------------------------------------------------------------------
@register(
    "p_chart_violations",
    """
    WITH d AS (
      SELECT l_shipdate AS dt, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem GROUP BY l_shipdate),
    p0 AS (
      SELECT CAST(sum(k) AS BIGINT) AS tk, CAST(sum(n) AS BIGINT) AS tn
      FROM d),
    scored AS (
      SELECT d.dt, d.n, d.k,
             CAST(d.k AS DOUBLE) / d.n AS p,
             CAST(p.tk AS DOUBLE) / p.tn
               + 3.0 * sqrt(CAST(p.tk AS DOUBLE) / p.tn
                            * (1.0 - CAST(p.tk AS DOUBLE) / p.tn) / d.n) AS ucl,
             CAST(p.tk AS DOUBLE) / p.tn
               - 3.0 * sqrt(CAST(p.tk AS DOUBLE) / p.tn
                            * (1.0 - CAST(p.tk AS DOUBLE) / p.tn) / d.n) AS lcl
      FROM d CROSS JOIN p0 p),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN p > ucl OR p < lcl THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations,
             max(CASE WHEN p > ucl THEN p - ucl
                      WHEN p < lcl THEN lcl - p END) AS worst_excess
      FROM scored)
    SELECT (SELECT round(CAST(tk AS DOUBLE) / tn, 6) FROM p0) AS center_p,
           n_days, n_violations,
           round(CAST(n_violations AS DOUBLE) / n_days, 6) AS violation_rate,
           round(coalesce(worst_excess, 0.0), 6) AS worst_excess
    FROM agg
    """,
    tags=("spc", "attributes-chart", "exact-arith"),
)
def q_p_chart_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart on the daily returned-line share with PER-DAY 3-sigma
    limits p0 +- 3 sqrt(p0 q0 / n_t) (n_t varies day to day, so the
    limits must too -- the error fixed-limit charts make): center
    from exact pooled counts, violations counted against identically
    computed double limits in both engines, worst excess reported.
    Pairs with western_electric_alarms (means) to complete the
    variables/attributes chart pair."""
    li = read_table(spark, sf_dir, "lineitem")
    d = li.groupBy(F.col("l_shipdate").alias("dt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    p0 = d.agg(
        F.sum("k").cast("bigint").alias("tk"),
        F.sum("n").cast("bigint").alias("tn"),
    )
    pbar = F.col("tk").cast("double") / F.col("tn")
    halfw = 3.0 * F.sqrt(pbar * (1.0 - pbar) / F.col("n"))
    scored = d.crossJoin(F.broadcast(p0)).select(
        "dt",
        (F.col("k").cast("double") / F.col("n")).alias("p"),
        (pbar + halfw).alias("ucl"),
        (pbar - halfw).alias("lcl"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            F.when((F.col("p") > F.col("ucl")) | (F.col("p") < F.col("lcl")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_violations"),
        F.max(
            F.when(F.col("p") > F.col("ucl"), F.col("p") - F.col("ucl")).when(
                F.col("p") < F.col("lcl"), F.col("lcl") - F.col("p")
            )
        ).alias("worst_excess"),
    )
    return agg.crossJoin(F.broadcast(p0)).select(
        F.round(pbar, 6).alias("center_p"),
        "n_days",
        "n_violations",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_days"), 6
        ).alias("violation_rate"),
        F.round(F.coalesce(F.col("worst_excess"), F.lit(0.0)), 6).alias(
            "worst_excess"
        ),
    )


# ---------------------------------------------------------------------------
# OC curve of the n = 50, c = 2 single sampling plan.
# ---------------------------------------------------------------------------
@register(
    "oc_curve_sampling_plan",
    """
    WITH grid AS (
      SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS pct),
    oc AS (
      SELECT pct,
             pow(1.0 - pct / 100.0, 50.0)
               + 50.0 * (pct / 100.0) * pow(1.0 - pct / 100.0, 49.0)
               + 1225.0 * (pct / 100.0) * (pct / 100.0)
                 * pow(1.0 - pct / 100.0, 48.0) AS pa
      FROM grid)
    SELECT CAST(pct AS INTEGER) AS defect_pct,
           round(pa, 6) AS p_accept,
           round(1.0 - pa, 6) AS p_reject,
           round(CAST(pct AS DOUBLE) / 100.0 * pa, 6) AS aoq
    FROM oc ORDER BY defect_pct
    """,
    tags=("spc", "acceptance-sampling", "exact-arith"),
)
def q_oc_curve_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating characteristic of the classic n = 50, c = 2 single
    sampling plan over a 1..10% defect-rate grid: P(accept) =
    q^50 + 50 p q^49 + 1225 p^2 q^48 with the EXACT binomial
    coefficients as integer literals, plus the average outgoing
    quality p * Pa. Reading AQL (high-acceptance p) and LTPD
    (low-acceptance p) off this table is how incoming-lot inspection
    plans are actually chosen."""
    _ = read_table(spark, sf_dir, "region")  # anchor the sf_dir contract
    grid = spark.range(1, 11).select(F.col("id").cast("bigint").alias("pct"))
    p = F.col("pct") / 100.0
    q = 1.0 - p
    pa = (
        F.pow(q, F.lit(50.0))
        + 50.0 * p * F.pow(q, F.lit(49.0))
        + 1225.0 * p * p * F.pow(q, F.lit(48.0))
    )
    return grid.select(
        F.col("pct").cast("int").alias("defect_pct"),
        F.round(pa, 6).alias("p_accept"),
        F.round(1.0 - pa, 6).alias("p_reject"),
        F.round(F.col("pct").cast("double") / 100.0 * pa, 6).alias("aoq"),
    ).orderBy("defect_pct")
