"""Extension batch 71: Taylor's power law, Allan variance, and
restricted mean survival time.

Scale notes (the 100 TB story per query):
- taylors_power_law: the variance-mean scaling law across parts
  (Taylor's law: var ~ a * mean^b; b near 1 = Poisson-like demand,
  b near 2 = clustered). Per-part integer moments -> per-part
  (ln mean, ln var) terms rounded to e6 integers BEFORE the cross-part
  OLS sums (order-free; ~|parts| groups), one closing slope division.
- allan_variance: the clock-stability metric on event interarrival
  gaps -- AVAR(m) = mean of squared adjacent m-block-mean differences
  over 2. Block means come from exact integer gap sums (micros);
  adjacency is a distributed equi-join on block index (never a global
  window over the gap series); per-tau terms round to integers before
  the order-free sum.
- mean_residual_life: the scalar summary of the KM curve -- RMST =
  integral of S(t) over the observed horizon, computed from the same
  risk-set machinery as kaplan_meier_survival (cumulative e8-int log
  terms over the |distinct event days| spine, CALENDAR class), then
  one weighted sum of step widths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_ALLAN_MS = (4, 16, 64)


# ---------------------------------------------------------------------------
# Taylor's power law across parts.
# ---------------------------------------------------------------------------
@register(
    "taylors_power_law",
    """
    WITH per_part AS (
      SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s2
      FROM lineitem GROUP BY l_partkey
      HAVING count(*) >= 5),
    lt AS (
      SELECT CAST(round(1e6 * ln(CAST(s1 AS DOUBLE) / n), 0) AS BIGINT) AS lx,
             CAST(round(1e6 * ln((CAST(n AS DOUBLE) * s2
                        - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(n AS DOUBLE) * n)), 0) AS BIGINT) AS ly
      FROM per_part
      WHERE CAST(n AS HUGEINT) * s2 > CAST(s1 AS HUGEINT) * s1),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(lx) AS HUGEINT) AS sx, CAST(sum(ly) AS HUGEINT) AS sy,
             CAST(sum(CAST(lx AS HUGEINT) * ly) AS HUGEINT) AS sxy,
             CAST(sum(CAST(lx AS HUGEINT) * lx) AS HUGEINT) AS sxx
      FROM lt)
    SELECT k AS n_parts,
           round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS taylor_b,
           round((CAST(sy AS DOUBLE) - ((CAST(k AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * sy)
                   / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                  * sx) / k / 1e6, 6) AS ln_a
    FROM sums
    """,
    tags=("stats", "scaling-law", "exact-arith"),
)
def q_taylors_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is part demand Poisson-like (b~1) or clustered (b~2)? Per-part
    quantity mean and population variance from exact integer moments;
    each part contributes (ln mean, ln var) rounded to e6 integers, so
    the cross-part OLS sums are order-free; slope b and intercept ln a
    close in one expression. Degenerate zero-variance parts drop via
    the exact integer guard n*s2 > s1^2."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("s1"),
            F.sum(
                F.col("l_quantity").cast("bigint") * F.col("l_quantity").cast("bigint")
            )
            .cast("bigint")
            .alias("s2"),
        )
        .where(F.col("n") >= 5)
    )
    nd = F.col("n").cast("double")
    var = (nd * F.col("s2") - F.col("s1").cast("double") * F.col("s1")) / (nd * nd)
    lt = per_part.where(
        F.col("n").cast(_DEC) * F.col("s2") > F.col("s1").cast(_DEC) * F.col("s1")
    ).select(
        F.round(F.lit(1e6) * F.log(F.col("s1").cast("double") / nd), 0)
        .cast("bigint")
        .alias("lx"),
        F.round(F.lit(1e6) * F.log(var), 0).cast("bigint").alias("ly"),
    )
    sums = lt.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("lx").cast(_DEC).alias("sx"),
        F.sum("ly").cast(_DEC).alias("sy"),
        F.sum(F.col("lx").cast(_DEC) * F.col("ly").cast(_DEC)).cast(_DEC).alias("sxy"),
        F.sum(F.col("lx").cast(_DEC) * F.col("lx").cast(_DEC)).cast(_DEC).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    b = (kd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        kd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    ln_a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / kd / 1e6
    return sums.select(
        F.col("k").alias("n_parts"),
        F.round(b, 6).alias("taylor_b"),
        F.round(ln_a, 6).alias("ln_a"),
    )


# ---------------------------------------------------------------------------
# Allan variance of event interarrival gaps.
# ---------------------------------------------------------------------------
@register(
    "allan_variance",
    f"""
    WITH seq AS (
      SELECT epoch_us(ts) AS us,
             CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) - 1 AS i
      FROM events),
    gaps AS (
      SELECT a.i, CAST(b.us - a.us AS BIGINT) AS gap_us
      FROM seq a JOIN seq b ON b.i = a.i + 1),
    ms AS (SELECT unnest(ARRAY{list(_ALLAN_MS)}) AS m),
    blocks AS (
      SELECT ms.m, g.i // ms.m AS blk,
             CAST(count(*) AS BIGINT) AS bn,
             CAST(sum(gap_us) AS HUGEINT) AS bsum
      FROM gaps g CROSS JOIN ms
      GROUP BY ms.m, g.i // ms.m
      HAVING count(*) = ms.m),
    diffs AS (
      SELECT a.m,
             CAST(round(pow((CAST(b.bsum AS DOUBLE) - a.bsum) / a.m / 1000.0, 2), 0)
                  AS BIGINT) AS d2_ms
      FROM blocks a JOIN blocks b ON b.m = a.m AND b.blk = a.blk + 1)
    SELECT CAST(m AS INTEGER) AS m_gaps,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((10 * sum(d2_ms)) // (2 * count(*)) AS DOUBLE) / 10.0 AS avar_ms2,
           round(sqrt(CAST(sum(d2_ms) AS DOUBLE) / (2.0 * count(*))), 6)
             AS adev_ms
    FROM diffs GROUP BY m
    """,
    tags=("timeseries", "stability", "exact-arith"),
)
def q_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How stable is the event arrival cadence across averaging scales?
    Allan variance over interarrival gaps: m-gap block means from exact
    integer micro sums, squared adjacent-block differences (the
    distributed equi-join on block index -- never a series-wide lag
    window), each term rounded to an integer ms^2 before the order-free
    sum. White-noise cadence halves AVAR per 4x m; drifting cadence
    does not -- the diagnostic is the m-profile. avar is reported as
    the EXACT floor((10 S)/(2 n))/10 (one decimal): round(x, 6) on a
    ~4e11 double multiplies past 2^53 in DuckDB and drifts by 1e-4."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank

    ev = read_table(spark, sf_dir, "events")
    # the gap sequence needs a GLOBAL event order over the fact table:
    # that's exactly with_global_rank's job (two-level plan; never a
    # single-task window over all events)
    seq = with_global_rank(
        ev.select(F.unix_micros("ts").alias("us"), "event_id"),
        "us",
        [F.col("us"), F.col("event_id")],
        rank_col="rk",
    ).select("us", (F.col("rk") - 1).cast("bigint").alias("i"))
    nxt = seq.select((F.col("i") - 1).alias("i"), F.col("us").alias("us_next"))
    gaps = seq.join(nxt, "i").select(
        "i", (F.col("us_next") - F.col("us")).cast("bigint").alias("gap_us")
    )
    ms = F.explode(F.array(*[F.lit(m) for m in _ALLAN_MS])).alias("m")
    blocks = (
        gaps.select("*", ms)
        .groupBy("m", F.expr("i DIV m").alias("blk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("bn"),
            F.sum("gap_us").cast(_DEC).alias("bsum"),
        )
        .where(F.col("bn") == F.col("m"))
    )
    nxt_b = blocks.select(
        F.col("m").alias("m2"),
        (F.col("blk") - 1).alias("blk"),
        F.col("bsum").alias("bsum_next"),
    )
    diffs = blocks.join(
        nxt_b, (F.col("m") == F.col("m2")) & (blocks.blk == nxt_b.blk)
    ).select(
        "m",
        F.round(
            F.pow(
                (F.col("bsum_next").cast("double") - F.col("bsum").cast("double"))
                / F.col("m")
                / 1000.0,
                F.lit(2.0),
            ),
            0,
        )
        .cast("bigint")
        .alias("d2_ms"),
    )
    return diffs.groupBy(F.col("m").cast("int").alias("m_gaps")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            F.expr("CAST((10 * sum(d2_ms)) DIV (2 * count(1)) AS DOUBLE)") / 10.0
        ).alias("avar_ms2"),
        F.round(
            F.sqrt(F.sum("d2_ms").cast("double") / (2.0 * F.count(F.lit(1)))), 6
        ).alias("adev_ms"),
    )


# ---------------------------------------------------------------------------
# Restricted mean survival time from the KM curve.
# ---------------------------------------------------------------------------
@register(
    "mean_residual_life",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CAST(ts AS DATE)) AS first_day,
             max(CAST(ts AS DATE)) AS last_day,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
               AS p_day
      FROM events GROUP BY user_id),
    obs AS (
      SELECT CASE WHEN p_day IS NOT NULL
                  THEN date_diff('day', first_day, p_day)
                  ELSE date_diff('day', first_day, last_day) END AS t,
             CASE WHEN p_day IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user),
    horizon AS (SELECT CAST(max(t) AS BIGINT) AS tau FROM obs),
    allt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS ending,
             CAST(sum(ev) AS BIGINT) AS d
      FROM obs GROUP BY t),
    risk AS (
      SELECT t, d,
             (SELECT CAST(count(*) AS BIGINT) FROM obs) -
             coalesce(sum(ending) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM allt),
    steps AS (
      SELECT t, d, n_risk,
             CASE WHEN d < n_risk
                  THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e8, 0)
                            AS BIGINT) ELSE NULL END AS le8,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS died_out
      FROM risk WHERE d > 0),
    surv AS (
      SELECT t,
             CASE WHEN max(died_out) OVER (ORDER BY t) = 1 THEN 0.0
                  ELSE round(exp(CAST(sum(le8) OVER (ORDER BY t) AS DOUBLE)
                                 / 1e8), 6) END AS s,
             lead(t) OVER (ORDER BY t) AS t_next
      FROM steps),
    pieces AS (
      SELECT CAST(min(t) AS BIGINT) AS first_event_day,
             sum(s * (coalesce(t_next, h.tau) - t)) AS area_after_first
      FROM surv CROSS JOIN horizon h
      GROUP BY h.tau)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM obs) AS n_users,
           (SELECT tau FROM horizon) AS horizon_days,
           round(first_event_day + area_after_first, 6) AS rmst_days
    FROM pieces
    """,
    tags=("survival", "rmst", "exact-arith"),
)
def q_mean_residual_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time: the area under the KM curve up to
    the observed horizon -- S = 1 before the first event day (width =
    first event time), then each step's survival times the width to the
    next event (last step runs to the horizon). Uses the exact
    kaplan_meier machinery (e8-int cumulative log terms over the
    CALENDAR event-day spine); the area sum weights the ROUNDED S
    values, so both engines integrate identical step heights."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("p_day"),
    )
    obs = per_user.select(
        F.when(F.col("p_day").isNotNull(), F.datediff("p_day", "first_day"))
        .otherwise(F.datediff("last_day", "first_day"))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("p_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    totals = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.max("t").cast("bigint").alias("tau"),
    )
    allt = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("ending"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = allt.crossJoin(F.broadcast(totals)).select(
        "t",
        "d",
        "n_users",
        "tau",
        (
            F.col("n_users") - F.coalesce(F.sum("ending").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    steps = risk.where(F.col("d") > 0).select(
        "t",
        "n_users",
        "tau",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e8, 0
            ).cast("bigint"),
        ).alias("le8"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("died_out"),
    )
    surv = steps.select(
        "t",
        "n_users",
        "tau",
        F.when(F.max("died_out").over(wcum) == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("le8").over(wcum).cast("double") / 1e8), 6))
        .alias("s"),
        F.lead("t").over(Window.orderBy("t")).alias("t_next"),
    )
    pieces = surv.groupBy("n_users", "tau").agg(
        F.min("t").cast("bigint").alias("first_event_day"),
        F.sum(
            F.col("s") * (F.coalesce(F.col("t_next"), F.col("tau")) - F.col("t"))
        ).alias("area_after_first"),
    )
    return pieces.select(
        "n_users",
        F.col("tau").alias("horizon_days"),
        F.round(F.col("first_event_day") + F.col("area_after_first"), 6).alias(
            "rmst_days"
        ),
    )
