"""Extension batch 145 (round 6): completing the survival tier on top
of the kaplan_meier_survival machinery (queries_ext14) -- the
restricted mean survival time (RMST: area under KM to a horizon; the
clinically/commercially meaningful "average days to conversion within
3 weeks" that a median can't give when the curve never crosses 0.5),
the cure-fraction estimate (the KM plateau: the share of users who
will NEVER convert, vs the naive censored rate that overcounts), and
the conditional survival curve S(t+7 | t) (given no conversion by day
t, the chance of staying unconverted another week -- the retention
team's actual question).

All three reuse the same exact-arithmetic KM discipline: per-step log
terms ln(1 - d/n) rounded to e8 integers, accumulated exactly, ONE exp
per output value; RMST's interval areas are e9-quantized before the
sum so the step-function integral is engine-order-free.

Scale notes: everything runs on the |distinct event-time| day spine
(growth class events_days); the fact table is touched once by the
per-user aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TAU = 21  # RMST horizon (events span ~30 days)

# shared KM step table: t, d, n_risk, le8 (e8-int log survival term)
_KM_SQL = """
    per_user AS (
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
                  THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e8,
                            0) AS BIGINT)
                  ELSE NULL END AS le8,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS died_out
      FROM risk WHERE d > 0),
    surv AS (
      SELECT t, d, n_risk,
             CASE WHEN max(died_out) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                  THEN 0.0
                  ELSE exp(CAST(sum(le8) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 1e8)
             END AS s
      FROM steps)
"""


def _km_surv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the _KM_SQL step/survival table: (t, d, n_risk,
    s) where s = KM survival JUST AFTER the events at day t."""
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
        .alias("t"),
        F.when(F.col("p_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    allt = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("ending"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    wt = Window.orderBy("t")
    prior = F.coalesce(
        F.sum("ending").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum("ending").over(Window.partitionBy())
    risk = allt.select("t", "d", (total - prior).cast("bigint").alias("n_risk"))
    steps = risk.where(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e8,
                0,
            ).cast("bigint"),
        ).alias("le8"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("died_out"),
    )
    cum = wt.rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        "t",
        "d",
        "n_risk",
        F.when(F.max("died_out").over(cum) == 1, 0.0)
        .otherwise(F.exp(F.sum("le8").over(cum).cast("double") / 1e8))
        .alias("s"),
    )


@register(
    "rmst_survival",
    f"""
    WITH {_KM_SQL},
    seg AS (
      SELECT t, s,
             lead(t) OVER (ORDER BY t) AS next_t
      FROM surv),
    areas AS (
      SELECT CAST(floor(s * (least(coalesce(next_t, {_TAU}), {_TAU}) - t)
                        * 1e9 + 0.5) AS BIGINT) AS a_e9
      FROM seg WHERE t < {_TAU}),
    head AS (
      SELECT CAST(least(min(t), {_TAU}) * CAST(1000000000 AS BIGINT) AS BIGINT)
               AS h_e9
      FROM surv)
    SELECT CAST({_TAU} AS BIGINT) AS horizon_days,
           round((h.h_e9 + coalesce((SELECT sum(a_e9) FROM areas), 0))
                 / 1e9, 6) AS rmst_days,
           round(1.0 - (h.h_e9 + coalesce((SELECT sum(a_e9) FROM areas), 0))
                 / 1e9 / {_TAU}, 6) AS conversion_time_share
    FROM head h
    """,
    tags=("survival", "kaplan-meier", "exact-arith"),
)
def q_rmst_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to the 21-day horizon: the area
    under the KM step function, = average unconverted days per user
    within 3 weeks (conversion_time_share = 1 - RMST/tau is the mean
    fraction of the horizon spent converted). Integrates the step
    curve exactly: the leading [0, t_1) strip at S = 1 plus one
    e9-quantized S*(interval) area per event time, summed as exact
    integers."""
    surv = _km_surv(spark, sf_dir)
    wt = Window.orderBy("t")
    seg = surv.select("t", "s", F.lead("t").over(wt).alias("next_t"))
    areas = seg.where(F.col("t") < _TAU).select(
        F.floor(
            F.col("s")
            * (F.least(F.coalesce(F.col("next_t"), F.lit(_TAU)), F.lit(_TAU)) - F.col("t"))
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("a_e9")
    )
    a_tot = areas.agg(
        F.coalesce(F.sum("a_e9"), F.lit(0)).cast("bigint").alias("a")
    )
    head = surv.agg(
        (F.least(F.min("t"), F.lit(_TAU)) * F.lit(1_000_000_000).cast("bigint"))
        .cast("bigint")
        .alias("h_e9")
    )
    return head.crossJoin(F.broadcast(a_tot)).select(
        F.lit(_TAU).cast("bigint").alias("horizon_days"),
        F.round((F.col("h_e9") + F.col("a")) / 1e9, 6).alias("rmst_days"),
        F.round(
            1.0 - (F.col("h_e9") + F.col("a")) / 1e9 / _TAU, 6
        ).alias("conversion_time_share"),
    )


@register(
    "cure_fraction_km",
    f"""
    WITH {_KM_SQL},
    last_s AS (
      SELECT s FROM surv ORDER BY t DESC LIMIT 1),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(ev) AS BIGINT) AS n_converted
      FROM obs)
    SELECT c.n_users, c.n_converted,
           round(1.0 - CAST(c.n_converted AS DOUBLE) / c.n_users, 6)
             AS naive_never_rate,
           round(l.s, 6) AS km_cure_fraction
    FROM counts c CROSS JOIN last_s l
    """,
    tags=("survival", "kaplan-meier"),
)
def q_cure_fraction_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cure-fraction estimate: the KM plateau S at the last event time
    is the principled share of users who will NEVER convert --
    strictly larger than the naive censored rate would suggest,
    because censored users still had conversion risk ahead of them
    when they left. Emitting both shows the censoring correction the
    KM machinery buys."""
    surv = _km_surv(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.lit(1))
        ).alias("conv")
    )
    counts = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.coalesce(F.sum("conv"), F.lit(0)).cast("bigint").alias("n_converted"),
    )
    last_s = surv.orderBy(F.col("t").desc()).limit(1).select("s")
    return counts.crossJoin(F.broadcast(last_s)).select(
        "n_users",
        "n_converted",
        F.round(
            1.0 - F.col("n_converted").cast("double") / F.col("n_users"), 6
        ).alias("naive_never_rate"),
        F.round(F.col("s"), 6).alias("km_cure_fraction"),
    )


@register(
    "conditional_survival_curve",
    f"""
    WITH {_KM_SQL},
    grid AS (SELECT unnest([0, 7, 14]) AS t0),
    lsum AS (
      SELECT g.t0,
             CAST(coalesce(sum(CASE WHEN s.t <= g.t0 THEN s.le8 END), 0)
                  AS BIGINT) AS l_at,
             CAST(coalesce(sum(CASE WHEN s.t <= g.t0 + 7 THEN s.le8 END), 0)
                  AS BIGINT) AS l_ahead,
             CAST(max(CASE WHEN s.t <= g.t0 AND s.died_out = 1
                      THEN 1 ELSE 0 END) AS INTEGER) AS dead_at,
             CAST(max(CASE WHEN s.t <= g.t0 + 7 AND s.died_out = 1
                      THEN 1 ELSE 0 END) AS INTEGER) AS dead_ahead
      FROM grid g CROSS JOIN steps s
      GROUP BY g.t0)
    SELECT CAST(t0 AS BIGINT) AS given_unconverted_through_day,
           round(CASE WHEN dead_at = 1 THEN 0.0
                 ELSE exp(CAST(l_at AS DOUBLE) / 1e8) END, 6) AS s_at_t,
           CASE WHEN dead_at = 1 THEN NULL
                WHEN dead_ahead = 1 THEN 0.0
                ELSE round(exp(CAST(l_ahead - l_at AS DOUBLE) / 1e8), 6) END
             AS p_unconverted_7_more_days
    FROM lsum
    ORDER BY t0
    """,
    tags=("survival", "retention"),
)
def q_conditional_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional survival S(t+7 | t) = S(t+7)/S(t) for t in
    {0, 7, 14}: given a user is still unconverted after t days, the
    probability they stay unconverted another week. Because S is
    exp(cumulative e8 log terms), the RATIO is one exp of an exact
    integer DIFFERENCE of log sums -- no division of floats at all.
    Rising conditional survival with t is the classic 'if they
    haven't converted early they never will' signal that triggers
    re-engagement campaigns."""
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
        .alias("t"),
        F.when(F.col("p_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    allt = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("ending"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    wt = Window.orderBy("t")
    prior = F.coalesce(
        F.sum("ending").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum("ending").over(Window.partitionBy())
    risk = allt.select("t", "d", (total - prior).cast("bigint").alias("n_risk"))
    steps = risk.where(F.col("d") > 0).select(
        "t",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")) * 1e8,
                0,
            ).cast("bigint"),
        ).alias("le8"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("died_out"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(F.lit(0), F.lit(7), F.lit(14))).alias("t0")
    )
    lsum = (
        steps.crossJoin(F.broadcast(grid))
        .groupBy("t0")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("t") <= F.col("t0"), F.col("le8"))), F.lit(0)
            )
            .cast("bigint")
            .alias("l_at"),
            F.coalesce(
                F.sum(F.when(F.col("t") <= F.col("t0") + 7, F.col("le8"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("l_ahead"),
            F.max(
                F.when(
                    (F.col("t") <= F.col("t0")) & (F.col("died_out") == 1), 1
                ).otherwise(0)
            )
            .cast("integer")
            .alias("dead_at"),
            F.max(
                F.when(
                    (F.col("t") <= F.col("t0") + 7) & (F.col("died_out") == 1), 1
                ).otherwise(0)
            )
            .cast("integer")
            .alias("dead_ahead"),
        )
    )
    return lsum.select(
        F.col("t0").cast("bigint").alias("given_unconverted_through_day"),
        F.round(
            F.when(F.col("dead_at") == 1, 0.0).otherwise(
                F.exp(F.col("l_at").cast("double") / 1e8)
            ),
            6,
        ).alias("s_at_t"),
        F.when(F.col("dead_at") == 1, F.lit(None).cast("double"))
        .when(F.col("dead_ahead") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp((F.col("l_ahead") - F.col("l_at")).cast("double") / 1e8), 6
            )
        )
        .alias("p_unconverted_7_more_days"),
    ).orderBy("given_unconverted_through_day")
