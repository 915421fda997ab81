"""Extension batch 156 (round 6): Cox proportional-hazards regression
fitted IN-ENGINE (Breslow ties, 3 Newton steps on the partial
likelihood -- the model every churn/conversion team actually ships;
completes the survival tier's inference story the way the GLM batch
did for counts/binaries), and the mean cumulative function for
RECURRENT events (expected purchases per user by account age --
Nelson-Aalen handles first events, the MCF handles all of them).

Cox mechanics, relationally: per Newton round, each user's risk
weight w = exp(beta * x) folds into PER-EVENT-TIME sums (e9-quantized
-> exact), suffix-cumulated over the event-time spine (the at-risk
set at time t is everyone with t_i >= t, so a DESC-ordered running
sum over |distinct days| rows); the score U = sum_d (x_d - SX_t/SW_t)
and information I = sum_d (SXXW/SW - (SXW/SW)^2) then fold per-t
double terms re-quantized at e9, making each beta update bit-identical
across engines. The oracle unrolls the same 3 rounds as CTEs.

Scale notes: per round one grouped aggregate (fact -> |days| rows) +
one suffix window over the CALENDAR-bounded spine; the per-user frame
is checkpointed once (EAGER class, the GLM shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_COX_ROUNDS = 3


def _cox_round_sql(i: int) -> str:
    w = "exp(b.beta * o.x)"
    return f"""
    pt{i} AS (
      SELECT o.t,
             CAST(sum(CAST(floor({w} * 1e9 + 0.5) AS BIGINT)) AS HUGEINT)
               AS sw_e9,
             CAST(sum(CAST(floor(o.x * {w} * 1e9 + 0.5) AS BIGINT))
               AS HUGEINT) AS sxw_e9,
             CAST(sum(CAST(floor(o.x * o.x * {w} * 1e9 + 0.5) AS BIGINT))
               AS HUGEINT) AS sxxw_e9,
             CAST(sum(o.ev) AS BIGINT) AS d,
             CAST(sum(CASE WHEN o.ev = 1
                  THEN CAST(floor(o.x * 1e9 + 0.5) AS BIGINT) END) AS HUGEINT)
               AS sxd_e9
      FROM obs o CROSS JOIN cb{i} b GROUP BY o.t),
    sfx{i} AS (
      SELECT t, d, sxd_e9,
             sum(sw_e9) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rw,
             sum(sxw_e9) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rxw,
             sum(sxxw_e9) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rxxw
      FROM pt{i}),
    ui{i} AS (
      SELECT
        CAST(sum(CASE WHEN d > 0 THEN
          CAST(floor((CAST(sxd_e9 AS DOUBLE) / 1e9
            - d * CAST(rxw AS DOUBLE) / rw) * 1e9 + 0.5) AS BIGINT) END)
          AS HUGEINT) AS u_e9,
        CAST(sum(CASE WHEN d > 0 THEN
          CAST(floor(d * (CAST(rxxw AS DOUBLE) / rw
            - (CAST(rxw AS DOUBLE) / rw) * (CAST(rxw AS DOUBLE) / rw))
            * 1e9 + 0.5) AS BIGINT) END) AS HUGEINT) AS i_e9
      FROM sfx{i}),
    cb{i + 1} AS (
      SELECT b.beta + CAST(u.u_e9 AS DOUBLE) / CAST(u.i_e9 AS DOUBLE) AS beta
      FROM cb{i} b CROSS JOIN ui{i} u)
    """


_COX_SQL = f"""
    WITH per_user AS (
      SELECT user_id,
             min(CAST(ts AS DATE)) AS first_day,
             max(CAST(ts AS DATE)) AS last_day,
             min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
               AS p_day,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM events GROUP BY user_id),
    raw AS (
      SELECT CASE WHEN p_day IS NOT NULL
                  THEN date_diff('day', first_day, p_day)
                  ELSE date_diff('day', first_day, last_day) END AS t,
             CASE WHEN p_day IS NOT NULL THEN 1 ELSE 0 END AS ev,
             n_ev
      FROM per_user),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(n_ev) AS HUGEINT) AS s,
             CAST(sum(n_ev * n_ev) AS HUGEINT) AS ss
      FROM raw),
    obs AS MATERIALIZED (
      SELECT r.t, r.ev,
             (CAST(r.n_ev AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
               / (sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE))
                  / CAST(m.n AS DOUBLE)) AS x
      FROM raw r CROSS JOIN mom m),
    cb0 AS (SELECT CAST(0.0 AS DOUBLE) AS beta),
    {",".join(_cox_round_sql(k).strip() for k in range(_COX_ROUNDS))},
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(ev) AS BIGINT) AS n_events
      FROM obs)
    SELECT c.n_users, c.n_events,
           round(b.beta, 6) + 0.0 AS cox_beta_per_sd,
           round(exp(b.beta), 6) AS hazard_ratio_per_sd
    FROM counts c CROSS JOIN cb{_COX_ROUNDS} b
    """


@register(
    "cox_ph_newton",
    _COX_SQL,
    tags=("survival", "ml", "regression"),
)
def q_cox_ph_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional hazards for days-to-first-purchase with one
    covariate (standardized per-user event count): 3 Newton steps on
    the Breslow partial likelihood, entirely in-engine. Each round
    folds per-event-time weight sums (e9-exact), suffix-cumulates them
    over the event-time spine to get the at-risk aggregates, and
    assembles the score/information from re-quantized per-time terms
    -- so both engines walk the identical beta sequence. A hazard
    ratio > 1 per SD means active users convert FASTER at every
    horizon, the assumption-light way to say it."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("p_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    raw = per_user.select(
        F.when(F.col("p_day").isNotNull(), F.datediff("p_day", "first_day"))
        .otherwise(F.datediff("last_day", "first_day"))
        .alias("t"),
        F.when(F.col("p_day").isNotNull(), 1).otherwise(0).alias("ev"),
        "n_ev",
    )
    mom = raw.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("n_ev").cast(_DEC).alias("s"),
        F.sum(F.col("n_ev").cast(_DEC) * F.col("n_ev")).cast(_DEC).alias("ss"),
    )
    obs = (
        raw.crossJoin(F.broadcast(mom))
        .select(
            "t",
            "ev",
            (
                (
                    F.col("n_ev").cast("double")
                    - F.col("s").cast("double") / F.col("n").cast("double")
                )
                / (
                    F.sqrt(
                        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
                            "double"
                        )
                    )
                    / F.col("n").cast("double")
                )
            ).alias("x"),
        )
        .localCheckpoint(eager=True)
    )
    beta_df = obs.sparkSession.range(1).select(
        F.lit(0.0).alias("beta")
    ).localCheckpoint(eager=True)
    wdesc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    for _ in range(_COX_ROUNDS):
        j = obs.crossJoin(F.broadcast(beta_df))
        w = F.exp(F.col("beta") * F.col("x"))
        pt = j.groupBy("t").agg(
            F.sum(F.floor(w * 1e9 + 0.5).cast("bigint")).cast(_DEC).alias("sw_e9"),
            F.sum(F.floor(F.col("x") * w * 1e9 + 0.5).cast("bigint"))
            .cast(_DEC)
            .alias("sxw_e9"),
            F.sum(
                F.floor(F.col("x") * F.col("x") * w * 1e9 + 0.5).cast("bigint")
            )
            .cast(_DEC)
            .alias("sxxw_e9"),
            F.sum("ev").cast("bigint").alias("d"),
            F.sum(
                F.when(
                    F.col("ev") == 1,
                    F.floor(F.col("x") * 1e9 + 0.5).cast("bigint"),
                )
            )
            .cast(_DEC)
            .alias("sxd_e9"),
        )
        sfx = pt.select(
            "t",
            "d",
            "sxd_e9",
            F.sum("sw_e9").over(wdesc).alias("rw"),
            F.sum("sxw_e9").over(wdesc).alias("rxw"),
            F.sum("sxxw_e9").over(wdesc).alias("rxxw"),
        )
        ratio = F.col("rxw").cast("double") / F.col("rw").cast("double")
        ui = sfx.agg(
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.floor(
                        (
                            F.col("sxd_e9").cast("double") / 1e9
                            - F.col("d") * ratio
                        )
                        * 1e9
                        + 0.5
                    ).cast("bigint"),
                )
            )
            .cast(_DEC)
            .alias("u_e9"),
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.floor(
                        F.col("d")
                        * (
                            F.col("rxxw").cast("double")
                            / F.col("rw").cast("double")
                            - ratio * ratio
                        )
                        * 1e9
                        + 0.5
                    ).cast("bigint"),
                )
            )
            .cast(_DEC)
            .alias("i_e9"),
        )
        beta_df = (
            beta_df.crossJoin(F.broadcast(ui))
            .select(
                (
                    F.col("beta")
                    + F.col("u_e9").cast("double") / F.col("i_e9").cast("double")
                ).alias("beta")
            )
            .localCheckpoint(eager=True)
        )
    counts = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("ev").cast("bigint").alias("n_events"),
    )
    return counts.crossJoin(F.broadcast(beta_df)).select(
        "n_users",
        "n_events",
        (F.round(F.col("beta"), 6) + F.lit(0.0)).alias("cox_beta_per_sd"),
        F.round(F.exp(F.col("beta")), 6).alias("hazard_ratio_per_sd"),
    )


@register(
    "mean_cumulative_function",
    """
    WITH per_user AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
             max(CAST(ts AS DATE)) AS last_day
      FROM events GROUP BY user_id),
    purch AS (
      SELECT e.user_id,
             date_diff('day', u.first_day, CAST(e.ts AS DATE)) AS age
      FROM events e JOIN per_user u ON e.user_id = u.user_id
      WHERE e.event_type = 'purchase'),
    fu AS (
      SELECT user_id, date_diff('day', first_day, last_day) AS tau
      FROM per_user),
    ages AS (SELECT unnest(range(0, 29)) AS age),
    risk AS (
      SELECT a.age, CAST(count(*) AS BIGINT) AS n_at_risk
      FROM ages a JOIN fu ON fu.tau >= a.age GROUP BY a.age),
    ev AS (
      SELECT a.age, CAST(coalesce(p.c, 0) AS BIGINT) AS n_events
      FROM ages a LEFT JOIN (SELECT age, CAST(count(*) AS BIGINT) AS c
                             FROM purch GROUP BY age) p ON p.age = a.age),
    inc AS (
      SELECT r.age, r.n_at_risk, e.n_events,
             CAST(floor(1e9 * e.n_events / r.n_at_risk + 0.5) AS BIGINT)
               AS d_e9
      FROM risk r JOIN ev e ON r.age = e.age)
    SELECT age AS account_age_days, n_at_risk, n_events,
           round(sum(d_e9) OVER (ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1e9, 6)
             AS mcf_purchases_per_user
    FROM inc
    ORDER BY age
    """,
    tags=("survival", "recurrent-events"),
)
def q_mean_cumulative_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cumulative function for RECURRENT purchases: at each
    account age a, the increment (purchases at age a) / (users still
    under observation at age a), cumulated -- the expected number of
    purchases a user has made by age a, correctly weighting users with
    shorter follow-up. Nelson-Aalen stops at the FIRST event; the MCF
    is its recurrent-events sibling (Nelson 1988). Increments are
    e9-quantized so the cumulative is an exact integer prefix sum over
    the hard-bounded 29-day age grid."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .join(per_user, "user_id")
        .select(
            F.datediff(F.col("ts").cast("date"), F.col("first_day")).alias(
                "age"
            )
        )
    )
    fu = per_user.select(
        F.datediff("last_day", "first_day").alias("tau")
    )
    ages = ev.sparkSession.range(0, 29).select(
        F.col("id").cast("integer").alias("age")
    )
    risk = (
        ages.crossJoin(fu)
        .where(F.col("tau") >= F.col("age"))
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_at_risk"))
    )
    pc = purch.groupBy("age").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    evt = ages.join(pc, "age", "left").select(
        "age", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_events")
    )
    inc = risk.join(evt, "age").select(
        "age",
        "n_at_risk",
        "n_events",
        F.floor(1e9 * F.col("n_events") / F.col("n_at_risk") + 0.5)
        .cast("bigint")
        .alias("d_e9"),
    )
    wa = Window.orderBy("age").rowsBetween(Window.unboundedPreceding, 0)
    return inc.select(
        F.col("age").alias("account_age_days"),
        "n_at_risk",
        "n_events",
        F.round(F.sum("d_e9").over(wa) / 1e9, 6).alias(
            "mcf_purchases_per_user"
        ),
    ).orderBy("account_age_days")
