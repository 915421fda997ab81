"""Extension batch 227 (round 10): modern sequential inference and
online learning on the daily revenue series.

- betting_eprocess_daily: ANYTIME-VALID drift test by betting (the
  Shafer/Ramdas e-process): against the null "mean = the first-365-day
  mean", each test day multiplies wealth by e_t = 1 + lambda *
  clip(z_t, -2, 2) with z_t the null-standardized value -- Ville's
  inequality makes sup-wealth > 1/alpha a level-alpha sequential test
  with NO peeking penalty (the modern replacement for fixed-horizon
  monitoring; SPRT needs a point alternative, this doesn't).
  Cross-engine discipline: z_t = (n*y - S) / sqrt(n*S2 - S^2) -- ONE
  integer numerator and ONE integer sqrt argument (the r10
  reassociation lesson), per-day log terms floor to e9 integers before
  the prefix sum (the LM log-score rule), and the ln(20) threshold is
  a Python-computed shared integer literal.
- hedge_expert_weights: Hedge / multiplicative-weights aggregation of
  five deterministic daily-revenue forecasters (lag-1, lag-7, lag-28,
  expanding integer mean, constant first-28-day mean). The key
  structural fact: log-weights DECOUPLE -- each expert's log-weight is
  an independent prefix sum of its e9-quantized bounded losses, so the
  whole fold is partitioned windows, no recursion. Final posterior
  shares quantize the exp terms to e9 integers (one libm exp per
  expert on identical doubles) and close with integer division.

Both run on CALENDAR-bounded daily spines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_BET_TRAIN = 365
_BET_LAMBDA = 0.2
_BET_LOG_THRESHOLD_E9 = math.floor(math.log(20.0) * 1e9)  # 1/alpha = 20

_DAILY_DOLLARS_SQL = """
    daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT d, y,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily)
"""


def _daily_dollars(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100"
        ).alias("y")
    )
    return daily.select(
        "d", "y", F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn")
    )


@register(
    "betting_eprocess_daily",
    f"""
    WITH {_DAILY_DOLLARS_SQL},
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s1,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
      FROM s WHERE rn <= {_BET_TRAIN}),
    bets AS (
      SELECT s.rn, s.d,
             CAST(floor(1.0e9 * ln(1.0 + {_BET_LAMBDA!r} * greatest(least(
               CAST(m.n * s.y - m.s1 AS DOUBLE)
                 / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)),
               2.0), -2.0)) + 0.5) AS BIGINT) AS l_e9
      FROM s CROSS JOIN mom m
      WHERE s.rn > {_BET_TRAIN}),
    wealth AS (
      SELECT rn, d,
             CAST(sum(l_e9) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS lw_e9
      FROM bets),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(max(lw_e9) AS BIGINT) AS max_lw,
             CAST(max(CASE WHEN rn = (SELECT max(rn) FROM wealth)
                      THEN lw_e9 END) AS BIGINT) AS final_lw
      FROM wealth),
    crossed AS (
      SELECT min(d) AS first_cross
      FROM wealth WHERE lw_e9 > {_BET_LOG_THRESHOLD_E9})
    SELECT a.n_test AS n_test_days,
           a.max_lw AS max_log_wealth_e9,
           a.final_lw AS final_log_wealth_e9,
           strftime(c.first_cross, '%Y-%m-%d') AS first_cross_day,
           CAST(a.max_lw > {_BET_LOG_THRESHOLD_E9} AS INTEGER)
             AS reject_5pct
    FROM agg a CROSS JOIN crossed c
    """,
    tags=("inference", "sequential", "anytime-valid", "exact-arith"),
)
def q_betting_eprocess_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Testing-by-betting e-process (module docstring): wealth path as
    an e9-integer prefix sum of capped-bet log payoffs; Ville crossing
    of 1/alpha = 20 is the anytime-valid rejection."""
    s = _daily_dollars(spark, sf_dir)
    mom = (
        s.where(F.col("rn") <= _BET_TRAIN)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("s2"),
        )
    )
    bets = (
        s.where(F.col("rn") > _BET_TRAIN)
        .crossJoin(F.broadcast(mom))
        .select(
            "rn",
            "d",
            F.expr(
                f"CAST(floor(1.0e9 * ln(1.0 + {_BET_LAMBDA!r}"
                f" * greatest(least("
                f" CAST(n * y - s1 AS DOUBLE)"
                f" / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)),"
                f" 2.0), -2.0)) + 0.5) AS BIGINT)"
            ).alias("l_e9"),
        )
    )
    wealth = bets.select(
        "rn",
        "d",
        F.sum("l_e9")
        .over(
            Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("lw_e9"),
    ).localCheckpoint(eager=True)
    agg = wealth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.max("lw_e9").cast("bigint").alias("max_lw"),
        F.max_by("lw_e9", "rn").cast("bigint").alias("final_lw"),
    )
    crossed = wealth.where(
        F.col("lw_e9") > _BET_LOG_THRESHOLD_E9
    ).agg(F.min("d").alias("first_cross"))
    return (
        agg.crossJoin(F.broadcast(crossed))
        .select(
            F.col("n_test").alias("n_test_days"),
            F.col("max_lw").alias("max_log_wealth_e9"),
            F.col("final_lw").alias("final_log_wealth_e9"),
            F.date_format("first_cross", "yyyy-MM-dd").alias(
                "first_cross_day"
            ),
            (F.col("max_lw") > F.lit(_BET_LOG_THRESHOLD_E9))
            .cast("int")
            .alias("reject_5pct"),
        )
    )


_HEDGE_WARMUP = 28


def _hedge_experts_sql() -> str:
    return f"""
    feat AS (
      SELECT rn, d, y,
             lag(y, 1) OVER (ORDER BY rn) AS f_lag1,
             lag(y, 7) OVER (ORDER BY rn) AS f_lag7,
             lag(y, 28) OVER (ORDER BY rn) AS f_lag28,
             CAST(sum(y) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT) // greatest(rn - 1, 1) AS f_cummean
      FROM s),
    mu AS (
      SELECT greatest(CAST(sum(y) AS BIGINT) // {_HEDGE_WARMUP}, 1)
               AS mu0
      FROM s WHERE rn <= {_HEDGE_WARMUP}),
    ex AS (
      SELECT f.rn, expert, forecast, f.y, m.mu0
      FROM feat f CROSS JOIN mu m
      CROSS JOIN LATERAL (VALUES
        ('lag1', f.f_lag1), ('lag7', f.f_lag7), ('lag28', f.f_lag28),
        ('cummean', f.f_cummean), ('const28', m.mu0))
        AS t(expert, forecast)
      WHERE f.rn > {_HEDGE_WARMUP}),
    losses AS (
      SELECT rn, expert,
             (least(abs(y - forecast), mu0) * 1000000000) // mu0
               AS l_e9
      FROM ex)
"""


@register(
    "hedge_expert_weights",
    f"""
    WITH {_DAILY_DOLLARS_SQL},
    {_hedge_experts_sql()},
    cum AS (
      SELECT expert,
             CAST(count(*) AS BIGINT) AS n_rounds,
             CAST(sum(l_e9) AS BIGINT) AS cum_loss_e9
      FROM losses GROUP BY expert),
    best AS (SELECT min(cum_loss_e9) AS lmin,
                    CAST(max(n_rounds) AS BIGINT) AS t FROM cum),
    et AS (
      SELECT c.expert, c.n_rounds, c.cum_loss_e9,
             CAST(floor(exp(-(2.0 / sqrt(CAST(b.t AS DOUBLE)))
               * (CAST(c.cum_loss_e9 - b.lmin AS DOUBLE) / 1.0e9))
               * 1.0e9 + 0.5) AS BIGINT) AS e_e9,
             CAST(c.cum_loss_e9 = b.lmin AS INTEGER) AS is_best
      FROM cum c CROSS JOIN best b),
    tot AS (SELECT CAST(sum(e_e9) AS BIGINT) AS se FROM et)
    SELECT e.expert, e.n_rounds, e.cum_loss_e9,
           (e.e_e9 * 1000000) // t.se AS share_ppm,
           e.is_best
    FROM et e CROSS JOIN tot t
    """,
    tags=("online-learning", "forecast", "exact-arith"),
)
def q_hedge_expert_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hedge over five deterministic forecasters (module docstring):
    per-expert cumulative e9-integer bounded losses (log-weights
    decouple into plain sums), exp terms quantized to e9 integers,
    posterior shares by integer division."""
    s = _daily_dollars(spark, sf_dir)
    w = Window.orderBy("rn")
    feat = s.select(
        "rn",
        "d",
        "y",
        F.lag("y", 1).over(w).alias("f_lag1"),
        F.lag("y", 7).over(w).alias("f_lag7"),
        F.lag("y", 28).over(w).alias("f_lag28"),
        F.expr(
            "CAST(sum(y) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND 1 PRECEDING) AS BIGINT)"
            " DIV greatest(rn - 1, 1L)"
        ).alias("f_cummean"),
    )
    mu = s.where(F.col("rn") <= _HEDGE_WARMUP).agg(
        F.expr(
            f"greatest(CAST(sum(y) AS BIGINT) DIV {_HEDGE_WARMUP}, 1L)"
        ).alias("mu0")
    )
    base = feat.crossJoin(F.broadcast(mu)).where(
        F.col("rn") > _HEDGE_WARMUP
    )
    ex = base.select(
        "rn",
        "y",
        "mu0",
        F.explode(
            F.array(
                F.struct(F.lit("lag1").alias("expert"), F.col("f_lag1").alias("forecast")),
                F.struct(F.lit("lag7").alias("expert"), F.col("f_lag7").alias("forecast")),
                F.struct(F.lit("lag28").alias("expert"), F.col("f_lag28").alias("forecast")),
                F.struct(F.lit("cummean").alias("expert"), F.col("f_cummean").alias("forecast")),
                F.struct(F.lit("const28").alias("expert"), F.col("mu0").alias("forecast")),
            )
        ).alias("o"),
    ).select(
        "rn",
        "y",
        "mu0",
        F.col("o.expert").alias("expert"),
        F.col("o.forecast").alias("forecast"),
    )
    losses = ex.select(
        "expert",
        F.expr(
            "(least(abs(y - forecast), mu0) * 1000000000) DIV mu0"
        ).alias("l_e9"),
    )
    cum = losses.groupBy("expert").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rounds"),
        F.sum("l_e9").cast("bigint").alias("cum_loss_e9"),
    )
    best = cum.agg(
        F.min("cum_loss_e9").alias("lmin"),
        F.max("n_rounds").cast("bigint").alias("t"),
    )
    et = cum.crossJoin(F.broadcast(best)).select(
        "expert",
        "n_rounds",
        "cum_loss_e9",
        F.expr(
            "CAST(floor(exp(-(2.0 / sqrt(CAST(t AS DOUBLE)))"
            " * (CAST(cum_loss_e9 - lmin AS DOUBLE) / 1.0e9))"
            " * 1.0e9 + 0.5) AS BIGINT)"
        ).alias("e_e9"),
        (F.col("cum_loss_e9") == F.col("lmin")).cast("int").alias("is_best"),
    )
    tot = et.agg(F.sum("e_e9").cast("bigint").alias("se"))
    return et.crossJoin(F.broadcast(tot)).selectExpr(
        "expert",
        "n_rounds",
        "cum_loss_e9",
        "(e_e9 * 1000000) DIV se AS share_ppm",
        "is_best",
    )
