"""Extension batch 168 (round 6): distribution shape + risk sizing on
the daily revenue series -- the Slifker-Shapiro Johnson-system
quantile fit (four symmetric normal quantiles decide SU vs SB vs SL
and, on the unbounded branch, give all four SU parameters in closed
form -- the distribution-fit shelf's missing 4-parameter family next
to gamma/lognormal/Weibull/GEV), the Omega ratio (the
gain-loss-probability-weighted performance measure that uses the
WHOLE distribution, not two moments like sharpe_sortino_daily), and
the Kelly criterion (growth-optimal exposure f* = mu/sigma^2 of the
daily log-growth series, with the half-Kelly line practitioners
actually trade).

Cross-engine discipline:
- The four Johnson quantiles are exact nearest-rank order statistics
  (ceil(p n) on the (cents, d) spine); every downstream double
  derives from those shared integers; acosh/asinh spell as their ln
  forms so no engine-specific math function is needed.
- Omega folds exact integer dollar gains/losses.
- Kelly's log growth ratios e9-quantize per row before the moment
  fold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_Z = 0.5
# Phi(-1.5), Phi(-0.5), Phi(0.5), Phi(1.5)
_PQ = (
    0.06680720126885807,
    0.3085375387259869,
    0.6914624612740131,
    0.9331927987311419,
)


def _acosh(x: str) -> str:
    return f"ln(({x}) + sqrt(({x}) * ({x}) - 1.0))"


def _asinh(x: str) -> str:
    return f"ln(({x}) + sqrt(({x}) * ({x}) + 1.0))"


@register(
    "johnson_su_quantile_fit",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily),
    q AS (
      SELECT max(CASE WHEN rk = CAST(ceil({_PQ[0]!r} * n) AS BIGINT)
                 THEN v END) AS x3m,
             max(CASE WHEN rk = CAST(ceil({_PQ[1]!r} * n) AS BIGINT)
                 THEN v END) AS x1m,
             max(CASE WHEN rk = CAST(ceil({_PQ[2]!r} * n) AS BIGINT)
                 THEN v END) AS x1p,
             max(CASE WHEN rk = CAST(ceil({_PQ[3]!r} * n) AS BIGINT)
                 THEN v END) AS x3p,
             max(n) AS n
      FROM s),
    mnp AS (
      SELECT n, x3m, x1m, x1p, x3p,
             CAST(x3p - x1p AS DOUBLE) AS m,
             CAST(x1m - x3m AS DOUBLE) AS nn,
             CAST(x1p - x1m AS DOUBLE) AS p
      FROM q),
    st AS (
      SELECT n, x3m, x1m, x1p, x3p, m, nn, p,
             m * nn / (p * p) AS ratio,
             m / p AS mp, nn / p AS np
      FROM mnp),
    fit AS (
      SELECT n, ratio,
             CASE WHEN ratio > 1.0 THEN 'SU'
                  WHEN ratio < 1.0 THEN 'SB' ELSE 'SL' END AS family,
             CASE WHEN ratio > 1.0 THEN
               2.0 * {_Z!r} / {_acosh("0.5 * (mp + np)")} END AS delta,
             CASE WHEN ratio > 1.0 THEN
               (2.0 * {_Z!r} / {_acosh("0.5 * (mp + np)")})
               * {_asinh("(np - mp) / (2.0 * sqrt(mp * np - 1.0))")} END
               AS gamma,
             CASE WHEN ratio > 1.0 THEN
               2.0 * p * sqrt(mp * np - 1.0)
               / ((mp + np - 2.0) * sqrt(mp + np + 2.0)) END AS lambda,
             CASE WHEN ratio > 1.0 THEN
               (x1p + x1m) / 2.0
               + p * (np - mp) / (2.0 * (mp + np - 2.0)) END AS xi
      FROM st)
    SELECT n AS n_days, round(ratio, 6) AS mn_over_p2, family,
           round(delta, 6) AS delta, round(gamma, 6) AS gamma,
           round(lambda, 2) AS lambda, round(xi, 2) AS xi
    FROM fit
    """,
    tags=("distribution", "fit", "johnson"),
)
def q_johnson_su_quantile_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slifker-Shapiro Johnson-system selection and SU fit from four
    exact order statistics at Phi(+-0.5), Phi(+-1.5): the discriminant
    mn/p^2 picks the family (>1 unbounded SU, <1 bounded SB, =1
    lognormal SL); on the SU branch the four parameters (gamma, delta,
    xi, lambda) are closed forms through ln-spelled acosh/asinh.
    Everything derives from four shared integer quantile values, so
    both engines walk identical doubles. The 4-parameter family
    completes the fit shelf: it can match ANY feasible
    skewness-kurtosis pair, which gamma/lognormal/Weibull cannot."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    s = daily.select(
        "v",
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias(
            "rk"
        ),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    )
    q = s.agg(
        *[
            F.max(
                F.when(
                    F.col("rk")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("v"),
                )
            ).alias(name)
            for p, name in zip(_PQ, ("x3m", "x1m", "x1p", "x3p"))
        ],
        F.max("n").alias("n"),
    )
    m = (F.col("x3p") - F.col("x1p")).cast("double")
    nn = (F.col("x1m") - F.col("x3m")).cast("double")
    p = (F.col("x1p") - F.col("x1m")).cast("double")
    st = q.select(
        "n",
        "x3m",
        "x1m",
        "x1p",
        "x3p",
        m.alias("m"),
        nn.alias("nn"),
        p.alias("p"),
        (m * nn / (p * p)).alias("ratio"),
        (m / p).alias("mp"),
        (nn / p).alias("np"),
    )
    su = F.col("ratio") > 1.0
    delta = 2.0 * _Z / F.expr(_acosh("0.5 * (mp + np)"))
    fit = st.select(
        "n",
        "ratio",
        F.when(su, "SU")
        .when(F.col("ratio") < 1.0, "SB")
        .otherwise("SL")
        .alias("family"),
        F.when(su, delta).alias("delta"),
        F.when(
            su,
            delta
            * F.expr(_asinh("(np - mp) / (2.0 * sqrt(mp * np - 1.0))")),
        ).alias("gamma"),
        F.when(
            su,
            2.0
            * F.col("p")
            * F.sqrt(F.col("mp") * F.col("np") - 1.0)
            / (
                (F.col("mp") + F.col("np") - 2.0)
                * F.sqrt(F.col("mp") + F.col("np") + 2.0)
            ),
        ).alias("lambda"),
        F.when(
            su,
            (F.col("x1p") + F.col("x1m")) / 2.0
            + F.col("p")
            * (F.col("np") - F.col("mp"))
            / (2.0 * (F.col("mp") + F.col("np") - 2.0)),
        ).alias("xi"),
    )
    return fit.select(
        F.col("n").alias("n_days"),
        F.round(F.col("ratio"), 6).alias("mn_over_p2"),
        "family",
        F.round(F.col("delta"), 6).alias("delta"),
        F.round(F.col("gamma"), 6).alias("gamma"),
        F.round(F.col("lambda"), 2).alias("lambda"),
        F.round(F.col("xi"), 2).alias("xi"),
    )


@register(
    "omega_ratio_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    chg AS (
      SELECT v - lag(v) OVER (ORDER BY d) AS c FROM daily),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c > 0 THEN CAST(c AS HUGEINT)
                      ELSE 0 END) AS HUGEINT) AS gains,
             CAST(sum(CASE WHEN c < 0 THEN CAST(-c AS HUGEINT)
                      ELSE 0 END) AS HUGEINT) AS losses,
             CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(sum(CASE WHEN c < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dn
      FROM chg WHERE c IS NOT NULL)
    SELECT n AS n_changes, n_up, n_dn,
           CAST(gains AS BIGINT) AS gain_dollars,
           CAST(losses AS BIGINT) AS loss_dollars,
           round(CAST(gains AS DOUBLE) / CAST(losses AS DOUBLE), 6)
             AS omega_0
    FROM agg
    """,
    tags=("finance", "risk", "omega"),
)
def q_omega_ratio_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Omega ratio at threshold 0 for daily revenue changes: total
    dollar gains over total dollar losses -- the full-distribution
    gain/loss measure (equal to the probability-weighted payoff ratio)
    that Sharpe's two-moment summary discards. Omega > 1 = positive
    drift; exactly 1 under a symmetric random walk. Pure integer
    dollar folds."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    chg = daily.select(
        (F.col("v") - F.lag("v").over(Window.orderBy("d"))).alias("c")
    )
    agg = chg.where(F.col("c").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("c") > 0, F.col("c").cast(_DEC)).otherwise(0))
        .cast(_DEC)
        .alias("gains"),
        F.sum(
            F.when(F.col("c") < 0, (-F.col("c")).cast(_DEC)).otherwise(0)
        )
        .cast(_DEC)
        .alias("losses"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("c") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dn"),
    )
    return agg.select(
        F.col("n").alias("n_changes"),
        "n_up",
        "n_dn",
        F.col("gains").cast("bigint").alias("gain_dollars"),
        F.col("losses").cast("bigint").alias("loss_dollars"),
        F.round(
            F.col("gains").cast("double") / F.col("losses").cast("double"),
            6,
        ).alias("omega_0"),
    )


@register(
    "kelly_fraction_daily",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    lr AS (
      SELECT CAST(floor(ln(CAST(v AS DOUBLE)
                  / lag(CAST(v AS DOUBLE)) OVER (ORDER BY d)) * 1e9 + 0.5)
                  AS BIGINT) AS r_e9
      FROM daily),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r_e9) AS HUGEINT) AS s1,
             CAST(sum(CAST(r_e9 AS HUGEINT) * r_e9) AS HUGEINT) AS s2
      FROM lr WHERE r_e9 IS NOT NULL),
    st AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / 1e9 / n AS mu,
             CAST(s2 AS DOUBLE) / 1e18 / n
               - (CAST(s1 AS DOUBLE) / 1e9 / n)
                 * (CAST(s1 AS DOUBLE) / 1e9 / n) AS var
      FROM mom)
    SELECT n AS n_returns,
           round(mu, 6) + 0.0 AS mean_log_growth,
           round(sqrt(var), 6) AS sigma,
           round(mu / var, 4) + 0.0 AS kelly_fraction,
           round(0.5 * mu / var, 4) + 0.0 AS half_kelly,
           round(mu * mu / (2.0 * var), 6) + 0.0 AS max_growth_rate
    FROM st
    """,
    tags=("finance", "sizing", "kelly"),
)
def q_kelly_fraction_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly criterion on the daily log-growth series: f* = mu/sigma^2
    is the growth-optimal exposure to a strategy whose per-period log
    return has those moments, and mu^2/(2 sigma^2) is the maximum
    achievable growth rate. The half-Kelly line is what practitioners
    size to (half the growth, a quarter of the variance drag). Log
    ratios e9-quantize per row; moments are exact integer folds.
    Signed-zero outputs normalize with + 0.0."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    wd = Window.orderBy("d")
    lr = daily.select(
        F.floor(
            F.log(
                F.col("v").cast("double")
                / F.lag(F.col("v").cast("double")).over(wd)
            )
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("r_e9")
    )
    mom = lr.where(F.col("r_e9").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r_e9").cast(_DEC).alias("s1"),
        F.sum(F.col("r_e9").cast(_DEC) * F.col("r_e9")).cast(_DEC).alias(
            "s2"
        ),
    )
    mu = F.col("s1").cast("double") / 1e9 / F.col("n")
    var = F.col("s2").cast("double") / 1e18 / F.col("n") - mu * mu
    st = mom.select("n", mu.alias("mu"), var.alias("var"))
    return st.select(
        F.col("n").alias("n_returns"),
        (F.round(F.col("mu"), 6) + F.lit(0.0)).alias("mean_log_growth"),
        F.round(F.sqrt(F.col("var")), 6).alias("sigma"),
        (F.round(F.col("mu") / F.col("var"), 4) + F.lit(0.0)).alias(
            "kelly_fraction"
        ),
        (F.round(0.5 * F.col("mu") / F.col("var"), 4) + F.lit(0.0)).alias(
            "half_kelly"
        ),
        (
            F.round(
                F.col("mu") * F.col("mu") / (2.0 * F.col("var")), 6
            )
            + F.lit(0.0)
        ).alias("max_growth_rate"),
    )
