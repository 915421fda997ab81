"""Extension batch 175 (round 6): the three production exponential-
smoothing variants that complete holt_linear_forecast -- Holt-Winters
additive with weekly seasonality (level + trend + a ROTATING 7-slot
seasonal state: the first fold in the repo whose accumulator carries
an array), the damped-trend method (phi = 0.9: the 'forecast at long
horizons flattens' correction that won the M3 evaluation as a
default), and the Theta method (the M3 winner itself: average of the
OLS trendline and an SES on the theta=2 line).

Cross-engine discipline: all three run the IDENTICAL left fold in
both engines (Spark `aggregate` over the date-sorted array == DuckDB
recursive CTE -- the holt_linear_forecast pattern; list/array state
rotates with slice+append in identical order), seeded from the same
integer-derived doubles, over the same last-56-day window; OLS
components come from exact integer moments. Final outputs round(2)
in dollars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_FIT_DAYS = 56
_M = 7
_AL = 0.3
_BE = 0.05
_GA = 0.2
_AL_D = 0.3
_BE_D = 0.1
_PHI = 0.9
_AL_T = 0.3

_WIN_SQL = f"""
    daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    win AS (
      SELECT d, CAST(cents AS DOUBLE) AS y FROM daily
      WHERE d > (SELECT max(d) - INTERVAL {_FIT_DAYS} DAY FROM daily)),
    arr AS MATERIALIZED (
      SELECT list(y ORDER BY d) AS ys, CAST(count(*) AS BIGINT) AS n
      FROM win)
"""


def _win(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    maxd = daily.agg(F.max("d").alias("mx"))
    win = (
        daily.crossJoin(F.broadcast(maxd))
        .where(F.col("d") > F.expr(f"mx - INTERVAL {_FIT_DAYS} DAY"))
        .select("d", F.col("cents").cast("double").alias("y"))
    )
    return win.agg(
        F.expr("transform(array_sort(collect_list(struct(d, y))), p -> p.y)")
        .alias("ys"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@register(
    "holt_winters_weekly",
    f"""
    WITH RECURSIVE {_WIN_SQL},
    seed AS (
      SELECT n, ys,
             (ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6] + ys[7]) / 7.0
               AS l0,
             ((ys[8] + ys[9] + ys[10] + ys[11] + ys[12] + ys[13] + ys[14])
              - (ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6] + ys[7]))
               / 49.0 AS b0
      FROM arr),
    rec AS (
      SELECT 7 AS i, s.l0 AS l, s.b0 AS b,
             [s.ys[1] - s.l0, s.ys[2] - s.l0, s.ys[3] - s.l0,
              s.ys[4] - s.l0, s.ys[5] - s.l0, s.ys[6] - s.l0,
              s.ys[7] - s.l0] AS sv,
             CAST(0.0 AS DOUBLE) AS sse
      FROM seed s
      UNION ALL
      SELECT r.i + 1,
             {_AL!r} * (a.ys[r.i + 1] - r.sv[1])
               + (1.0 - {_AL!r}) * (r.l + r.b),
             {_BE!r} * (({_AL!r} * (a.ys[r.i + 1] - r.sv[1])
               + (1.0 - {_AL!r}) * (r.l + r.b)) - r.l)
               + (1.0 - {_BE!r}) * r.b,
             list_append(r.sv[2:7],
               {_GA!r} * (a.ys[r.i + 1]
                 - ({_AL!r} * (a.ys[r.i + 1] - r.sv[1])
                    + (1.0 - {_AL!r}) * (r.l + r.b)))
               + (1.0 - {_GA!r}) * r.sv[1]),
             r.sse + (a.ys[r.i + 1] - (r.l + r.b + r.sv[1]))
               * (a.ys[r.i + 1] - (r.l + r.b + r.sv[1]))
      FROM rec r, arr a WHERE r.i < a.n),
    fin AS (
      SELECT a.n, r.l, r.b, r.sv, r.sse
      FROM rec r CROSS JOIN arr a WHERE r.i = a.n)
    SELECT n AS n_fit_days,
           round(l / 100.0, 2) AS level_dollars,
           round(b / 100.0, 2) + 0.0 AS trend_dollars_per_day,
           round((list_max(sv) - list_min(sv)) / 100.0, 2)
             AS seasonal_amplitude_dollars,
           round((7.0 * l + 28.0 * b + sv[1] + sv[2] + sv[3] + sv[4]
                  + sv[5] + sv[6] + sv[7]) / 100.0, 2)
             AS forecast_next7_dollars,
           round(sqrt(sse / (n - 7)) / 100.0, 2) AS rmse_1step_dollars
    FROM fin
    """,
    tags=("timeseries", "forecast", "fold"),
)
def q_holt_winters_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive smoothing with weekly seasonality over
    the last 56 days (alpha=0.3, beta=0.05, gamma=0.2): level/trend
    seeded from the first two weeks, seasonal state seeded as
    first-week deviations and kept as a ROTATING 7-slot array whose
    head is always s_{{t-7}} -- slice+append in the fold, identical
    in Spark's aggregate lambda and DuckDB's recursive CTE. Emits
    the final level/trend, the seasonal amplitude (the cycle the
    plain Holt fold cannot see), the 7-day-ahead forecast sum and
    the one-step RMSE."""
    arr = _win(spark, sf_dir)
    l0 = "((ys[0]+ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]) / 7.0)"
    b0 = (
        "(((ys[7]+ys[8]+ys[9]+ys[10]+ys[11]+ys[12]+ys[13])"
        " - (ys[0]+ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6])) / 49.0)"
    )
    al, be, ga = repr(_AL), repr(_BE), repr(_GA)
    new_l = f"{al} * (x - acc.sv[0]) + (1.0 - {al}) * (acc.l + acc.b)"
    fold = (
        "aggregate("
        "  slice(ys, 8, size(ys) - 7),"
        f" named_struct('l', {l0}, 'b', {b0},"
        f"   'sv', transform(slice(ys, 1, 7), v -> v - {l0}),"
        "    'sse', CAST(0.0 AS DOUBLE)),"
        f" (acc, x) -> named_struct("
        f"   'l', {new_l},"
        f"   'b', {be} * (({new_l}) - acc.l) + (1.0 - {be}) * acc.b,"
        f"   'sv', concat(slice(acc.sv, 2, 6),"
        f"     array({ga} * (x - ({new_l})) + (1.0 - {ga}) * acc.sv[0])),"
        "    'sse', acc.sse + (x - (acc.l + acc.b + acc.sv[0]))"
        "           * (x - (acc.l + acc.b + acc.sv[0]))))"
    )
    folded = arr.select("n", F.expr(fold).alias("st"))
    sv_sum = sum(F.expr(f"st.sv[{i}]") for i in range(7))
    return folded.select(
        F.col("n").alias("n_fit_days"),
        F.round(F.col("st.l") / 100.0, 2).alias("level_dollars"),
        (F.round(F.col("st.b") / 100.0, 2) + F.lit(0.0)).alias(
            "trend_dollars_per_day"
        ),
        F.round(
            (F.expr("array_max(st.sv)") - F.expr("array_min(st.sv)"))
            / 100.0,
            2,
        ).alias("seasonal_amplitude_dollars"),
        F.round(
            (7.0 * F.col("st.l") + 28.0 * F.col("st.b") + sv_sum) / 100.0, 2
        ).alias("forecast_next7_dollars"),
        F.round(
            F.sqrt(F.col("st.sse") / (F.col("n") - 7).cast("double"))
            / 100.0,
            2,
        ).alias("rmse_1step_dollars"),
    )


@register(
    "damped_trend_forecast",
    f"""
    WITH RECURSIVE {_WIN_SQL},
    rec AS (
      SELECT 1 AS i, a.ys[1] AS l, CAST(0.0 AS DOUBLE) AS b,
             CAST(0.0 AS DOUBLE) AS sse
      FROM arr a
      UNION ALL
      SELECT r.i + 1,
             {_AL_D!r} * a.ys[r.i + 1]
               + (1.0 - {_AL_D!r}) * (r.l + {_PHI!r} * r.b),
             {_BE_D!r} * (({_AL_D!r} * a.ys[r.i + 1]
               + (1.0 - {_AL_D!r}) * (r.l + {_PHI!r} * r.b)) - r.l)
               + (1.0 - {_BE_D!r}) * {_PHI!r} * r.b,
             r.sse + (a.ys[r.i + 1] - (r.l + {_PHI!r} * r.b))
               * (a.ys[r.i + 1] - (r.l + {_PHI!r} * r.b))
      FROM rec r, arr a WHERE r.i < a.n),
    fin AS (
      SELECT a.n, r.l, r.b, r.sse
      FROM rec r CROSS JOIN arr a WHERE r.i = a.n)
    SELECT n AS n_fit_days,
           round(l / 100.0, 2) AS level_dollars,
           round(b / 100.0, 2) + 0.0 AS trend_dollars_per_day,
           round((7.0 * l + b * ({"+".join(f"{sum(_PHI ** i for i in range(1, h + 1))!r}" for h in range(1, 8))}))
                 / 100.0, 2) AS forecast_next7_dollars,
           round((l + b * {_PHI / (1 - _PHI)!r}) / 100.0, 2)
             AS asymptote_dollars,
           round(sqrt(sse / (n - 1)) / 100.0, 2) AS rmse_1step_dollars
    FROM fin
    """,
    tags=("timeseries", "forecast", "fold"),
)
def q_damped_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped-trend exponential smoothing (alpha=0.3, beta=0.1,
    phi=0.9) over the last 56 days: the trend contribution at horizon
    h is b(phi + ... + phi^h), so long-horizon forecasts flatten to
    the asymptote l + b phi/(1-phi) instead of extrapolating forever
    -- the single change that made damped trend the M3 evaluation's
    recommended default over plain Holt. Same shared fold pattern;
    horizon weights are Python literals."""
    arr = _win(spark, sf_dir)
    al, be, ph = repr(_AL_D), repr(_BE_D), repr(_PHI)
    new_l = f"{al} * x + (1.0 - {al}) * (acc.l + {ph} * acc.b)"
    fold = (
        "aggregate("
        "  slice(ys, 2, size(ys) - 1),"
        "  named_struct('l', ys[0], 'b', CAST(0.0 AS DOUBLE),"
        "               'sse', CAST(0.0 AS DOUBLE)),"
        f" (acc, x) -> named_struct("
        f"   'l', {new_l},"
        f"   'b', {be} * (({new_l}) - acc.l)"
        f"        + (1.0 - {be}) * {ph} * acc.b,"
        f"   'sse', acc.sse + (x - (acc.l + {ph} * acc.b))"
        f"          * (x - (acc.l + {ph} * acc.b))))"
    )
    folded = arr.select("n", F.expr(fold).alias("st"))
    wsum = sum(
        sum(_PHI**i for i in range(1, h + 1)) for h in range(1, 8)
    )
    return folded.select(
        F.col("n").alias("n_fit_days"),
        F.round(F.col("st.l") / 100.0, 2).alias("level_dollars"),
        (F.round(F.col("st.b") / 100.0, 2) + F.lit(0.0)).alias(
            "trend_dollars_per_day"
        ),
        F.round(
            (7.0 * F.col("st.l") + F.col("st.b") * F.lit(wsum)) / 100.0, 2
        ).alias("forecast_next7_dollars"),
        F.round(
            (F.col("st.l") + F.col("st.b") * (_PHI / (1 - _PHI))) / 100.0,
            2,
        ).alias("asymptote_dollars"),
        F.round(
            F.sqrt(F.col("st.sse") / (F.col("n") - 1).cast("double"))
            / 100.0,
            2,
        ).alias("rmse_1step_dollars"),
    )


@register(
    "theta_method_forecast",
    f"""
    WITH RECURSIVE {_WIN_SQL},
    idx AS (
      SELECT a.n, a.ys, g.i AS t, a.ys[g.i] AS y
      FROM arr a, (SELECT unnest(range(1, {_FIT_DAYS + 1})) AS i) g
      WHERE g.i <= a.n),
    ols AS (
      SELECT max(n) AS n,
             (CAST(count(*) AS DOUBLE) * sum(t * y) - sum(t) * sum(y))
               / (CAST(count(*) AS DOUBLE) * sum(t * t)
                  - sum(t) * sum(t)) AS b_ols,
             (sum(y) - (CAST(count(*) AS DOUBLE) * sum(t * y)
                        - sum(t) * sum(y))
               / (CAST(count(*) AS DOUBLE) * sum(t * t) - sum(t) * sum(t))
               * sum(t)) / count(*) AS a_ols
      FROM idx),
    rec AS (
      SELECT 1 AS i, o.n, o.a_ols, o.b_ols,
             2.0 * a.ys[1] - (o.a_ols + o.b_ols * 1) AS s
      FROM arr a CROSS JOIN ols o
      UNION ALL
      SELECT r.i + 1, r.n, r.a_ols, r.b_ols,
             {_AL_T!r} * (2.0 * a.ys[r.i + 1]
               - (r.a_ols + r.b_ols * (r.i + 1)))
               + (1.0 - {_AL_T!r}) * r.s
      FROM rec r, arr a WHERE r.i < r.n),
    fin AS (SELECT n, a_ols, b_ols, s FROM rec WHERE i = n)
    SELECT n AS n_fit_days,
           round(b_ols / 100.0, 2) + 0.0 AS ols_slope_dollars_per_day,
           round(s / 100.0, 2) AS theta2_ses_dollars,
           round((0.5 * (7.0 * a_ols + b_ols * (7.0 * n + 28.0))
                  + 0.5 * 7.0 * s) / 100.0, 2) AS forecast_next7_dollars
    FROM fin
    """,
    tags=("timeseries", "forecast", "fold"),
)
def q_theta_method_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Theta method (theta = 2, the M3 competition winner): split
    the last 56 days into the OLS trendline (theta = 0, all trend no
    curvature) and the theta = 2 line (2y - trendline, doubled local
    behavior), SES-smooth the theta-2 line (alpha = 0.3, seeded at
    its first value), and average the two components' forecasts:
    F_{{n+h}} = 0.5 (a + b(n+h)) + 0.5 SES_flat. OLS from the exact
    index spine; the SES fold is shared; the 7-day forecast sums h =
    1..7."""
    arr = _win(spark, sf_dir)
    idx = arr.select(
        "n",
        "ys",
        F.posexplode(F.col("ys")).alias("p0", "y"),
    ).select("n", "ys", (F.col("p0") + 1).alias("t"), "y")
    ols2 = idx.agg(
        F.max("n").alias("n"),
        (
            (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("t") * F.col("y"))
                - F.sum("t") * F.sum("y")
            )
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("t") * F.col("t"))
                - F.sum("t") * F.sum("t")
            )
        ).alias("b_ols"),
        (
            (
                F.sum("y")
                - (
                    F.count(F.lit(1)).cast("double")
                    * F.sum(F.col("t") * F.col("y"))
                    - F.sum("t") * F.sum("y")
                )
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.sum(F.col("t") * F.col("t"))
                    - F.sum("t") * F.sum("t")
                )
                * F.sum("t")
            )
            / F.count(F.lit(1))
        ).alias("a_ols"),
    )
    al = repr(_AL_T)
    fold = (
        "aggregate("
        "  slice(zs, 2, size(zs) - 1),"
        "  zs[0],"
        f" (acc, x) -> {al} * x + (1.0 - {al}) * acc)"
    )
    withz = arr.crossJoin(F.broadcast(ols2.select("a_ols", "b_ols"))).select(
        "n",
        "a_ols",
        "b_ols",
        F.expr(
            "transform(ys, (v, i) -> 2.0 * v - (a_ols + b_ols * (i + 1)))"
        ).alias("zs"),
    )
    fin = withz.select(
        "n", "a_ols", "b_ols", F.expr(fold).alias("s")
    )
    return fin.select(
        F.col("n").alias("n_fit_days"),
        (F.round(F.col("b_ols") / 100.0, 2) + F.lit(0.0)).alias(
            "ols_slope_dollars_per_day"
        ),
        F.round(F.col("s") / 100.0, 2).alias("theta2_ses_dollars"),
        F.round(
            (
                0.5
                * (
                    7.0 * F.col("a_ols")
                    + F.col("b_ols") * (7.0 * F.col("n") + 28.0)
                )
                + 0.5 * 7.0 * F.col("s")
            )
            / 100.0,
            2,
        ).alias("forecast_next7_dollars"),
    )
