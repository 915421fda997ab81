"""Extension batch 78: forecast evaluation metrics (MASE, Theil's U2,
tracking signal), quantile pinball loss, and an event study (abnormal
revenue + CAR around the peak day).

forecast_backtest_mape (ext10) evaluates ONE model with ONE metric;
this batch adds the scale-free metrics the forecasting literature
actually recommends (MAPE breaks near zero; MASE/U2 don't), plus the
quantile-forecast loss and the event-study counterfactual.

Exactness: the daily series is integer cents; naive / seasonal-naive
forecasts are lagged actuals (integers), so every error, absolute
error, and squared error sums exactly; quantiles are exact order
statistics off the grouped two-level rank plan. Each statistic is one
final double division of exact integers.

Scale: one groupBy(day) + one calendar-bounded window pass per query;
the quantile table is 21 rows; the event window is 11 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TEST_DAYS = 91
_PINBALL_PCTS = (10, 50, 90)

_DAILY_SQL = """
    d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )


# ---------------------------------------------------------------------------
# MASE + Theil's U2 + tracking signal for the seasonal-naive forecast.
# ---------------------------------------------------------------------------
@register(
    "forecast_eval_suite",
    f"""
    WITH {_DAILY_SQL},
    lagged AS (
      SELECT dt, y,
             lag(y, 1) OVER (ORDER BY dt) AS ln1,
             lag(y, 7) OVER (ORDER BY dt) AS ln7
      FROM d),
    cutoff AS (
      SELECT max(dt) - INTERVAL {_TEST_DAYS} DAY AS co FROM d),
    train AS (
      SELECT CAST(count(*) AS BIGINT) AS n_train,
             CAST(sum(abs(y - ln1)) AS HUGEINT) AS sae_naive
      FROM lagged, cutoff WHERE dt <= co AND ln1 IS NOT NULL),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(abs(y - ln7)) AS HUGEINT) AS sae_model,
             CAST(sum(y - ln7) AS HUGEINT) AS se_model,
             CAST(sum(CAST(y - ln7 AS HUGEINT) * (y - ln7)) AS HUGEINT)
               AS sse_model,
             CAST(sum(CAST(y - ln1 AS HUGEINT) * (y - ln1)) AS HUGEINT)
               AS sse_naive
      FROM lagged, cutoff WHERE dt > co)
    SELECT tr.n_train, te.n_test,
           round(CAST(te.sae_model AS DOUBLE) * tr.n_train
                 / (CAST(tr.sae_naive AS DOUBLE) * te.n_test), 6) AS mase,
           round(sqrt(CAST(te.sse_model AS DOUBLE)
                      / CAST(te.sse_naive AS DOUBLE)), 6) AS theil_u2,
           round(CAST(te.se_model AS DOUBLE) * te.n_test
                 / CAST(te.sae_model AS DOUBLE), 6) + 0.0
             AS tracking_signal,
           round(CAST(te.se_model AS DOUBLE)
                 / CAST(te.sae_model AS DOUBLE), 6) + 0.0
             AS mean_bias_ratio
    FROM train tr CROSS JOIN test te
    """,
    tags=("forecast", "metric", "exact-arith"),
)
def q_forecast_eval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (y_{t-7}) one-step forecasts on the last 91 days,
    judged by the scale-free trio: MASE (test MAE over the TRAIN
    one-step-naive MAE -- the Hyndman-Koehler scale), Theil's U2 vs
    the random walk (sqrt of the exact SSE ratio), and the per-day
    tracking signal (cumulative error over MAD -- the bias alarm of
    ops forecasting). Every sum is an exact integer; the lag windows
    run over the calendar-bounded daily series."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("dt")
    lagged = d.select(
        "dt",
        "y",
        F.lag("y", 1).over(w).alias("ln1"),
        F.lag("y", 7).over(w).alias("ln7"),
    )
    cutoff = d.agg(
        F.date_sub(F.max("dt"), _TEST_DAYS).alias("co")
    )
    lc = lagged.crossJoin(F.broadcast(cutoff))
    e7 = (F.col("y") - F.col("ln7")).cast(_DEC)
    e1 = (F.col("y") - F.col("ln1")).cast(_DEC)
    train = (
        lc.where((F.col("dt") <= F.col("co")) & F.col("ln1").isNotNull())
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum(F.abs(F.col("y") - F.col("ln1"))).cast(_DEC).alias("sae_naive"),
        )
    )
    test = lc.where(F.col("dt") > F.col("co")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.abs(F.col("y") - F.col("ln7"))).cast(_DEC).alias("sae_model"),
        F.sum(F.col("y") - F.col("ln7")).cast(_DEC).alias("se_model"),
        F.sum(e7 * e7).cast(_DEC).alias("sse_model"),
        F.sum(e1 * e1).cast(_DEC).alias("sse_naive"),
    )
    j = train.crossJoin(F.broadcast(test))
    return j.select(
        "n_train",
        "n_test",
        F.round(
            F.col("sae_model").cast("double") * F.col("n_train")
            / (F.col("sae_naive").cast("double") * F.col("n_test")),
            6,
        ).alias("mase"),
        F.round(
            F.sqrt(
                F.col("sse_model").cast("double") / F.col("sse_naive").cast("double")
            ),
            6,
        ).alias("theil_u2"),
        (
            F.round(
                F.col("se_model").cast("double") * F.col("n_test")
                / F.col("sae_model").cast("double"),
                6,
            )
            + 0.0
        ).alias("tracking_signal"),
        (
            F.round(
                F.col("se_model").cast("double")
                / F.col("sae_model").cast("double"),
                6,
            )
            + 0.0
        ).alias("mean_bias_ratio"),
    )


# ---------------------------------------------------------------------------
# Pinball loss of per-weekday train quantile forecasts.
# ---------------------------------------------------------------------------
@register(
    "pinball_loss_dow",
    f"""
    WITH {_DAILY_SQL},
    cutoff AS (
      SELECT max(dt) - INTERVAL {_TEST_DAYS} DAY AS co FROM d),
    marked AS (
      SELECT dt, y, dayofweek(dt) % 7 AS dow, dt > (SELECT co FROM cutoff)
               AS is_test
      FROM d),
    spine AS (
      SELECT dow, y AS v, CAST(count(*) AS BIGINT) AS c
      FROM marked WHERE NOT is_test GROUP BY dow, y),
    cum AS (
      SELECT dow, v,
             sum(c) OVER (PARTITION BY dow ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER (PARTITION BY dow) AS n
      FROM spine),
    pcts AS (SELECT unnest(ARRAY{list(_PINBALL_PCTS)}) AS pct),
    qs AS (
      SELECT p.pct, c.dow, min(c.v) AS q
      FROM cum c JOIN pcts p ON 100 * c.cc >= p.pct * c.n
      GROUP BY p.pct, c.dow),
    scored AS (
      SELECT q.pct,
             CASE WHEN m.y >= q.q THEN q.pct * (m.y - q.q)
                  ELSE (100 - q.pct) * (q.q - m.y) END AS loss_e2,
             CASE WHEN m.y <= q.q THEN 1 ELSE 0 END AS covered
      FROM marked m JOIN qs q ON m.dow = q.dow
      WHERE m.is_test)
    SELECT CAST(pct AS INTEGER) AS quantile_pct,
           CAST(count(*) AS BIGINT) AS n_test,
           round(CAST(sum(CAST(loss_e2 AS HUGEINT)) AS DOUBLE)
                 / count(*) / 10000.0, 4) AS avg_pinball_dollars,
           round(CAST(sum(covered) AS DOUBLE) / count(*), 6) AS coverage
    FROM scored GROUP BY pct ORDER BY pct
    """,
    tags=("forecast", "quantile", "exact-arith"),
)
def q_pinball_loss_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile forecasts (per-weekday train order statistics at the
    10/50/90th percentiles, exact off the GROUPED two-level rank plan)
    scored on the 91-day test window with the pinball loss -- the
    integer 'centi-loss' pct*(y-q) or (100-pct)*(q-y) sums exactly;
    coverage is the empirical P(y <= q), which calibrated quantiles
    should pin near pct/100. The proper scoring rule for P10/P50/P90
    demand planning."""
    d = _daily(spark, sf_dir)
    cutoff = d.agg(F.date_sub(F.max("dt"), _TEST_DAYS).alias("co"))
    marked = d.crossJoin(F.broadcast(cutoff)).select(
        "dt",
        "y",
        (F.dayofweek("dt") % 7).alias("dow"),
        (F.col("dt") > F.col("co")).alias("is_test"),
    )
    spine = (
        marked.where(~F.col("is_test"))
        .groupBy("dow", F.col("y").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = spine.groupBy("dow").agg(F.sum("c").cast("bigint").alias("n"))
    cum = (
        with_global_rank(
            spine, "v", [F.col("v")], prefix_sum={"cc": "c"}, partition_cols=["dow"]
        )
        .drop("global_rank")
        .join(F.broadcast(totals), "dow")
    )
    pcts = spark.createDataFrame([(p,) for p in _PINBALL_PCTS], "pct int")
    qs = (
        cum.join(F.broadcast(pcts), 100 * F.col("cc") >= F.col("pct") * F.col("n"))
        .groupBy("pct", "dow")
        .agg(F.min("v").alias("q"))
    )
    scored = (
        marked.where(F.col("is_test"))
        .join(F.broadcast(qs), "dow")
        .select(
            "pct",
            F.when(
                F.col("y") >= F.col("q"), F.col("pct") * (F.col("y") - F.col("q"))
            )
            .otherwise((100 - F.col("pct")) * (F.col("q") - F.col("y")))
            .alias("loss_e2"),
            F.when(F.col("y") <= F.col("q"), 1).otherwise(0).alias("covered"),
        )
    )
    return (
        scored.groupBy(F.col("pct").cast("int").alias("quantile_pct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(
                F.sum(F.col("loss_e2").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
                / 10000.0,
                4,
            ).alias("avg_pinball_dollars"),
            F.round(
                F.sum("covered").cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage"),
        )
        .orderBy("quantile_pct")
    )


# ---------------------------------------------------------------------------
# Event study around the single busiest revenue day.
# ---------------------------------------------------------------------------
@register(
    "event_study_car",
    f"""
    WITH {_DAILY_SQL},
    ev AS (
      SELECT dt AS ed FROM d ORDER BY y DESC, dt LIMIT 1),
    est AS (
      SELECT CAST(count(*) AS BIGINT) AS n_est,
             CAST(sum(y) AS HUGEINT) AS s_est
      FROM d, ev
      WHERE dt BETWEEN ed - INTERVAL 70 DAY AND ed - INTERVAL 11 DAY),
    win AS (
      SELECT CAST(date_diff('day', ev.ed, d.dt) AS BIGINT) AS offset_days,
             d.y, e.n_est, e.s_est
      FROM d, ev, est e
      WHERE d.dt BETWEEN ev.ed - INTERVAL 5 DAY AND ev.ed + INTERVAL 5 DAY),
    ar AS (
      SELECT offset_days,
             CAST(n_est AS BIGINT) AS n_est,
             CAST(n_est * y - s_est AS HUGEINT) AS arn
      FROM win)
    SELECT offset_days,
           round(CAST(arn AS DOUBLE) / n_est / 100.0, 2) + 0.0
             AS abnormal_dollars,
           round(CAST(sum(arn) OVER (ORDER BY offset_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / n_est / 100.0, 2) + 0.0 AS car_dollars
    FROM ar ORDER BY offset_days
    """,
    tags=("causal", "event-study", "exact-arith"),
)
def q_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around the busiest revenue day: the counterfactual
    is the 60-day estimation-window mean ending 11 days before the
    event; abnormal revenue AR_t = y_t - mean stays exact as the
    integer n_est * y_t - S_est, and CAR accumulates those integers
    over the 11-row [-5, +5] window before ONE double division per
    row. The sum window runs on 11 rows -- structurally bounded."""
    d = _daily(spark, sf_dir)
    ev = d.orderBy(F.col("y").desc(), "dt").limit(1).select(F.col("dt").alias("ed"))
    est = (
        d.crossJoin(F.broadcast(ev))
        .where(
            (F.col("dt") >= F.date_sub(F.col("ed"), 70))
            & (F.col("dt") <= F.date_sub(F.col("ed"), 11))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_est"),
            F.sum("y").cast(_DEC).alias("s_est"),
        )
    )
    win = (
        d.crossJoin(F.broadcast(ev))
        .where(
            (F.col("dt") >= F.date_sub(F.col("ed"), 5))
            & (F.col("dt") <= F.date_add(F.col("ed"), 5))
        )
        .crossJoin(F.broadcast(est))
        .select(
            F.datediff("dt", "ed").cast("bigint").alias("offset_days"),
            "y",
            "n_est",
            "s_est",
        )
    )
    ar = win.select(
        "offset_days",
        "n_est",
        (F.col("n_est").cast(_DEC) * F.col("y").cast(_DEC) - F.col("s_est"))
        .cast(_DEC)
        .alias("arn"),
    )
    wcar = Window.orderBy("offset_days").rowsBetween(Window.unboundedPreceding, 0)
    return ar.select(
        "offset_days",
        (F.round(F.col("arn").cast("double") / F.col("n_est") / 100.0, 2) + 0.0).alias(
            "abnormal_dollars"
        ),
        (
            F.round(
                F.sum("arn").over(wcar).cast("double") / F.col("n_est") / 100.0, 2
            )
            + 0.0
        ).alias("car_dollars"),
    ).orderBy("offset_days")
