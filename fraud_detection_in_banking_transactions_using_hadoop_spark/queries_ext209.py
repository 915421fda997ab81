"""Extension batch 209 (round 8): the classic technical-analysis tier
on daily revenue -- Bollinger bands (rolling 20-day mean +/- 2
population sigmas from EXACT integer frame sums), Wilder's RSI (the
(gain, loss) EWMA pair as an aligned fold), and MACD with signal-line
crossovers (a THREE-EMA coupled fold carrying the crossover counter).

Cross-engine discipline: Bollinger needs no fold -- the 20-row frame
sums are exact BIGINTs, so mean/sigma/bands are single expressions of
exact integers; RSI and MACD are bit-identical double folds (Spark
`aggregate` HOF == DuckDB recursive CTE, the kalman/holt pattern) over
the last 365 days, with every smoothing constant a shared repr'd
literal. Wilder seeding: the fold seeds at the FIRST delta (g1 =
max(d1,0), l1 = max(-d1,0)) -- simpler than the 14-SMA seed and
identical on both engines, documented here."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_W = 20  # bollinger window
_FIT_DAYS = 365
_A_RSI = repr(1.0 / 14.0)
_A12, _A26, _A9 = repr(2.0 / 13.0), repr(2.0 / 27.0), repr(2.0 / 10.0)

_DAILY_SQL = """
    daily AS MATERIALIZED (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )


@register(
    "bollinger_bands_daily",
    f"""
    WITH {_DAILY_SQL},
    fr AS (
      SELECT d, cents,
             CAST(sum(cents) OVER w AS BIGINT) AS s1,
             CAST(sum(CAST(cents AS HUGEINT) * cents) OVER w AS HUGEINT)
               AS s2,
             CAST(count(*) OVER w AS BIGINT) AS k
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN {_W - 1} PRECEDING
                   AND CURRENT ROW)),
    full_fr AS (
      SELECT d, cents, s1, s2,
             CAST(floor(sqrt(CAST({_W} * s2 - CAST(s1 AS HUGEINT) * s1
                             AS DOUBLE)) * {10000 // _W} + 0.5)
                  AS BIGINT) AS sd4
      FROM fr WHERE k = {_W})
    SELECT strftime(d, '%Y-%m-%d') AS day, cents,
           CAST(s1 * 500 AS DOUBLE) / 1e4 AS mid_cents,
           CAST(s1 * 500 + 2 * sd4 AS DOUBLE) / 1e4 AS upper_band,
           CAST(s1 * 500 - 2 * sd4 AS DOUBLE) / 1e4 AS lower_band,
           CASE WHEN sd4 = 0 THEN NULL
                ELSE round(CAST(cents * 10000 - (s1 * 500 - 2 * sd4)
                                AS DOUBLE) / (4.0 * sd4), 6)
                     + 0.0 END AS pct_b,
           CAST(CASE WHEN cents * 10000 > s1 * 500 + 2 * sd4
                THEN 1 ELSE 0 END AS INTEGER) AS above,
           CAST(CASE WHEN cents * 10000 < s1 * 500 - 2 * sd4
                THEN 1 ELSE 0 END AS INTEGER) AS below
    FROM full_fr
    """,
    tags=("finance", "ta", "calendar"),
)
def q_bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue: 20-day rolling mean +/- 2
    POPULATION sigmas, every frame statistic derived from exact
    integer sums (mean = s1/20 = s1*500/1e4 exactly; sigma is
    floor-quantized to an e4 integer BEFORE the band arithmetic -- the
    r10 sf0.1 sweep caught round(mid +/- 2*sd, 4) flipping 10/2386
    rows between Spark's BigDecimal HALF_UP and DuckDB's binary
    nearbyint on these ~1.9e9-magnitude outputs; integer-derived bands
    have no round() at all), %B position, and band-breach flags. Only
    full 20-day frames emit."""
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d").rowsBetween(-(_W - 1), 0)
    fr = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    ).where(F.col("k") == _W)
    # exact integer variance numerator 20*s2 - s1^2 -> ONE double cast
    # -> sqrt: the r10 sweep showed DuckDB's optimizer REASSOCIATES
    # (a - b)/20 into a/20 - b/20, which under the ~30-digit
    # cancellation here moved sd by 7e-7 -- shared float expression
    # text is NOT enough across a subtract-divide; only an exact
    # integer numerator pins both engines.
    sd4 = F.expr(
        f"CAST(floor(sqrt(CAST({_W} * s2 - CAST(s1 AS DECIMAL(38,0))"
        f" * s1 AS DOUBLE)) * {10000 // _W} + 0.5) AS BIGINT)"
    )
    fr = fr.withColumn("sd4", sd4)
    return fr.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "cents",
        F.expr("CAST(s1 * 500 AS DOUBLE) / 1e4").alias("mid_cents"),
        F.expr("CAST(s1 * 500 + 2 * sd4 AS DOUBLE) / 1e4").alias(
            "upper_band"
        ),
        F.expr("CAST(s1 * 500 - 2 * sd4 AS DOUBLE) / 1e4").alias(
            "lower_band"
        ),
        F.expr(
            "CASE WHEN sd4 = 0 THEN NULL"
            " ELSE round(CAST(cents * 10000 - (s1 * 500 - 2 * sd4)"
            " AS DOUBLE) / (4.0 * sd4), 6) + 0.0 END"
        ).alias("pct_b"),
        F.expr(
            "CAST(CASE WHEN cents * 10000 > s1 * 500 + 2 * sd4"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("above"),
        F.expr(
            "CAST(CASE WHEN cents * 10000 < s1 * 500 - 2 * sd4"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("below"),
    )


_RSI_SQL = f"""
    WITH RECURSIVE {_DAILY_SQL},
    win AS (
      SELECT d, cents FROM daily
      WHERE d > (SELECT max(d) - INTERVAL {_FIT_DAYS} DAY FROM daily)),
    dl AS (
      SELECT d,
             CAST(cents - lag(cents) OVER (ORDER BY d) AS DOUBLE) / 100.0
               AS dv
      FROM win),
    arr AS MATERIALIZED (
      SELECT list(dv ORDER BY d) AS ds, CAST(count(*) AS BIGINT) AS n
      FROM dl WHERE dv IS NOT NULL),
    rec AS (
      SELECT 1 AS i,
             greatest(ds[1], 0.0) AS g, greatest(-ds[1], 0.0) AS l,
             CAST(0 AS BIGINT) AS n_over, CAST(0 AS BIGINT) AS n_under
      FROM arr
      UNION ALL
      SELECT r.i + 1,
             r.g + {_A_RSI} * (greatest(a.ds[r.i + 1], 0.0) - r.g),
             r.l + {_A_RSI} * (greatest(-a.ds[r.i + 1], 0.0) - r.l),
             r.n_over + CASE WHEN r.l + {_A_RSI}
                   * (greatest(-a.ds[r.i + 1], 0.0) - r.l) > 0
                 AND 100.0 - 100.0 / (1.0
                   + (r.g + {_A_RSI} * (greatest(a.ds[r.i + 1], 0.0) - r.g))
                   / (r.l + {_A_RSI}
                      * (greatest(-a.ds[r.i + 1], 0.0) - r.l))) > 70.0
                 THEN 1 ELSE 0 END,
             r.n_under + CASE WHEN r.l + {_A_RSI}
                   * (greatest(-a.ds[r.i + 1], 0.0) - r.l) > 0
                 AND 100.0 - 100.0 / (1.0
                   + (r.g + {_A_RSI} * (greatest(a.ds[r.i + 1], 0.0) - r.g))
                   / (r.l + {_A_RSI}
                      * (greatest(-a.ds[r.i + 1], 0.0) - r.l))) < 30.0
                 THEN 1 ELSE 0 END
      FROM rec r, arr a WHERE r.i < a.n),
    folded AS (
      SELECT a.n, r.g, r.l, r.n_over, r.n_under
      FROM rec r CROSS JOIN arr a WHERE r.i = a.n)
    SELECT n AS n_deltas,
           round(g, 6) AS avg_gain,
           round(l, 6) AS avg_loss,
           CASE WHEN l = 0 THEN NULL
                ELSE round(100.0 - 100.0 / (1.0 + g / l), 6) END AS rsi,
           n_over AS days_overbought, n_under AS days_oversold
    FROM folded
"""


@register(
    "rsi_wilder_daily",
    _RSI_SQL,
    tags=("finance", "ta", "fold"),
)
def q_rsi_wilder_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's RSI over the last 365 days of daily revenue deltas:
    the (avg gain, avg loss) pair smoothed at alpha = 1/14 as one
    aligned left fold (seeded at the first delta), carrying running
    overbought (>70) / oversold (<30) day counters. Emits the final
    smoothed pair, the RSI, and both counters."""
    daily = _daily(spark, sf_dir)
    maxd = daily.agg(F.max("d").alias("mx"))
    win = (
        daily.crossJoin(F.broadcast(maxd))
        .where(F.col("d") > F.expr(f"mx - INTERVAL {_FIT_DAYS} DAY"))
        .select("d", "cents")
    )
    w = Window.orderBy("d")
    dl = win.select(
        "d",
        (
            (F.col("cents") - F.lag("cents").over(w)).cast("double") / 100.0
        ).alias("dv"),
    ).where(F.col("dv").isNotNull())
    arr = dl.agg(
        F.expr("transform(array_sort(collect_list(struct(d, dv))), q -> q.dv)")
        .alias("ds"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = _A_RSI
    g_new = f"acc.g + {a} * (greatest(e.dv, 0.0D) - acc.g)"
    l_new = f"acc.l + {a} * (greatest(-e.dv, 0.0D) - acc.l)"
    rsi_new = f"100.0D - 100.0D / (1.0D + ({g_new}) / ({l_new}))"
    fold = (
        "aggregate("
        "  slice(transform(ds, v -> named_struct('dv', v)), 2,"
        "        size(ds) - 1),"
        "  named_struct('g', greatest(ds[0], 0.0D),"
        "               'l', greatest(-ds[0], 0.0D),"
        "               'n_over', 0L, 'n_under', 0L),"
        "  (acc, e) -> named_struct("
        f"    'g', {g_new},"
        f"    'l', {l_new},"
        f"    'n_over', acc.n_over + CASE WHEN ({l_new}) > 0.0D"
        f"        AND ({rsi_new}) > 70.0D THEN 1L ELSE 0L END,"
        f"    'n_under', acc.n_under + CASE WHEN ({l_new}) > 0.0D"
        f"        AND ({rsi_new}) < 30.0D THEN 1L ELSE 0L END))"
    )
    folded = arr.select("n", F.expr(fold).alias("st"))
    return folded.select(
        F.col("n").alias("n_deltas"),
        F.round(F.col("st.g"), 6).alias("avg_gain"),
        F.round(F.col("st.l"), 6).alias("avg_loss"),
        F.when(F.col("st.l") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                100.0 - 100.0 / (1.0 + F.col("st.g") / F.col("st.l")), 6
            )
        )
        .alias("rsi"),
        F.col("st.n_over").alias("days_overbought"),
        F.col("st.n_under").alias("days_oversold"),
    )


_MACD_SQL = f"""
    WITH RECURSIVE {_DAILY_SQL},
    win AS (
      SELECT d, CAST(cents AS DOUBLE) / 100.0 AS y FROM daily
      WHERE d > (SELECT max(d) - INTERVAL {_FIT_DAYS} DAY FROM daily)),
    arr AS MATERIALIZED (
      SELECT list(y ORDER BY d) AS ys, CAST(count(*) AS BIGINT) AS n
      FROM win),
    rec AS (
      SELECT 1 AS i, ys[1] AS e12, ys[1] AS e26, CAST(0.0 AS DOUBLE)
               AS sig,
             CAST(0 AS BIGINT) AS crosses, 0 AS sgn
      FROM arr
      UNION ALL
      SELECT r.i + 1,
             r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12),
             r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26),
             r.sig + {_A9} * ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
               - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26)) - r.sig),
             r.crosses + CASE WHEN r.sgn <> 0 AND
               CASE WHEN ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                 - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26)))
                 - (r.sig + {_A9}
                    * ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                       - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26))
                       - r.sig)) > 0 THEN 1
                 WHEN ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                 - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26)))
                 - (r.sig + {_A9}
                    * ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                       - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26))
                       - r.sig)) < 0 THEN -1 ELSE 0 END
               NOT IN (0, r.sgn) THEN 1 ELSE 0 END,
             CASE WHEN ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                 - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26)))
                 - (r.sig + {_A9}
                    * ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                       - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26))
                       - r.sig)) > 0 THEN 1
                 WHEN ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                 - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26)))
                 - (r.sig + {_A9}
                    * ((r.e12 + {_A12} * (a.ys[r.i + 1] - r.e12))
                       - (r.e26 + {_A26} * (a.ys[r.i + 1] - r.e26))
                       - r.sig)) < 0 THEN -1 ELSE r.sgn END
      FROM rec r, arr a WHERE r.i < a.n),
    folded AS (
      SELECT a.n, r.e12, r.e26, r.sig, r.crosses
      FROM rec r CROSS JOIN arr a WHERE r.i = a.n)
    SELECT n AS n_fit_days,
           round(e12, 4) AS ema12,
           round(e26, 4) AS ema26,
           round(e12 - e26, 4) + 0.0 AS macd,
           round(sig, 4) + 0.0 AS signal,
           round(e12 - e26 - sig, 4) + 0.0 AS histogram,
           crosses AS n_signal_crossovers
    FROM folded
"""


@register(
    "macd_crossover_daily",
    _MACD_SQL,
    tags=("finance", "ta", "fold"),
)
def q_macd_crossover_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) on the last 365 days of daily revenue: three
    coupled EMAs in one fold (fast, slow, and the signal EMA of their
    difference), carrying the histogram's running sign and counting
    signal-line crossovers (sign flips, zeros ignored). Seeds: both
    EMAs at y1, signal at 0."""
    daily = _daily(spark, sf_dir)
    maxd = daily.agg(F.max("d").alias("mx"))
    win = (
        daily.crossJoin(F.broadcast(maxd))
        .where(F.col("d") > F.expr(f"mx - INTERVAL {_FIT_DAYS} DAY"))
        .select("d", (F.col("cents").cast("double") / 100.0).alias("y"))
    )
    arr = win.agg(
        F.expr("transform(array_sort(collect_list(struct(d, y))), q -> q.y)")
        .alias("ys"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    e12 = f"acc.e12 + {_A12} * (e.y - acc.e12)"
    e26 = f"acc.e26 + {_A26} * (e.y - acc.e26)"
    sig = f"acc.sig + {_A9} * (({e12}) - ({e26}) - acc.sig)"
    hist = f"(({e12}) - ({e26})) - ({sig})"
    hsgn = (
        f"CASE WHEN ({hist}) > 0.0D THEN 1 WHEN ({hist}) < 0.0D THEN -1"
        f" ELSE 0 END"
    )
    fold = (
        "aggregate("
        "  slice(transform(ys, v -> named_struct('y', v)), 2,"
        "        size(ys) - 1),"
        "  named_struct('e12', ys[0], 'e26', ys[0],"
        "               'sig', CAST(0.0 AS DOUBLE), 'crosses', 0L,"
        "               'sgn', 0),"
        "  (acc, e) -> named_struct("
        f"    'e12', {e12},"
        f"    'e26', {e26},"
        f"    'sig', {sig},"
        f"    'crosses', acc.crosses + CASE WHEN acc.sgn <> 0 AND"
        f"      ({hsgn}) NOT IN (0, acc.sgn) THEN 1L ELSE 0L END,"
        f"    'sgn', CASE WHEN ({hsgn}) <> 0 THEN ({hsgn})"
        f"           ELSE acc.sgn END))"
    )
    folded = arr.select("n", F.expr(fold).alias("st"))
    return folded.select(
        F.col("n").alias("n_fit_days"),
        F.round(F.col("st.e12"), 4).alias("ema12"),
        F.round(F.col("st.e26"), 4).alias("ema26"),
        (F.round(F.col("st.e12") - F.col("st.e26"), 4) + 0.0).alias("macd"),
        (F.round(F.col("st.sig"), 4) + 0.0).alias("signal"),
        (
            F.round(
                F.col("st.e12") - F.col("st.e26") - F.col("st.sig"), 4
            )
            + 0.0
        ).alias("histogram"),
        F.col("st.crosses").alias("n_signal_crossovers"),
    )
