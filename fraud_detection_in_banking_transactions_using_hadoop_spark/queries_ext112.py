"""Extension batch 112: Tukey median polish, calendar variance
decomposition, and the dispersion scale sweep.

- median_polish_2way: Tukey's robust two-way decomposition of the
  nation x segment median-spend table -- two full row/column sweeps
  of LOWER medians (exact integer order statistics on the 125-cell
  table; medians of integers stay integers, so the whole polish is
  exact integer arithmetic). The residual cells are interactions a
  mean-based ANOVA would let one outlier nation fake.
- calendar_variance_decomposition: how much daily-revenue variance
  do weekday and month-of-year explain? Hierarchical R^2 from group
  means (dow first, then dow x month cells), each between-SS via the
  floor-division identity -- the honest 'is seasonality even worth
  modeling' number.
- dispersion_scale_sweep: the variance-to-mean index of order counts
  at 1/7/28-day aggregation scales: Poisson stays at 1 across
  scales, clustered arrivals inflate with the window -- the scale
  profile (cf. allan_variance for cadence) that says WHERE the
  burstiness lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


def _lower_median_sql(src: str, part: str, val: str) -> str:
    """SQL fragment: per-`part` lower median of `val` over `src`."""
    return f"""(
      SELECT {part}, {val} AS med FROM (
        SELECT {part}, {val},
               row_number() OVER (PARTITION BY {part} ORDER BY {val}) AS rn,
               count(*) OVER (PARTITION BY {part}) AS cnt
        FROM {src}) x
      WHERE rn = (cnt + 1) // 2)"""


@register(
    "median_polish_2way",
    f"""
    WITH base AS (
      SELECT c.c_nationkey AS g, c.c_mktsegment AS s,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cells0 AS (
      SELECT g, s, v FROM (
        SELECT g, s, v,
               row_number() OVER (PARTITION BY g, s ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY g, s) AS cnt
        FROM base) x
      WHERE rn = (cnt + 1) // 2),
    r1 AS {_lower_median_sql("cells0", "g", "v")},
    cells1 AS (
      SELECT c.g, c.s, c.v - r.med AS v
      FROM cells0 c JOIN r1 r ON c.g = r.g),
    c1 AS {_lower_median_sql("cells1", "s", "v")},
    cells2 AS (
      SELECT c.g, c.s, c.v - cc.med AS v
      FROM cells1 c JOIN c1 cc ON c.s = cc.s),
    r2 AS {_lower_median_sql("cells2", "g", "v")},
    cells3 AS (
      SELECT c.g, c.s, c.v - r.med AS v
      FROM cells2 c JOIN r2 r ON c.g = r.g),
    c2 AS {_lower_median_sql("cells3", "s", "v")},
    cells4 AS (
      SELECT c.g, c.s, c.v - cc.med AS v
      FROM cells3 c JOIN c2 cc ON c.s = cc.s)
    SELECT CAST(g AS INTEGER) AS nationkey, s AS segment,
           round(v / 100.0, 2) + 0.0 AS residual_dollars
    FROM cells4
    ORDER BY abs(v) DESC, g, s LIMIT 5
    """,
    tags=("robust", "two-way", "exact-arith"),
)
def q_median_polish_2way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the nation x segment median-order-value
    table: two full sweeps (row lower-medians, then column, twice)
    in EXACT integer cents -- medians of integers are integers, so
    no float enters until the display division. The top-5 |residual|
    cells are the nation-segment interactions that survive the
    additive fit: the robust answer to 'which market is genuinely
    special' that one whale order can't fake."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    base = o.join(cu, o.o_custkey == cu.c_custkey).select(
        F.col("c_nationkey").alias("g"),
        F.col("c_mktsegment").alias("s"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    # exact per-cell lower median via partitioned rank (125 tiny groups)
    wc = Window.partitionBy("g", "s").orderBy("v")
    cells = (
        base.select(
            "g",
            "s",
            "v",
            F.row_number().over(wc).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("g", "s")).alias("cnt"),
        )
        .where(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
        .select("g", "s", "v")
    )

    def sweep(df: DataFrame, part: str) -> DataFrame:
        w = Window.partitionBy(part).orderBy("v")
        med = (
            df.select(
                part,
                "v",
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(Window.partitionBy(part)).alias("cnt"),
            )
            .where(F.col("rn") == F.expr("(cnt + 1) DIV 2"))
            .select(part, F.col("v").alias("med"))
        )
        return df.join(med, part).select(
            "g", "s", (F.col("v") - F.col("med")).alias("v")
        )

    out = sweep(sweep(sweep(sweep(cells, "g"), "s"), "g"), "s")
    return (
        out.orderBy(F.abs(F.col("v")).desc(), "g", "s")
        .limit(5)
        .select(
            F.col("g").cast("int").alias("nationkey"),
            F.col("s").alias("segment"),
            (F.round(F.col("v") / 100.0, 2) + 0.0).alias("residual_dollars"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar variance decomposition of daily revenue.
# ---------------------------------------------------------------------------
@register(
    "calendar_variance_decomposition",
    """
    WITH d AS (
      SELECT o_orderdate AS dt, dayofweek(o_orderdate) % 7 AS dow,
             date_part('month', o_orderdate) AS mth,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q
      FROM d),
    bydow AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s
      FROM d GROUP BY dow),
    bycell AS (
      SELECT dow, mth, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s
      FROM d GROUP BY dow, mth),
    ssdow AS (
      SELECT CAST(sum((s * s) // n) AS HUGEINT) AS sq FROM bydow),
    sscell AS (
      SELECT CAST(sum((s * s) // n) AS HUGEINT) AS sq FROM bycell)
    SELECT t.n AS n_days,
           round((CAST(dw.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n)
                 / (CAST(t.q AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n), 6)
             AS r2_weekday,
           round((CAST(ce.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n)
                 / (CAST(t.q AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n), 6)
             AS r2_weekday_month,
           round(((CAST(ce.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n)
                  - (CAST(dw.sq AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n))
                 / (CAST(t.q AS DOUBLE) - CAST(t.s AS DOUBLE) * t.s / t.n), 6)
             + 0.0 AS r2_month_increment
    FROM tot t CROSS JOIN ssdow dw CROSS JOIN sscell ce
    """,
    tags=("timeseries", "decomposition", "exact-arith"),
)
def q_calendar_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical calendar R^2 for daily revenue: between-group sums
    of squares via the exact floor-division identity sum(S_g^2 div
    n_g), first for the 7 weekdays, then for the 7 x 12 weekday-month
    cells; the increment is what month adds BEYOND weekday. Low
    totals here mean seasonal features won't help a forecaster --
    measured before anyone builds them."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.expr(
            "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
        ).alias("y")
    ).select(
        "y",
        (F.dayofweek("dt") % 7).alias("dow"),
        F.month("dt").alias("mth"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast(_DEC).alias("s"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("q"),
    )

    def ss(gcols):
        return (
            d.groupBy(*gcols)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("y").cast(_DEC).alias("s"),
            )
            .agg(
                F.sum(F.expr("CAST((s * s) DIV n AS DECIMAL(38,0))"))
                .cast(_DEC)
                .alias("sq")
            )
        )

    ssdow = ss(["dow"]).select(F.col("sq").alias("dwsq"))
    sscell = ss(["dow", "mth"]).select(F.col("sq").alias("cesq"))
    out = tot.crossJoin(F.broadcast(ssdow)).crossJoin(F.broadcast(sscell))
    corr = F.col("s").cast("double") * F.col("s") / F.col("n")
    sst = F.col("q").cast("double") - corr
    ssd = F.col("dwsq").cast("double") - corr
    ssc = F.col("cesq").cast("double") - corr
    return out.select(
        F.col("n").alias("n_days"),
        F.round(ssd / sst, 6).alias("r2_weekday"),
        F.round(ssc / sst, 6).alias("r2_weekday_month"),
        (F.round((ssc - ssd) / sst, 6) + 0.0).alias("r2_month_increment"),
    )


# ---------------------------------------------------------------------------
# Index-of-dispersion sweep across aggregation scales.
# ---------------------------------------------------------------------------
@register(
    "dispersion_scale_sweep",
    """
    WITH d AS (
      SELECT o_orderdate AS dt, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate),
    start AS (SELECT min(dt) AS d0 FROM d),
    scales AS (SELECT unnest(ARRAY[1, 7, 28]) AS w),
    binned AS (
      SELECT sc.w,
             date_diff('day', st.d0, d.dt) // sc.w AS b,
             CAST(sum(d.c) AS BIGINT) AS x
      FROM d CROSS JOIN scales sc CROSS JOIN start st
      GROUP BY sc.w, date_diff('day', st.d0, d.dt) // sc.w),
    mom AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      FROM binned GROUP BY w)
    SELECT CAST(w AS INTEGER) AS window_days,
           n AS n_windows,
           round(CAST(s AS DOUBLE) / n, 2) AS mean_per_window,
           round((CAST(n AS DOUBLE) * q - CAST(s AS DOUBLE) * s)
                 / (CAST(n AS DOUBLE) * n) / (CAST(s AS DOUBLE) / n), 4)
             AS dispersion_index
    FROM mom ORDER BY window_days
    """,
    tags=("timeseries", "burstiness", "exact-arith"),
)
def q_dispersion_scale_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean dispersion of order counts at 1/7/28-day
    windows (bins anchored at the first order date; exact integer
    moments per scale): a Poisson process holds D ~ 1 at every
    scale, day-of-week cycles inflate the 1-day row only, and
    long-memory clustering grows D with the window. The scale
    profile that tells poisson_dispersion's single number WHERE the
    excess lives."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    start = d.agg(F.min("dt").alias("d0"))
    scales = spark.createDataFrame([(1,), (7,), (28,)], "w int")
    binned = (
        d.crossJoin(F.broadcast(scales))
        .crossJoin(F.broadcast(start))
        .groupBy(
            "w", F.expr("CAST(datediff(dt, d0) AS BIGINT) DIV w").alias("b")
        )
        .agg(F.sum("c").cast("bigint").alias("x"))
    )
    mom = binned.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("s"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).cast(_DEC).alias("q"),
    )
    nd = F.col("n").cast("double")
    di = (
        (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s"))
        / (nd * F.col("n"))
        / (F.col("s").cast("double") / F.col("n"))
    )
    return mom.select(
        F.col("w").cast("int").alias("window_days"),
        F.col("n").alias("n_windows"),
        F.round(F.col("s").cast("double") / F.col("n"), 2).alias(
            "mean_per_window"
        ),
        F.round(di, 4).alias("dispersion_index"),
    ).orderBy("window_days")
