"""Extension batch 140 (round 6): Holt's linear-trend exponential
smoothing fitted as an ALIGNED SEQUENTIAL FOLD in both engines (Spark
`aggregate` lambda vs a DuckDB recursive CTE, identical recursion and
seed -- the batch twin of the carried-recursion streaming_ewma_replay;
DuckDB's list_reduce is UNUSABLE for coupled-state folds, see the
in-SQL note),
the Kingman VUT (G/G/1) waiting-time what-if from measured arrival and
service variability, and the EOQ reorder policy per part (completing
the inventory tier beside newsvendor_quantile / safety_stock_reorder).

Cross-engine discipline:
- The Holt fold runs over a DOUBLE-cast array built from the sorted
  last-56-day window (Spark collect_list is unordered -- array_sort on
  (day, y) structs first); both engines execute the identical
  recursion sequence l' = a*y + (1-a)(l+b), b' = be*(l'-l) + (1-be)*b
  from the same seed (l0 = y_1, b0 = 0), so the float stream is
  deterministic. Every literal is kept double-typed (the DuckDB
  decimal-literal trap: bare 0.3 * DECIMAL stays DECIMAL).
- kingman_gg1_wait: arrival gaps are exact integer micros from
  WITHIN-DAY lags (partitioned window -- no global fact-table window;
  the ~1/20k cross-midnight gaps are excluded by construction),
  service CV from exact cent moments; the utilization grid is a
  4-literal explode.
- eoq_reorder_policy: one grouped aggregation over lineitem joined to
  the part dim; EOQ = sqrt(2DK/h) over exact integer demand sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_ALPHA = 0.3
_BETA = 0.1
_FIT_DAYS = 56


@register(
    "holt_linear_forecast",
    f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    win AS (
      SELECT d, CAST(cents AS DOUBLE) AS y FROM daily
      WHERE d > (SELECT max(d) - INTERVAL 56 DAY FROM daily)),
    arr AS (
      SELECT list(y ORDER BY d) AS ys, CAST(count(*) AS BIGINT) AS n FROM win),
    rec AS (
      -- sequential Holt recursion as a recursive CTE: DuckDB 1.0's
      -- list_reduce REBINDS struct-accumulator fields sequentially
      -- inside the lambda (later fields read earlier fields' NEW
      -- values), so a coupled (l, b) recursion cannot use it
      SELECT 1 AS i, ys[1] AS l, CAST(0.0 AS DOUBLE) AS b,
             CAST(0.0 AS DOUBLE) AS sse
      FROM arr
      UNION ALL
      SELECT r.i + 1,
             {_ALPHA!r} * a.ys[r.i + 1]
               + (1.0 - {_ALPHA!r}) * (r.l + r.b),
             {_BETA!r} * (({_ALPHA!r} * a.ys[r.i + 1]
               + (1.0 - {_ALPHA!r}) * (r.l + r.b)) - r.l)
               + (1.0 - {_BETA!r}) * r.b,
             r.sse + (a.ys[r.i + 1] - (r.l + r.b))
               * (a.ys[r.i + 1] - (r.l + r.b))
      FROM rec r, arr a WHERE r.i < a.n),
    folded AS (
      SELECT a.n, r.l, r.b, r.sse
      FROM rec r CROSS JOIN arr a WHERE r.i = a.n)
    SELECT n AS n_fit_days,
           round(l / 100.0, 2) AS level_dollars,
           round(b / 100.0, 2) + 0.0 AS trend_dollars_per_day,
           round((7.0 * l + 28.0 * b) / 100.0, 2)
             AS forecast_next7_dollars,
           round(sqrt(sse / (n - 1)) / 100.0, 2) AS rmse_1step_dollars
    FROM folded
    """,
    tags=("timeseries", "forecast", "fold"),
)
def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (alpha=0.3, beta=0.1) over the
    last 56 days of daily revenue, seeded l0 = y_1, b0 = 0: both
    engines run the IDENTICAL left fold (Spark `aggregate` over the
    sorted array, seeded with element 1 and folding from element 2;
    the DuckDB oracle unrolls the same recursion as a recursive CTE
    because its list_reduce rebinds struct-accumulator fields
    mid-lambda), so the double stream matches bit-for-bit. Emits the final level/trend,
    the 7-day-ahead forecast sum (7l + 28b), and the one-step-ahead
    RMSE of the fit window."""
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
    arr = win.agg(
        F.expr("transform(array_sort(collect_list(struct(d, y))), p -> p.y)")
        .alias("ys"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a, be = repr(_ALPHA), repr(_BETA)
    new_l = f"{a} * x.l + (1.0 - {a}) * (acc.l + acc.b)"
    fold = (
        "aggregate("
        "  slice(transform(ys, y -> named_struct("
        "    'l', y, 'b', CAST(0.0 AS DOUBLE), 'sse', CAST(0.0 AS DOUBLE))),"
        "        2, size(ys) - 1),"
        "  named_struct('l', ys[0], 'b', CAST(0.0 AS DOUBLE),"
        "               'sse', CAST(0.0 AS DOUBLE)),"
        f" (acc, x) -> named_struct("
        f"   'l', {new_l},"
        f"   'b', {be} * (({new_l}) - acc.l) + (1.0 - {be}) * acc.b,"
        "    'sse', acc.sse + (x.l - (acc.l + acc.b))"
        "           * (x.l - (acc.l + acc.b))))"
    )
    folded = arr.select("n", F.expr(fold).alias("st"))
    return folded.select(
        F.col("n").alias("n_fit_days"),
        F.round(F.col("st.l") / 100.0, 2).alias("level_dollars"),
        (F.round(F.col("st.b") / 100.0, 2) + F.lit(0.0)).alias(
            "trend_dollars_per_day"
        ),
        F.round((7.0 * F.col("st.l") + 28.0 * F.col("st.b")) / 100.0, 2).alias(
            "forecast_next7_dollars"
        ),
        F.round(
            F.sqrt(F.col("st.sse") / (F.col("n") - 1).cast("double")) / 100.0, 2
        ).alias("rmse_1step_dollars"),
    )


@register(
    "kingman_gg1_wait",
    """
    WITH gaps AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY CAST(ts AS DATE)
               ORDER BY ts, event_id) AS g
      FROM events),
    ga AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS HUGEINT) AS sg,
             CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
      FROM gaps WHERE g IS NOT NULL),
    sv AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS HUGEINT) AS sv,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
                      * CAST(round(value * 100, 0) AS BIGINT)) AS HUGEINT)
               AS svv
      FROM events),
    cv AS (
      SELECT CAST(ga.n * ga.sgg - ga.sg * ga.sg AS DOUBLE)
               / CAST(ga.sg AS DOUBLE) / CAST(ga.sg AS DOUBLE) AS ca2,
             CAST(sv.m * sv.svv - sv.sv * sv.sv AS DOUBLE)
               / CAST(sv.sv AS DOUBLE) / CAST(sv.sv AS DOUBLE) AS cs2,
             CAST(sv.sv AS DOUBLE) / sv.m / 100.0 AS es_seconds
      FROM ga CROSS JOIN sv),
    grid AS (SELECT unnest([CAST(0.5 AS DOUBLE), 0.8, 0.9, 0.95]) AS rho)
    SELECT g.rho,
           round(cv.ca2, 6) AS ca2,
           round(cv.cs2, 6) AS cs2,
           round((g.rho / (1.0 - g.rho)) * ((cv.ca2 + cv.cs2) / 2.0)
                 * cv.es_seconds, 6) AS wq_seconds,
           round((g.rho / (1.0 - g.rho)) * ((cv.ca2 + cv.cs2) / 2.0)
                 * g.rho, 6) AS lq_jobs
    FROM grid g CROSS JOIN cv
    ORDER BY g.rho
    """,
    tags=("ops", "queueing"),
)
def q_kingman_gg1_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kingman VUT what-if: Wq ~ (rho/(1-rho)) * ((Ca^2 + Cs^2)/2) *
    E[S] at a 4-point utilization grid, with arrival variability Ca^2
    measured from within-day interarrival gaps (exact integer micros;
    the lag window is PARTITIONED by day, so no global fact window)
    and service variability Cs^2 from the event value distribution
    (value/100 seconds as the service proxy, documented). Lq = lambda
    * Wq = (rho/(1-rho)) * VUT * rho / E[S] * E[S]. The variability
    term, not the mean, is what explodes the queue -- the capacity-
    planning counterpart of erlang_c_staffing."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy(F.col("ts").cast("date")).orderBy("ts", "event_id")
    gaps = events.select(
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("g")
    ).where(F.col("g").isNotNull())
    ga = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast(_DEC).alias("sg"),
        F.sum(F.col("g").cast(_DEC) * F.col("g")).cast(_DEC).alias("sgg"),
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    sv = events.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(cents).cast(_DEC).alias("sv"),
        F.sum(cents.cast(_DEC) * cents).cast(_DEC).alias("svv"),
    )
    cv = ga.crossJoin(F.broadcast(sv)).select(
        (
            (F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")).cast("double")
            / F.col("sg").cast("double")
            / F.col("sg").cast("double")
        ).alias("ca2"),
        (
            (F.col("m") * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
            / F.col("sv").cast("double")
            / F.col("sv").cast("double")
        ).alias("cs2"),
        (F.col("sv").cast("double") / F.col("m") / 100.0).alias("es_seconds"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(r) for r in (0.5, 0.8, 0.9, 0.95)])).alias(
            "rho"
        )
    )
    vut = (F.col("rho") / (1.0 - F.col("rho"))) * (
        (F.col("ca2") + F.col("cs2")) / 2.0
    )
    return (
        grid.crossJoin(F.broadcast(cv))
        .select(
            "rho",
            F.round(F.col("ca2"), 6).alias("ca2"),
            F.round(F.col("cs2"), 6).alias("cs2"),
            F.round(vut * F.col("es_seconds"), 6).alias("wq_seconds"),
            F.round(vut * F.col("rho"), 6).alias("lq_jobs"),
        )
        .orderBy("rho")
    )


@register(
    "eoq_reorder_policy",
    """
    WITH span AS (
      SELECT CAST(date_diff('day', min(l_shipdate), max(l_shipdate)) + 1
                  AS BIGINT) AS days
      FROM lineitem),
    dem AS (
      SELECT l.l_partkey AS pk,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS d_units,
             max(p.p_retailprice) AS price
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_partkey),
    top AS (
      SELECT pk, d_units, price FROM dem
      ORDER BY d_units DESC, pk LIMIT 20)
    SELECT t.pk AS part_id, t.d_units AS demand_units,
           round(365.0 * CAST(t.d_units AS DOUBLE) / s.days, 6) AS annual_demand_rate,
           round(sqrt(2.0 * (365.0 * CAST(t.d_units AS DOUBLE) / s.days)
                      * 100.0 / (0.2 * t.price)), 6) AS eoq_units,
           round((365.0 * CAST(t.d_units AS DOUBLE) / s.days)
                 / sqrt(2.0 * (365.0 * CAST(t.d_units AS DOUBLE) / s.days)
                        * 100.0 / (0.2 * t.price)), 6) AS orders_per_year,
           round(7.0 * CAST(t.d_units AS DOUBLE) / s.days, 6)
             AS reorder_point_units
    FROM top t CROSS JOIN span s
    ORDER BY t.d_units DESC, t.pk
    """,
    tags=("ops", "inventory"),
)
def q_eoq_reorder_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOQ policy for the 20 highest-demand parts: annualized demand D
    from exact quantity sums over the observed shipping span, ordering
    cost K = $100, holding cost h = 20% of retail price/unit/year ->
    EOQ = sqrt(2DK/h), plus order frequency D/EOQ and a 7-day-lead
    reorder point. One grouped aggregation + broadcast span scalar;
    the dim join is the part broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    span = li.agg(
        (F.datediff(F.max("l_shipdate"), F.min("l_shipdate")) + 1)
        .cast("bigint")
        .alias("days")
    )
    dem = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias(
                "d_units"
            ),
            F.max("p_retailprice").alias("price"),
        )
    )
    top = dem.orderBy(F.col("d_units").desc(), "pk").limit(20)
    rate = 365.0 * F.col("d_units") / F.col("days")
    eoq = F.sqrt(2.0 * rate * 100.0 / (0.2 * F.col("price")))
    return (
        top.crossJoin(F.broadcast(span))
        .select(
            F.col("pk").alias("part_id"),
            F.col("d_units").alias("demand_units"),
            F.round(rate, 6).alias("annual_demand_rate"),
            F.round(eoq, 6).alias("eoq_units"),
            F.round(rate / eoq, 6).alias("orders_per_year"),
            F.round(7.0 * F.col("d_units") / F.col("days"), 6).alias(
                "reorder_point_units"
            ),
        )
        .orderBy(F.col("demand_units").desc(), "part_id")
    )
