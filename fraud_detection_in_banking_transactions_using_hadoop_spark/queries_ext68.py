"""Extension batch 68: Hurst exponent (rescaled-range analysis) and
Croston's method for intermittent demand.

Scale notes (the 100 TB story per query):
- hurst_exponent_rs: long-memory diagnostic for the daily revenue
  series. For block sizes m in {16, 32, 64, 128} the series splits
  into consecutive m-day blocks (day index DIV m -- a partitioned key,
  so every window below is PARTITIONED by block); per block the range
  of m-scaled integer cumulative deviations (exact HUGEINT) over the
  population std gives R/S, each block's ratio rounds to an e9 integer
  before the order-free per-m average, and H is the closed-form OLS
  slope of ln(avg R/S) on ln(m) over the 4 points.
- croston_intermittent_demand: the forecasting standard for sparse
  (lumpy) demand -- EWMA of nonzero demand SIZES and of the INTERVALS
  between them, updated only at demand points. Both recursions unroll
  with the ewma_smoothing rescale trick (u_i = term / r^i, prefix sum,
  multiply back), PARTITIONED per part; forecast = z/p. Only parts
  with >= 5 demand days are reported (top 20 by id for a bounded
  output both engines select identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_HURST_MS = (16, 32, 64, 128)
_CROSTON_A = 0.2
_CROSTON_R = 1.0 - _CROSTON_A


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis.
# ---------------------------------------------------------------------------
@register(
    "hurst_exponent_rs",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS i, x
      FROM daily),
    ms AS (SELECT unnest(ARRAY{list(_HURST_MS)}) AS m),
    blocks AS (
      SELECT ms.m, s.i // ms.m AS blk, s.i % ms.m AS j, CAST(s.x AS HUGEINT) AS x,
             count(*) OVER (PARTITION BY ms.m, s.i // ms.m) AS bn
      FROM s CROSS JOIN ms),
    full_blocks AS (SELECT * FROM blocks WHERE bn = m),
    bsum AS (
      SELECT m, blk,
             sum(x) AS sx, sum(x * x) AS sxx
      FROM full_blocks GROUP BY m, blk),
    cum AS (
      SELECT f.m, f.blk, f.j,
             CAST(f.m AS HUGEINT)
               * sum(f.x) OVER (PARTITION BY f.m, f.blk ORDER BY f.j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (f.j + 1) * b.sx AS dev_m
      FROM full_blocks f JOIN bsum b ON b.m = f.m AND b.blk = f.blk),
    rs AS (
      SELECT c.m, c.blk,
             CAST(round(1e9 *
               (CAST(max(c.dev_m) - min(least(c.dev_m, 0)) AS DOUBLE)
                / CAST(c.m AS DOUBLE))
               / sqrt((CAST(c.m AS DOUBLE) * CAST(b.sxx AS DOUBLE)
                   - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE))
                  / (CAST(c.m AS DOUBLE) * c.m)), 0) AS BIGINT) AS rs_e9
      FROM cum c JOIN bsum b ON b.m = c.m AND b.blk = c.blk
      GROUP BY c.m, c.blk, b.sxx, b.sx
      HAVING CAST(c.m AS HUGEINT) * b.sxx > b.sx * b.sx),
    per_m AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             ln(CAST(sum(rs_e9) AS DOUBLE) / count(*) / 1e9) AS ly,
             ln(CAST(m AS DOUBLE)) AS lx
      FROM rs GROUP BY m),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_sizes,
             (count(*) * sum(lx * ly) - sum(lx) * sum(ly))
             / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)) AS h
      FROM per_m)
    SELECT n_sizes, round(h, 6) AS hurst_h,
           (SELECT CAST(sum(n_blocks) AS BIGINT) FROM per_m) AS n_blocks_total
    FROM fit
    """,
    tags=("timeseries", "longmemory", "exact-arith"),
)
def q_hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does daily revenue have long memory (H > 0.5) or mean-revert
    (H < 0.5)? Classic R/S: per m-day block, range of cumulative
    deviations over population std, averaged per m (each block ratio an
    e9 integer first -- order-free), H = OLS slope of ln(R/S) on ln(m).
    Deviations stay exact by m-scaling (dev_m = m*prefix - (j+1)*sum);
    every window is PARTITIONED by (m, block). Degenerate constant
    blocks (S = 0) drop via the HAVING guard."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    s = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("bigint").alias("i"),
        F.col("x").cast(_DEC).alias("x"),
    )
    ms = F.explode(F.array(*[F.lit(m) for m in _HURST_MS])).alias("m")
    blocks = s.select("*", ms).select(
        "m",
        F.expr("i DIV m").alias("blk"),
        (F.col("i") % F.col("m")).alias("j"),
        "x",
        F.count(F.lit(1))
        .over(Window.partitionBy("m", F.expr("i DIV m")))
        .alias("bn"),
    )
    full_blocks = blocks.where(F.col("bn") == F.col("m"))
    bsum = full_blocks.groupBy("m", "blk").agg(
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast(_DEC).alias("sxx"),
    )
    wblk = (
        Window.partitionBy("m", "blk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = full_blocks.join(bsum, ["m", "blk"]).select(
        "m",
        "blk",
        "j",
        "sx",
        "sxx",
        (
            F.col("m").cast(_DEC) * F.sum("x").over(wblk)
            - (F.col("j") + 1).cast(_DEC) * F.col("sx")
        ).alias("dev_m"),
    )
    md = F.col("m").cast("double")
    r_over_m = (
        F.max("dev_m") - F.least(F.min("dev_m"), F.lit(0).cast(_DEC))
    ).cast("double") / md
    s_pop = F.sqrt(
        (md * F.max("sxx").cast("double") - F.max("sx").cast("double") * F.max("sx").cast("double"))
        / (md * md)
    )
    rs = (
        cum.groupBy("m", "blk")
        .agg(
            F.round(F.lit(1e9) * r_over_m / s_pop, 0)
            .cast("bigint")
            .alias("rs_e9"),
            (F.col("m").cast(_DEC) * F.max("sxx") - F.max("sx") * F.max("sx")).alias(
                "var_num"
            ),
        )
        .where(F.col("var_num") > 0)
    )
    per_m = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.log(F.sum("rs_e9").cast("double") / F.count(F.lit(1)) / 1e9).alias("ly"),
        F.log(F.col("m").cast("double")).alias("lx"),
    )
    fit = per_m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sizes"),
        (
            (F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly"))
            / (F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx"))
        ).alias("h"),
        F.sum("n_blocks").cast("bigint").alias("n_blocks_total"),
    )
    return fit.select("n_sizes", F.round("h", 6).alias("hurst_h"), "n_blocks_total")


# ---------------------------------------------------------------------------
# Croston's method: intermittent-demand forecast per part.
# ---------------------------------------------------------------------------
@register(
    "croston_intermittent_demand",
    f"""
    WITH demand AS (
      SELECT l.l_partkey AS pk, o.o_orderdate AS d,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS z
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    seq AS (
      SELECT pk, d, z,
             CAST(row_number() OVER (PARTITION BY pk ORDER BY d) AS BIGINT) AS i,
             date_diff('day',
               lag(d) OVER (PARTITION BY pk ORDER BY d), d) AS gap,
             CAST(count(*) OVER (PARTITION BY pk) AS BIGINT) AS n_demands
      FROM demand),
    keep AS (
      SELECT * FROM seq WHERE n_demands >= 5
        AND pk IN (SELECT pk FROM seq WHERE n_demands >= 5
                   GROUP BY pk ORDER BY pk LIMIT 20)),
    ew AS (
      SELECT pk, i, n_demands,
             round(power({_CROSTON_R}, i) * sum(
               CASE WHEN i = 1 THEN z / power({_CROSTON_R}, 1)
                    ELSE {_CROSTON_A} * z / power({_CROSTON_R}, i) END)
               OVER (PARTITION BY pk ORDER BY i ROWS UNBOUNDED PRECEDING), 8)
               AS z_hat,
             CASE WHEN i >= 2 THEN
               round(power({_CROSTON_R}, i - 1) * sum(
                 CASE WHEN i = 2 THEN gap / power({_CROSTON_R}, 1)
                      WHEN i > 2 THEN {_CROSTON_A} * gap / power({_CROSTON_R}, i - 1)
                 END)
                 OVER (PARTITION BY pk ORDER BY i ROWS UNBOUNDED PRECEDING), 8)
             END AS p_hat
      FROM keep),
    final AS (
      SELECT pk, max(n_demands) AS n_demands,
             max(CASE WHEN i = n_demands THEN z_hat END) AS z_hat,
             max(CASE WHEN i = n_demands THEN p_hat END) AS p_hat
      FROM ew GROUP BY pk)
    SELECT CAST(pk AS BIGINT) AS pk, CAST(n_demands AS BIGINT) AS n_demands,
           round(z_hat, 6) AS size_ewma,
           round(p_hat, 6) AS interval_ewma_days,
           round(z_hat / p_hat, 6) AS demand_per_day
    FROM final
    """,
    tags=("forecast", "intermittent", "supply-chain"),
)
def q_croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston forecast for lumpy demand: per part, EWMA (alpha=0.2) of
    nonzero demand sizes and of inter-demand gaps, both unrolled with
    the ewma_smoothing rescale trick (u_i = term/r^i, partitioned
    prefix sum, multiply back -- each EWMA rounded to 8 decimals so the
    division sees identical operands). Forecast = size / interval. All
    windows PARTITIONED by part; the bounded 20-part output keeps the
    report dashboard-shaped (first 20 eligible part ids, identical
    selection both engines)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    demand = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_partkey").alias("pk"), F.col("o_orderdate").alias("d"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("z"))
    )
    wp = Window.partitionBy("pk").orderBy("d")
    seq = demand.select(
        "pk",
        "z",
        F.row_number().over(wp).cast("bigint").alias("i"),
        F.datediff(F.col("d"), F.lag("d").over(wp)).cast("bigint").alias("gap"),
        F.count(F.lit(1)).over(Window.partitionBy("pk")).cast("bigint").alias(
            "n_demands"
        ),
    )
    eligible = (
        seq.where(F.col("n_demands") >= 5)
        .select("pk")
        .distinct()
        .orderBy("pk")
        .limit(20)
    )
    keep = seq.join(F.broadcast(eligible), "pk")
    r, a = _CROSTON_R, _CROSTON_A
    wcum = Window.partitionBy("pk").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    uz = F.when(F.col("i") == 1, F.col("z") / F.pow(F.lit(r), F.lit(1.0))).otherwise(
        F.lit(a) * F.col("z") / F.pow(F.lit(r), F.col("i").cast("double"))
    )
    up = (
        F.when(F.col("i") == 2, F.col("gap") / F.pow(F.lit(r), F.lit(1.0)))
        .when(
            F.col("i") > 2,
            F.lit(a) * F.col("gap") / F.pow(F.lit(r), (F.col("i") - 1).cast("double")),
        )
    )
    ew = keep.select(
        "pk",
        "i",
        "n_demands",
        F.round(
            F.pow(F.lit(r), F.col("i").cast("double")) * F.sum(uz).over(wcum), 8
        ).alias("z_hat"),
        F.when(
            F.col("i") >= 2,
            F.round(
                F.pow(F.lit(r), (F.col("i") - 1).cast("double"))
                * F.sum(up).over(wcum),
                8,
            ),
        ).alias("p_hat"),
    )
    final = ew.groupBy("pk").agg(
        F.max("n_demands").alias("n_demands"),
        F.max(F.when(F.col("i") == F.col("n_demands"), F.col("z_hat"))).alias("z_hat"),
        F.max(F.when(F.col("i") == F.col("n_demands"), F.col("p_hat"))).alias("p_hat"),
    )
    return final.select(
        F.col("pk").cast("bigint").alias("pk"),
        F.col("n_demands").cast("bigint").alias("n_demands"),
        F.round("z_hat", 6).alias("size_ewma"),
        F.round("p_hat", 6).alias("interval_ewma_days"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("demand_per_day"),
    )
