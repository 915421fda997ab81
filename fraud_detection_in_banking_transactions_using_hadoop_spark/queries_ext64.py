"""Extension batch 64: Hilbert-curve locality, Fisher price index, and
Nelson-Aalen cumulative hazard.

Scale notes (the 100 TB story per query):
- hilbert_locality is the better-locality sibling of zorder_locality:
  the Hilbert index visits grid-ADJACENT cells consecutively (Morton
  jumps at quadrant seams), so each file's (x, y) bounding box is
  tighter for the same key width. operators/layout.with_hilbert_key unrolls
  the stateful xy2d rotation as a linear projection chain (pure
  expressions, whole-stage codegen, no UDF); the oracle walks the same
  levels as chained CTEs. Grouping is one aggregate on the top key
  bits -- exactly the file-skipping statistic OPTIMIZE would produce.
- price_index_fisher computes Laspeyres / Paasche / Fisher price
  indexes between 1996 and 1997 over parts traded in both years.
  Per-part unit values keep exactness by cross-multiplying: the
  Laspeyres denominator collapses to sum(c0) EXACTLY ((c0/q0)*q0), and
  each cross term rounds to an e6 integer before the order-free
  HUGEINT sum. Two grouped aggregates + one equi-join on partkey.
- nelson_aalen_hazard is the cumulative-hazard twin of
  kaplan_meier_survival (same risk-set machinery, sum of d/n instead
  of product of 1 - d/n): per event-day terms round to e9 integers,
  the cumulative sum runs over the |distinct event days| spine
  (CALENDAR growth class), and Aalen's variance rides the same pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.layout import (
    hilbert_level_ctes,
    with_hilbert_key,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_HBITS = 6  # 64 x 64 grid


# ---------------------------------------------------------------------------
# Hilbert-curve cell locality profile.
# ---------------------------------------------------------------------------
def _hilbert_locality_sql() -> str:
    ctes = hilbert_level_ctes(
        "base", "user_id % 64", "CAST(floor(value) AS BIGINT) % 64", _HBITS
    )
    return f"""
    WITH base AS (
      SELECT user_id, value FROM events),
    {ctes},
    keyed AS (
      SELECT user_id % 64 AS x,
             CAST(floor(value) AS BIGINT) % 64 AS y,
             hilbert_d FROM h{_HBITS + 1})
    SELECT CAST(hilbert_d >> {_HBITS} AS BIGINT) AS h_cell,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
           CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
    FROM keyed GROUP BY 1
    """


@register("hilbert_locality", _hilbert_locality_sql(), tags=("layout", "hilbert"))
def q_hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group events by coarse Hilbert cell (top 6 of 12 key bits) and
    report each cell's (x, y) bounding box on the 64x64 grid. Because
    consecutive Hilbert indexes are always grid-adjacent, every 64-point
    cell is a CONNECTED region with a provably small box -- the
    invariant pytest asserts max span <= 16 vs Morton's worst-case
    full-width seam jumps. Pure expression chain + one aggregate."""
    ev = read_table(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("user_id") % 64).cast("bigint").alias("x"),
        (F.floor("value").cast("bigint") % 64).cast("bigint").alias("y"),
    )
    g = with_hilbert_key(pts, F.col("x"), F.col("y"), bits=_HBITS, out_col="hd")
    return g.groupBy(
        F.shiftright("hd", _HBITS).cast("bigint").alias("h_cell")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("x").cast("bigint").alias("x_min"),
        F.max("x").cast("bigint").alias("x_max"),
        F.min("y").cast("bigint").alias("y_min"),
        F.max("y").cast("bigint").alias("y_max"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes, 1996 -> 1997.
# ---------------------------------------------------------------------------
@register(
    "price_index_fisher",
    """
    WITH py AS (
      SELECT l.l_partkey AS pk,
             date_part('year', o.o_orderdate) AS yr,
             CAST(sum(round(l.l_extendedprice * 100, 0)) AS BIGINT) AS c,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE date_part('year', o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2),
    common AS (
      SELECT a.pk, a.c AS c0, a.q AS q0, b.c AS c1, b.q AS q1
      FROM py a JOIN py b ON a.pk = b.pk AND a.yr = 1996 AND b.yr = 1997),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(CAST(c0 AS HUGEINT)) AS HUGEINT) AS sc0,
             CAST(sum(CAST(c1 AS HUGEINT)) AS HUGEINT) AS sc1,
             CAST(sum(CAST(round(1000000.0 * c1 * q0 / q1, 0) AS HUGEINT))
                  AS HUGEINT) AS l_num_e6,
             CAST(sum(CAST(round(1000000.0 * c0 * q1 / q0, 0) AS HUGEINT))
                  AS HUGEINT) AS p_den_e6
      FROM common)
    SELECT n_parts,
           round(CAST(l_num_e6 AS DOUBLE) / 1000000.0 / CAST(sc0 AS DOUBLE), 6)
             AS laspeyres,
           round(1000000.0 * CAST(sc1 AS DOUBLE) / CAST(p_den_e6 AS DOUBLE), 6)
             AS paasche,
           round(sqrt((CAST(l_num_e6 AS DOUBLE) / 1000000.0 / CAST(sc0 AS DOUBLE))
                      * (1000000.0 * CAST(sc1 AS DOUBLE) / CAST(p_den_e6 AS DOUBLE))), 6)
             AS fisher
    FROM sums
    """,
    tags=("econ", "index", "exact-arith"),
)
def q_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did realized part prices rise 1996 -> 1997? Unit values are
    (cents sold / units sold) per part-year; Laspeyres weights by base
    quantities, Paasche by current, Fisher is their geometric mean. The
    Laspeyres denominator is EXACTLY sum(c0) (the q0's cancel); every
    cross term (c1*q0/q1, c0*q1/q0) rounds to an e6 integer before the
    HUGEINT sum, so both engines divide identical numerators."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    py = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(F.col("l_partkey").alias("pk"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0)).cast("bigint").alias("c"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
        )
    )
    a = py.where(F.col("yr") == 1996).select(
        "pk", F.col("c").alias("c0"), F.col("q").alias("q0")
    )
    b = py.where(F.col("yr") == 1997).select(
        "pk", F.col("c").alias("c1"), F.col("q").alias("q1")
    )
    common = a.join(b, "pk")
    sums = common.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("c0").cast(_DEC)).cast(_DEC).alias("sc0"),
        F.sum(F.col("c1").cast(_DEC)).cast(_DEC).alias("sc1"),
        F.sum(
            F.round(F.lit(1000000.0) * F.col("c1") * F.col("q0") / F.col("q1"), 0).cast(_DEC)
        )
        .cast(_DEC)
        .alias("l_num_e6"),
        F.sum(
            F.round(F.lit(1000000.0) * F.col("c0") * F.col("q1") / F.col("q0"), 0).cast(_DEC)
        )
        .cast(_DEC)
        .alias("p_den_e6"),
    )
    lasp = F.col("l_num_e6").cast("double") / 1000000.0 / F.col("sc0").cast("double")
    paas = 1000000.0 * F.col("sc1").cast("double") / F.col("p_den_e6").cast("double")
    return sums.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard for days-to-first-purchase.
# ---------------------------------------------------------------------------
@register(
    "nelson_aalen_hazard",
    """
    WITH per_user AS (
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
             CAST(round(1e9 * CAST(d AS DOUBLE) / n_risk, 0) AS BIGINT) AS h_e9,
             CAST(round(1e9 * CAST(d AS DOUBLE) * (n_risk - d)
                        / (CAST(n_risk AS DOUBLE) * n_risk * n_risk), 0) AS BIGINT)
               AS v_e9
      FROM risk WHERE d > 0)
    SELECT CAST(t AS BIGINT) AS t_days, d AS n_events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           round(CAST(sum(h_e9) OVER (ORDER BY t) AS DOUBLE) / 1e9, 6)
             AS cum_hazard,
           round(exp(-CAST(sum(h_e9) OVER (ORDER BY t) AS DOUBLE) / 1e9), 6)
             AS na_survival,
           round(CAST(sum(v_e9) OVER (ORDER BY t) AS DOUBLE) / 1e9, 6)
             AS var_hazard
    FROM steps
    """,
    tags=("survival", "nelson-aalen", "exact-arith"),
)
def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative hazard of first purchase: H(t) = sum d_i/n_i over
    event days <= t, with na_survival = exp(-H) (the always-defined
    alternative to the KM product) and Aalen's variance
    sum d(n-d)/n^3. Same risk-set machinery as kaplan_meier_survival;
    per-day terms round to e9 integers before the cumulative sum over
    the |distinct event days| spine (CALENDAR class)."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("p_day"),
    )
    obs = per_user.select(
        F.when(
            F.col("p_day").isNotNull(), F.datediff("p_day", "first_day")
        )
        .otherwise(F.datediff("last_day", "first_day"))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("p_day").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    allt = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("ending"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    total = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = allt.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum("ending").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    nd = F.col("n_risk").cast("double")
    steps = risk.where(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.round(F.lit(1e9) * F.col("d").cast("double") / nd, 0)
        .cast("bigint")
        .alias("h_e9"),
        F.round(
            F.lit(1e9) * F.col("d").cast("double") * (F.col("n_risk") - F.col("d"))
            / (nd * nd * nd),
            0,
        )
        .cast("bigint")
        .alias("v_e9"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        F.col("t").alias("t_days"),
        F.col("d").alias("n_events"),
        F.col("n_risk").alias("n_at_risk"),
        F.round(F.sum("h_e9").over(wcum).cast("double") / 1e9, 6).alias("cum_hazard"),
        F.round(F.exp(-F.sum("h_e9").over(wcum).cast("double") / 1e9), 6).alias(
            "na_survival"
        ),
        F.round(F.sum("v_e9").over(wcum).cast("double") / 1e9, 6).alias("var_hazard"),
    )
