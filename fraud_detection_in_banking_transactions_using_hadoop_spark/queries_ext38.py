"""Extension batch 38: Chatterjee's xi dependence coefficient, price
elasticity, and ABC-XYZ inventory classification.

Scale notes (the 100 TB story per query):
- chatterjee_xi is the modern (2020) rank correlation that detects
  ARBITRARY functional dependence, not just monotone trends: sort by
  x, take consecutive |rank(y)| differences. On the calendar-bounded
  daily summary both orderings are whitelisted bounded windows; ranks
  and the sum of absolute differences are exact integers, xi is one
  closing division.
- price_elasticity is the log-log demand fit: unit-price bands from
  exact cent arithmetic, band-level (ln p, ln q) as e8 integers, OLS
  slope over the <=21-band summary via exact sums -- many-models OLS
  (grouped_ols) specialized to the price-demand curve every pricing
  team fits.
- abc_xyz_classes is the operations-planning classic: ABC from the
  cumulative demand share under the two-level DISTRIBUTED rank
  (prefix_sum of quantity under the global desc order -- no
  single-partition window over parts), XYZ from the weekly demand
  coefficient of variation per part. Both letters derive from exact
  integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Chatterjee's xi: daily revenue as a function of daily order count.
# ---------------------------------------------------------------------------
@register(
    "chatterjee_xi",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS x,
             CAST(sum({_CENTS}) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    ranked AS (
      SELECT d, x, CAST(row_number() OVER (ORDER BY y, d) AS BIGINT) AS r
      FROM days
    ),
    seq AS (
      SELECT r, lead(r) OVER (ORDER BY x, d) AS r2 FROM ranked
    ),
    agg AS (
      SELECT CAST(sum(abs(r2 - r)) AS BIGINT) AS s,
             CAST(count(*) + 1 AS BIGINT) AS n
      FROM seq WHERE r2 IS NOT NULL
    )
    SELECT n, s AS sum_abs_rank_diff,
           round(1 - 3.0 * s / (CAST(n AS DOUBLE) * n - 1), 6) AS xi
    FROM agg
    """,
    tags=("stats", "correlation", "dependence"),
)
def q_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xi = 1 - 3*sum|r_{i+1}-r_i|/(n^2-1) with y-ranks under the
    unique (y, d) order and the sequence ordered by (x, d) -- both
    deterministic total orders on the bounded daily summary. Detects
    any functional relationship between order count and revenue;
    integer rank arithmetic, one closing double."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum(F.expr(_CENTS)).cast("bigint").alias("y"),
    )
    ranked = days.select(
        "d", "x", F.row_number().over(Window.orderBy("y", "d")).cast("bigint").alias("r")
    )
    seq = ranked.select("r", F.lead("r").over(Window.orderBy("x", "d")).alias("r2"))
    agg = seq.where(F.col("r2").isNotNull()).agg(
        F.sum(F.abs(F.col("r2") - F.col("r"))).cast("bigint").alias("s"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n"),
    )
    return agg.select(
        "n",
        F.col("s").alias("sum_abs_rank_diff"),
        F.round(
            1 - 3.0 * F.col("s") / (F.col("n").cast("double") * F.col("n") - 1), 6
        ).alias("xi"),
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity of demand over unit-price bands.
# ---------------------------------------------------------------------------
_BAND_CENTS = 50000  # $500 unit-price bands
_MAX_BAND = 20


@register(
    "price_elasticity",
    f"""
    WITH units AS (
      SELECT least(CAST(round(100 * l_extendedprice / l_quantity, 0)
                        AS BIGINT) // {_BAND_CENTS}, {_MAX_BAND}) AS band,
             CAST(round(100 * l_extendedprice / l_quantity, 0) AS BIGINT)
               AS unit_cents,
             CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_quantity > 0
    ),
    bands AS (
      SELECT band, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(unit_cents) AS BIGINT) AS sp,
             CAST(sum(q) AS BIGINT) AS sq
      FROM units GROUP BY band HAVING sum(q) > 0
    ),
    pts AS (
      SELECT CAST(round(100000000.0 * ln(CAST(sp AS DOUBLE) / n), 0) AS BIGINT)
               AS lp_e8,
             CAST(round(100000000.0 * ln(CAST(sq AS DOUBLE)), 0) AS BIGINT)
               AS lq_e8
      FROM bands
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS k, CAST(sum(lp_e8) AS HUGEINT) AS sx,
             CAST(sum(lq_e8) AS HUGEINT) AS sy,
             sum(CAST(lp_e8 AS HUGEINT) * lq_e8) AS sxy,
             sum(CAST(lp_e8 AS HUGEINT) * lp_e8) AS sxx
      FROM pts
    )
    SELECT CAST(k AS BIGINT) AS n_bands,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS elasticity
    FROM s
    """,
    tags=("econ", "regression", "pricing"),
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand elasticity: lineitems collapse to <=21 unit-price bands
    (exact cent arithmetic), band mean price and total quantity go
    through e8-integer logs, and the elasticity is the exact-sum OLS
    slope of ln q on ln p over the band summary. At 100 TB the fact
    table contributes exactly one groupBy."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    unit = F.round(100 * F.col("l_extendedprice") / F.col("l_quantity"), 0).cast("bigint")
    units = li.select(
        F.least(
            F.expr(
                f"CAST(round(100 * l_extendedprice / l_quantity, 0) AS BIGINT)"
                f" DIV {_BAND_CENTS}"
            ),
            F.lit(_MAX_BAND).cast("bigint"),
        ).alias("band"),
        unit.alias("unit_cents"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    bands = (
        units.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("unit_cents").cast("bigint").alias("sp"),
            F.sum("q").cast("bigint").alias("sq"),
        )
        .where(F.col("sq") > 0)
    )
    pts = bands.select(
        F.round(F.lit(100000000.0) * F.log(F.col("sp").cast("double") / F.col("n")), 0)
        .cast("bigint")
        .alias("lp_e8"),
        F.round(F.lit(100000000.0) * F.log(F.col("sq").cast("double")), 0)
        .cast("bigint")
        .alias("lq_e8"),
    )
    dec = "decimal(38,0)"
    s = pts.agg(
        F.count(F.lit(1)).cast(dec).alias("k"),
        F.sum("lp_e8").cast(dec).alias("sx"),
        F.sum("lq_e8").cast(dec).alias("sy"),
        F.sum(F.col("lp_e8").cast(dec) * F.col("lq_e8")).cast(dec).alias("sxy"),
        F.sum(F.col("lp_e8").cast(dec) * F.col("lp_e8")).cast(dec).alias("sxx"),
    )
    return s.select(
        F.col("k").cast("bigint").alias("n_bands"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            6,
        ).alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# ABC-XYZ classification of parts: demand share x demand variability.
# ---------------------------------------------------------------------------
@register(
    "abc_xyz_classes",
    """
    WITH demand AS (
      SELECT l.l_partkey AS part, CAST(l.l_quantity AS BIGINT) AS q,
             date_trunc('week', CAST(o.o_orderdate AS DATE)) AS wk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    weekly AS (
      SELECT part, wk, CAST(sum(q) AS BIGINT) AS wq
      FROM demand GROUP BY part, wk
    ),
    per AS (
      SELECT part, CAST(sum(wq) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(wq) AS BIGINT) AS s1,
             CAST(sum(wq * wq) AS BIGINT) AS s2
      FROM weekly GROUP BY part
    ),
    ranked AS (
      SELECT part, total, nw, s1, s2,
             sum(total) OVER (ORDER BY total DESC, part
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(total) OVER () AS grand
      FROM per
    )
    SELECT part, total AS total_qty,
           CAST((1000000 * cum) // grand AS BIGINT) AS cum_share_ppm,
           CASE WHEN (1000000 * cum) // grand <= 800000 THEN 'A'
                WHEN (1000000 * cum) // grand <= 950000 THEN 'B'
                ELSE 'C' END AS abc,
           CAST(round(1000000.0
             * sqrt(CAST(s2 AS DOUBLE) / nw
                    - (CAST(s1 AS DOUBLE) / nw) * (CAST(s1 AS DOUBLE) / nw))
             / (CAST(s1 AS DOUBLE) / nw), 0) AS BIGINT) AS cv_ppm,
           CASE WHEN round(1000000.0
                  * sqrt(CAST(s2 AS DOUBLE) / nw
                         - (CAST(s1 AS DOUBLE) / nw)
                           * (CAST(s1 AS DOUBLE) / nw))
                  / (CAST(s1 AS DOUBLE) / nw), 0) < 500000 THEN 'X'
                WHEN round(1000000.0
                  * sqrt(CAST(s2 AS DOUBLE) / nw
                         - (CAST(s1 AS DOUBLE) / nw)
                           * (CAST(s1 AS DOUBLE) / nw))
                  / (CAST(s1 AS DOUBLE) / nw), 0) < 1000000 THEN 'Y'
                ELSE 'Z' END AS xyz
    FROM ranked
    """,
    tags=("ops", "inventory", "classification"),
)
def q_abc_xyz_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC from the inclusive cumulative demand share under the global
    (total desc, part) order -- on Spark via the two-level distributed
    rank operator's prefix_sum, so no data-grain single-partition
    window -- and XYZ from the weekly-demand coefficient of variation
    (exact integer moments -> one double -> ppm). The oracle runs the
    plain window form; at scale the Spark plan is the one that
    survives."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    demand = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_partkey").alias("part"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.date_trunc("week", F.col("o_orderdate").cast("date")).alias("wk"),
    )
    weekly = demand.groupBy("part", "wk").agg(F.sum("q").cast("bigint").alias("wq"))
    per = weekly.groupBy("part").agg(
        F.sum("wq").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("nw"),
        F.sum("wq").cast("bigint").alias("s1"),
        F.sum(F.col("wq") * F.col("wq")).cast("bigint").alias("s2"),
    )
    ranked = with_global_rank(
        per,
        "total",
        [F.col("total").desc(), F.col("part")],
        ascending=False,
        prefix_sum={"cum": "total"},
    )
    grand = per.agg(F.sum("total").cast("bigint").alias("grand"))
    mean = F.col("s1").cast("double") / F.col("nw")
    cv = F.round(
        F.lit(1000000.0)
        * F.sqrt(F.col("s2").cast("double") / F.col("nw") - mean * mean)
        / mean,
        0,
    ).cast("bigint")
    share = F.expr("CAST((1000000 * cum) DIV grand AS BIGINT)")
    return (
        ranked.crossJoin(F.broadcast(grand))
        .select(
            "part",
            F.col("total").alias("total_qty"),
            share.alias("cum_share_ppm"),
            F.when(share <= 800000, "A").when(share <= 950000, "B").otherwise("C").alias("abc"),
            cv.alias("cv_ppm"),
            F.when(cv < 500000, "X").when(cv < 1000000, "Y").otherwise("Z").alias("xyz"),
        )
    )
