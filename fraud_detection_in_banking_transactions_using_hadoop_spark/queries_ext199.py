"""Extension batch 199 (round 8): actuarial claims reserving -- the
chain-ladder method and its two classic companions over the order-year
x ship-lag development triangle (origin = order year, development =
ship-lag years clamped to [0, 5]; the valuation year is the max ship
year, taken DYNAMICALLY per the testdata discipline).

Claims reserving is the canonical "run-off triangle" workload: a 100 TB
ledger aggregates to a tiny triangle (origins x devs), so the heavy
part is one distributed join+groupBy and everything after is exact
arithmetic on the bounded triangle.

Cross-engine discipline: every triangle cell is an exact BIGINT cent
sum; development factors are single divisions of exact integers; the
cumulative-product development chain (CDF) is generated ONCE as shared
SQL text (explicit left-assoc products, no numeric literals that could
hit the Spark DECIMAL parse trap -- CAST(1 AS DOUBLE)); dollar-valued
ultimates floor() to BIGINT before output (the double->BIGINT cast
parity rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEVS = 5  # dev years 0..5, lag capped into the last bucket
_ORIGINS = 6  # origins vy-5 .. vy


def _cdf_case(age_col: str) -> str:
    """CASE mapping an origin's age (= vy - origin, the latest observed
    dev) to its remaining development factor product f_age*...*f_4.
    Shared SQL text for both engines; explicit left-assoc chain."""
    whens = []
    for age in range(_DEVS + 1):
        if age >= _DEVS:
            prod = "CAST(1 AS DOUBLE)"
        else:
            prod = " * ".join(f"f{j}" for j in range(age, _DEVS))
        whens.append(f"WHEN {age} THEN {prod}")
    return f"CASE {age_col} " + " ".join(whens) + " END"


_TRIANGLE_SQL = f"""
    tri0 AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS origin,
             least(greatest(CAST(year(l.l_shipdate) AS BIGINT)
                            - CAST(year(o.o_orderdate) AS BIGINT), 0),
                   {_DEVS}) AS dev,
             CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    vy AS (SELECT max(origin + dev) AS v FROM tri0
           WHERE cents > 0),
    tri AS (
      SELECT t.origin, t.dev, t.cents FROM tri0 t, vy
      WHERE t.origin >= vy.v - {_ORIGINS - 1} AND t.origin + t.dev <= vy.v),
    cum AS (
      SELECT origin, dev,
             CAST(sum(cents) OVER (PARTITION BY origin ORDER BY dev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c
      FROM tri),
    fac AS (
      SELECT a.dev AS j,
             CAST(sum(b.c) AS BIGINT) AS sum_next_cents,
             CAST(sum(a.c) AS BIGINT) AS sum_cur_cents
      FROM cum a
      JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1
      GROUP BY a.dev)
"""


@register(
    "chain_ladder_factors",
    f"""
    WITH {_TRIANGLE_SQL}
    SELECT j AS dev_from, j + 1 AS dev_to, sum_next_cents, sum_cur_cents,
           round(CAST(sum_next_cents AS DOUBLE) / sum_cur_cents, 6)
             AS dev_factor
    FROM fac ORDER BY j
    """,
    tags=("actuarial", "reserving", "triangle"),
)
def q_chain_ladder_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development factors over the order-year x ship-lag
    run-off triangle: f_j = sum_i C(i,j+1) / sum_i C(i,j), summed over
    exactly the origins where BOTH cells are observed (the join on the
    next dev enforces the same origin set in numerator and denominator
    -- the volume-weighted average of individual development ratios).
    Cent sums are exact BIGINTs; the factor is one division, rounded
    once."""
    cum = _cumulative_triangle(spark, sf_dir)
    nxt = cum.select(
        F.col("origin").alias("o2"),
        (F.col("dev") - 1).alias("j"),
        F.col("c").alias("c_next"),
    )
    fac = (
        cum.join(nxt, (F.col("origin") == F.col("o2")) & (F.col("dev") == F.col("j")))
        .groupBy(F.col("dev").alias("j"))
        .agg(
            F.sum("c_next").cast("bigint").alias("sum_next_cents"),
            F.sum("c").cast("bigint").alias("sum_cur_cents"),
        )
    )
    return fac.select(
        F.col("j").alias("dev_from"),
        (F.col("j") + 1).alias("dev_to"),
        "sum_next_cents",
        "sum_cur_cents",
        F.round(
            F.col("sum_next_cents").cast("double") / F.col("sum_cur_cents"), 6
        ).alias("dev_factor"),
    ).orderBy("dev_from")


def _cumulative_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared distributed head: the cumulative run-off triangle
    C(origin, dev) in exact cents, restricted to the last 6 origins and
    the observed region origin + dev <= valuation year."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    tri0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("origin"),
            F.least(
                F.greatest(
                    F.year("l_shipdate").cast("bigint")
                    - F.year("o_orderdate").cast("bigint"),
                    F.lit(0),
                ),
                F.lit(_DEVS),
            ).alias("dev"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    vy = tri0.where(F.col("cents") > 0).agg(
        F.max(F.col("origin") + F.col("dev")).alias("v")
    )
    tri = (
        tri0.crossJoin(F.broadcast(vy))
        .where(
            (F.col("origin") >= F.col("v") - (_ORIGINS - 1))
            & (F.col("origin") + F.col("dev") <= F.col("v"))
        )
        .select("origin", "dev", "cents", "v")
    )
    w = (
        Window.partitionBy("origin")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return tri.select(
        "origin", "dev", F.sum("cents").over(w).cast("bigint").alias("c"), "v"
    )


@register(
    "chain_ladder_ultimates",
    f"""
    WITH {_TRIANGLE_SQL},
    f AS (
      SELECT {", ".join(
          f"max(CASE WHEN j = {j} THEN CAST(sum_next_cents AS DOUBLE)"
          f" / sum_cur_cents ELSE NULL END) AS f{j}" for j in range(_DEVS)
      )}
      FROM fac),
    latest AS (
      SELECT c.origin, vy.v - c.origin AS age,
             CAST(max(c.c) AS BIGINT) AS latest_cents
      FROM cum c, vy GROUP BY c.origin, vy.v)
    SELECT l.origin, l.age, l.latest_cents,
           CAST(floor(l.latest_cents * ({_cdf_case("l.age")})) AS BIGINT)
             AS ultimate_cents,
           CAST(floor(l.latest_cents * ({_cdf_case("l.age")})) AS BIGINT)
             - l.latest_cents AS reserve_cents
    FROM latest l CROSS JOIN f
    ORDER BY l.origin
    """,
    tags=("actuarial", "reserving", "triangle"),
)
def q_chain_ladder_ultimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder ultimates and reserves per origin year: the latest
    diagonal C(i, vy - i) developed by the remaining factor product
    (the CDF), reserve = ultimate - latest. The factor chain is one
    shared CASE expression (explicit products, age 5 = fully developed),
    and the double ultimate floor()s to BIGINT before output (cast
    parity rule). The whole tail of the query runs on the bounded
    triangle; only the cent aggregation touches the fact tables."""
    cum = _cumulative_triangle(spark, sf_dir)
    nxt = cum.select(
        F.col("origin").alias("o2"),
        (F.col("dev") - 1).alias("j"),
        F.col("c").alias("c_next"),
    )
    fac = (
        cum.join(nxt, (F.col("origin") == F.col("o2")) & (F.col("dev") == F.col("j")))
        .groupBy(F.col("dev").alias("j"))
        .agg(
            F.sum("c_next").cast("bigint").alias("sn"),
            F.sum("c").cast("bigint").alias("sc"),
        )
    )
    f1 = fac.agg(
        *[
            F.max(
                F.when(
                    F.col("j") == j,
                    F.col("sn").cast("double") / F.col("sc"),
                )
            ).alias(f"f{j}")
            for j in range(_DEVS)
        ]
    )
    latest = (
        cum.groupBy("origin", "v")
        .agg(F.max("c").cast("bigint").alias("latest_cents"))
        .select(
            "origin",
            (F.col("v") - F.col("origin")).alias("age"),
            "latest_cents",
        )
    )
    ult = F.expr(f"CAST(floor(latest_cents * ({_cdf_case('age')})) AS BIGINT)")
    return (
        latest.crossJoin(F.broadcast(f1))
        .select(
            "origin",
            "age",
            "latest_cents",
            ult.alias("ultimate_cents"),
            (ult - F.col("latest_cents")).alias("reserve_cents"),
        )
        .orderBy("origin")
    )


@register(
    "bornhuetter_ferguson_reserves",
    f"""
    WITH {_TRIANGLE_SQL},
    f AS (
      SELECT {", ".join(
          f"max(CASE WHEN j = {j} THEN CAST(sum_next_cents AS DOUBLE)"
          f" / sum_cur_cents ELSE NULL END) AS f{j}" for j in range(_DEVS)
      )}
      FROM fac),
    latest AS (
      SELECT c.origin, vy.v - c.origin AS age,
             CAST(max(c.c) AS BIGINT) AS latest_cents
      FROM cum c, vy GROUP BY c.origin, vy.v),
    expo AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS origin,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1),
    sev AS (
      SELECT CAST(sum(l.latest_cents) AS BIGINT) AS tot_cents,
             CAST(sum(e.n_orders) AS BIGINT) AS tot_orders
      FROM latest l JOIN expo e ON e.origin = l.origin)
    SELECT l.origin, l.age, l.latest_cents,
           CAST(e.n_orders AS BIGINT) AS n_orders,
           CAST(floor(CAST(e.n_orders AS DOUBLE) * s.tot_cents
                      / s.tot_orders) AS BIGINT) AS prior_cents,
           CAST(floor(l.latest_cents
                + (CAST(e.n_orders AS DOUBLE) * s.tot_cents / s.tot_orders)
                  * (CAST(1 AS DOUBLE)
                     - CAST(1 AS DOUBLE) / ({_cdf_case("l.age")})))
              AS BIGINT) AS bf_ultimate_cents
    FROM latest l
    JOIN expo e ON e.origin = l.origin
    CROSS JOIN sev s CROSS JOIN f
    ORDER BY l.origin
    """,
    tags=("actuarial", "reserving", "triangle"),
)
def q_bornhuetter_ferguson_reserves(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bornhuetter-Ferguson ultimates: U_BF = C + prior * (1 - 1/CDF),
    blending the chain-ladder development pattern with an a-priori
    expectation (here: origin-year order count x the overall observed
    severity per order -- an exposure-based prior derivable in-engine).
    Less responsive to a noisy latest diagonal than pure chain-ladder:
    the immature origins' reserves are anchored by exposure."""
    cum = _cumulative_triangle(spark, sf_dir)
    nxt = cum.select(
        F.col("origin").alias("o2"),
        (F.col("dev") - 1).alias("j"),
        F.col("c").alias("c_next"),
    )
    fac = (
        cum.join(nxt, (F.col("origin") == F.col("o2")) & (F.col("dev") == F.col("j")))
        .groupBy(F.col("dev").alias("j"))
        .agg(
            F.sum("c_next").cast("bigint").alias("sn"),
            F.sum("c").cast("bigint").alias("sc"),
        )
    )
    f1 = fac.agg(
        *[
            F.max(
                F.when(
                    F.col("j") == j,
                    F.col("sn").cast("double") / F.col("sc"),
                )
            ).alias(f"f{j}")
            for j in range(_DEVS)
        ]
    )
    latest = (
        cum.groupBy("origin", "v")
        .agg(F.max("c").cast("bigint").alias("latest_cents"))
        .select(
            "origin",
            (F.col("v") - F.col("origin")).alias("age"),
            "latest_cents",
        )
    )
    expo = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("origin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    le = latest.join(expo, "origin")
    sev = le.agg(
        F.sum("latest_cents").cast("bigint").alias("tot_cents"),
        F.sum("n_orders").cast("bigint").alias("tot_orders"),
    )
    prior = F.expr(
        "CAST(n_orders AS DOUBLE) * tot_cents / tot_orders"
    )
    bf = F.expr(
        "CAST(floor(latest_cents"
        " + (CAST(n_orders AS DOUBLE) * tot_cents / tot_orders)"
        f" * (CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE) / ({_cdf_case('age')})))"
        " AS BIGINT)"
    )
    return (
        le.crossJoin(F.broadcast(sev))
        .crossJoin(F.broadcast(f1))
        .select(
            "origin",
            "age",
            "latest_cents",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.expr("CAST(floor(CAST(n_orders AS DOUBLE) * tot_cents"
                   " / tot_orders) AS BIGINT)").alias("prior_cents"),
            bf.alias("bf_ultimate_cents"),
        )
        .orderBy("origin")
    )
