"""Extension batch 211 (round 8): two directed-graph structure reads
on the nation payment network that the centrality/community tier
doesn't cover -- the rich-club coefficient (do high-degree hubs trade
preferentially with EACH OTHER?) and edge reciprocity (is value flow
two-way?). Both are pure distributed joins/aggregations over the
bounded nation graph -- no folds, no collects; exact integer counts
under every ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PAY_SQL = """
    pay AS MATERIALIZED (
      SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2)
"""


def _pay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("na"), F.col("s_nationkey").alias("nb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


@register(
    "payment_reciprocity",
    f"""
    WITH {_PAY_SQL},
    rev AS (SELECT nb AS na, na AS nb, cnt FROM pay)
    SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
           CAST(sum(CASE WHEN r.cnt IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reciprocated,
           round(CAST(sum(CASE WHEN r.cnt IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS edge_reciprocity,
           round(CAST(sum(CASE WHEN r.cnt IS NOT NULL
                          THEN least(p.cnt, r.cnt) ELSE 0 END) AS DOUBLE)
                 / sum(p.cnt), 6) AS weight_reciprocity
    FROM pay p LEFT JOIN rev r ON r.na = p.na AND r.nb = p.nb
    """,
    tags=("graph", "directed", "exact-arith"),
)
def q_payment_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the directed nation payment graph (buyer-nation
    -> supplier-nation line counts): the share of directed edges whose
    reverse edge exists, and the weighted variant (sum of min(w_ij,
    w_ji) over total weight -- the mutually-covered flow share). High
    reciprocity = two-way trade; near-complete synthetic graphs read
    ~1, which is itself the null to contrast real sparse ledgers
    against."""
    pay = _pay(spark, sf_dir)
    rev = pay.select(
        F.col("nb").alias("na"), F.col("na").alias("nb"),
        F.col("cnt").alias("rcnt"),
    )
    j = pay.join(rev, ["na", "nb"], "left")
    recip = F.sum(F.when(F.col("rcnt").isNotNull(), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
        recip.cast("bigint").alias("n_reciprocated"),
        F.round(recip.cast("double") / F.count(F.lit(1)), 6).alias(
            "edge_reciprocity"
        ),
        F.round(
            F.sum(
                F.when(
                    F.col("rcnt").isNotNull(),
                    F.least(F.col("cnt"), F.col("rcnt")),
                ).otherwise(0)
            ).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("weight_reciprocity"),
    )


@register(
    "payment_rich_club",
    f"""
    WITH {_PAY_SQL},
    und AS (
      SELECT DISTINCT least(na, nb) AS a, greatest(na, nb) AS b
      FROM pay),
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS k FROM (
        SELECT a AS v FROM und UNION ALL SELECT b FROM und) x
      GROUP BY v),
    ks AS (SELECT unnest(range(0, 24, 4)) AS kmin),
    club AS (
      SELECT ks.kmin,
             CAST(sum(CASE WHEN deg.k > ks.kmin THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_club
      FROM ks CROSS JOIN deg GROUP BY ks.kmin),
    ed AS (
      SELECT d1.k AS ka, d2.k AS kb
      FROM und u JOIN deg d1 ON d1.v = u.a JOIN deg d2 ON d2.v = u.b),
    club_edges AS (
      SELECT ks.kmin,
             CAST(sum(CASE WHEN ed.ka > ks.kmin AND ed.kb > ks.kmin
                      THEN 1 ELSE 0 END) AS BIGINT) AS e_club
      FROM ks CROSS JOIN ed GROUP BY ks.kmin)
    SELECT CAST(c.kmin AS BIGINT) AS k_min, c.n_club AS n_nodes,
           e.e_club AS n_edges,
           CASE WHEN c.n_club < 2 THEN NULL
                ELSE round(2.0 * e.e_club
                           / (c.n_club * (c.n_club - 1)), 6)
           END AS phi
    FROM club c JOIN club_edges e ON e.kmin = c.kmin
    """,
    tags=("graph", "structure", "exact-arith"),
)
def q_payment_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) of the undirected payment graph:
    for degree cutoffs k in {0,4,...,20}, the edge density among nodes
    of degree > k. Rising phi(k) = hubs preferentially interconnected
    (the rich club); on a near-complete synthetic graph phi ~ 1
    everywhere, the documented null."""
    pay = _pay(spark, sf_dir)
    und = (
        pay.select(
            F.least("na", "nb").alias("a"), F.greatest("na", "nb").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    ks = spark.range(0, 24, 4).select(F.col("id").alias("kmin"))
    club = ks.join(deg, deg["k"] > ks["kmin"], "left").groupBy("kmin").agg(
        F.count("v").cast("bigint").alias("n_club")
    )
    da = deg.select(F.col("v").alias("a"), F.col("k").alias("ka"))
    db = deg.select(F.col("v").alias("b"), F.col("k").alias("kb"))
    edges_k = (
        ks.crossJoin(F.broadcast(und.join(da, "a").join(db, "b")))
        .where((F.col("ka") > F.col("kmin")) & (F.col("kb") > F.col("kmin")))
        .groupBy("kmin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_club"))
    )
    out = (
        club.join(edges_k, "kmin", "left")
        .select(
            F.col("kmin").cast("bigint").alias("k_min"),
            F.col("n_club").alias("n_nodes"),
            F.coalesce("e_club", F.lit(0)).cast("bigint").alias("n_edges"),
            F.when(F.col("n_club") < 2, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    2.0
                    * F.coalesce("e_club", F.lit(0)).cast("double")
                    / (F.col("n_club") * (F.col("n_club") - 1)),
                    6,
                )
            )
            .alias("phi"),
        )
    )
    return out
