"""Extension batch 55: dedup cluster-size histogram and a
share-of-parent cascade.

Scale notes (the 100 TB story per query):
- cluster_size_histogram is the number a dedup rollout is judged by:
  the size distribution of near-dup clusters (how much of the corpus
  collapses, and whether a mega-cluster is forming). Reuses the
  production CC pipeline (adaptive union-find / large-star), then two
  tiny groupBys: cluster -> size, size -> frequency. The singleton
  share and max size are the rollout gates.
- share_cascade is the drill-down dashboard identity: each customer's
  share of their nation's revenue, each nation's share of its
  region's, and the region's share of the total, all as exact ppm
  integers from partitioned window sums -- the per-level shares
  multiply back to the global share (invariant-pinned within floor
  error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import _SHINGLE_PAIRS_CTE
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Cluster-size histogram of the near-dup components.
# ---------------------------------------------------------------------------
@register(
    "cluster_size_histogram",
    f"""
    WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
    edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(node, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
    comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
    assigned AS (
      SELECT d.doc_id, coalesce(comp.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    ),
    sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS sz FROM assigned
              GROUP BY cluster)
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
    tags=("dedup", "graph", "histogram"),
)
def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size -> frequency histogram of the near-dup connected
    components (singletons included): the dedup rollout dashboard.
    Runs the production connected_components operator (adaptive
    driver union-find / large-star loop), then two tiny groupBys."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
        connected_components,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    comp = connected_components(pairs, "doc_a", "doc_b")
    comp = comp.withColumnRenamed("cluster", "_cl")
    assigned = docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce(F.col("_cl"), F.col("doc_id")).alias("cluster")
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Share-of-parent cascade: customer -> nation -> region -> total.
# ---------------------------------------------------------------------------
@register(
    "share_cascade",
    f"""
    WITH spend AS (
      SELECT c.c_custkey, n.n_nationkey AS nk, n.n_regionkey AS rk,
             CAST(sum({_CENTS}) AS BIGINT) AS s
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c.c_custkey, n.n_nationkey, n.n_regionkey
    ),
    shares AS (
      SELECT c_custkey, nk, rk, s,
             sum(s) OVER (PARTITION BY nk) AS nation_s,
             sum(s) OVER (PARTITION BY rk) AS region_s,
             sum(s) OVER () AS total_s
      FROM spend
    )
    SELECT c_custkey, nk AS nationkey, rk AS regionkey, s AS spend_cents,
           CAST((1000000 * s) // nation_s AS BIGINT) AS share_of_nation_ppm,
           CAST((1000000 * nation_s) // region_s AS BIGINT)
             AS nation_share_of_region_ppm,
           CAST((1000000 * region_s) // total_s AS BIGINT)
             AS region_share_ppm
    FROM shares
    """,
    tags=("analytics", "share", "hierarchy"),
)
def q_share_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three nested shares as exact ppm integers: nation/region from
    partitioned window sums, the grand total as a 1-row broadcast
    scalar (a data-grain global window would single-task at scale) --
    the drill-down identity every
    revenue dashboard renders. Shares at each level multiply back to
    the global share within floor-division error (invariant-pinned)."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk"))
        .agg(F.sum(F.expr(_CENTS)).cast("bigint").alias("s"))
    )
    total = spend.agg(F.sum("s").cast("bigint").alias("total_s"))
    shares = spend.select(
        "c_custkey",
        "nk",
        "rk",
        "s",
        F.sum("s").over(Window.partitionBy("nk")).alias("nation_s"),
        F.sum("s").over(Window.partitionBy("rk")).alias("region_s"),
    ).crossJoin(F.broadcast(total))
    return shares.select(
        "c_custkey",
        F.col("nk").alias("nationkey"),
        F.col("rk").alias("regionkey"),
        F.col("s").alias("spend_cents"),
        F.expr("CAST((1000000 * s) DIV nation_s AS BIGINT)").alias("share_of_nation_ppm"),
        F.expr("CAST((1000000 * nation_s) DIV region_s AS BIGINT)").alias(
            "nation_share_of_region_ppm"
        ),
        F.expr("CAST((1000000 * region_s) DIV total_s AS BIGINT)").alias(
            "region_share_ppm"
        ),
    )
