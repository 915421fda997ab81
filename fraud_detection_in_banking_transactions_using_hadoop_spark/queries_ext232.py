"""Extension batch 232 (round 11): incremental connected-components
maintenance -- the r10 verdict's item 6, extending the incremental
triad (dedup/IVF/LSH deltas) to the CLUSTER GRAPH itself.

ext198's cross-snapshot dedup already merges new LSH edges through the
old spanning forest, but that machinery was welded to the LSH
pipeline; operators/graph.cc_forest_merge factors it into a
first-class operator over ANY edge stream, and incremental_cc_update
exercises it on a THREE-snapshot replay: the near-dup pair set is
split deterministically into three arrival batches, snapshot 0 is
clustered from scratch, and each later batch folds in via
forest-UNION-delta -- the old EDGE set is never re-read. The DuckDB
oracle is the full recompute over all pairs at once (verbatim the
dedup_clusters min-label formulation), so the hash gate IS the
incremental == full equivalence proof, now across two successive
folds rather than ext198's one.

Exactness argument (pytest-fuzzed in tests/test_ext232_invariants.py
against a reference union-find on random graphs): a spanning forest
preserves the component partition; min-label is associative across
merges; every CC node has degree >= 1 so components have size >= 2
and every old node survives into the forest. The delta-cost contract
(CC input rows == forest rows + delta rows, forest rows < old nodes)
is asserted by the same test file -- the property that makes this the
100 TB ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import (
    _SHINGLE_PAIRS_CTE,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "incremental_cc_update",
    f"""
    WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
    edges AS MATERIALIZED (SELECT DISTINCT a, b FROM (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs)),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(node, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
    comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
    SELECT d.doc_id, coalesce(comp.cluster, d.doc_id) AS cluster,
           CAST(coalesce(comp.cluster, d.doc_id) = d.doc_id AS INTEGER)
             AS is_canonical
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    """,
    tags=("dedup", "graph", "incremental", "scale-path"),
)
def q_incremental_cc_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-snapshot incremental CC replay (module docstring): pair
    edges arrive in three deterministic batches ((doc_a * 31 + doc_b)
    mod 3); snapshots 1 and 2 fold in via cc_forest_merge -- spanning
    forest + delta only, old edges never re-read. Oracle = full
    recompute; identical final assignment required bit-for-bit."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
        cc_forest_merge,
        connected_components,
    )

    from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
        spread,
    )

    docs = read_table(spark, sf_dir, "documents")
    # r14 A/B (A-B-A controlled, sf0.1): spreading the single-row-group
    # docs scan under the md5 shingle/minhash map stage cuts the warm
    # replay 4.2 -> 3.1 s here (the 3-fold replay pays the signature
    # pipeline inside its snapshot pin). The same spread measured
    # NEUTRAL on minhash_lsh_pairs / dedup_clusters / simhash_docs, so
    # it stays a per-call-site decision, not an operator default.
    sigs = minhash_signatures(
        spread(docs), "doc_id", "text", n_hashes=8, shingle_w=3
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    snap = pairs.withColumn(
        "snap", F.pmod(F.col("doc_a") * 31 + F.col("doc_b"), F.lit(3))
    ).localCheckpoint(eager=True)

    # snap is checkpointed above, so every slice of it is cheap lineage:
    # skip the redundant per-fold materialization jobs inside the
    # operators (input_materialized / delta_materialized).
    state = connected_components(snap.where("snap = 0"), input_materialized=True)
    for k in (1, 2):
        state = cc_forest_merge(
            state, snap.where(f"snap = {k}"), delta_materialized=True
        )

    return docs.join(state, docs.doc_id == state.node, "left").select(
        "doc_id",
        F.coalesce("cluster", "doc_id").alias("cluster"),
        (F.coalesce("cluster", "doc_id") == F.col("doc_id"))
        .cast("int")
        .alias("is_canonical"),
    )
