"""ext198: incremental MinHash dedup -- merge-semantics unit tests on
hand-built band tables (bridge merges, forest reuse, singleton
adoption), incremental==full equivalence on real testdata under a
DIFFERENT snapshot split than the oracled query (so the equivalence is
not split-specific), and the delta-cost contract: per-doc hashing
scales with |delta| and the merge step does ZERO re-hashing (its plan
over persisted state contains no md5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
    incremental_lsh_merge,
    lsh_band_state,
    pairs_from_bands,
    shingle_rows,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
    connected_components,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_BANDS = "doc_id LONG, band_id INT, band_hash STRING"
_CLUSTERS = "node LONG, cluster LONG"


def _bands(spark, rows):
    return spark.createDataFrame(rows, _BANDS)


def test_merge_bridges_two_old_clusters(spark):
    # old: A=1, B=2 in different clusters; new C=3 shares a band with
    # each -> one merged cluster rooted at min id
    state_bands = _bands(spark, [(1, 0, "u"), (2, 0, "v")])
    state_clusters = spark.createDataFrame([(1, 1), (2, 2)], _CLUSTERS)
    delta_bands = _bands(spark, [(3, 0, "u"), (3, 1, "v")])
    # band_id differs for v: no match on (0,"v") vs (1,"v")
    out = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(
            state_bands, state_clusters, delta_bands
        ).collect()
    }
    # C matched A via (0,u); (1,v) matched nothing -> {1,3} cluster, 2 alone
    assert out == {1: 1, 3: 1}
    delta_bands2 = _bands(spark, [(3, 0, "u"), (3, 0, "v")])
    out2 = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(
            state_bands, state_clusters, delta_bands2
        ).collect()
    }
    assert out2 == {1: 1, 2: 1, 3: 1}  # true bridge: all merged


def test_merge_reuses_old_forest_not_old_edges(spark):
    # old cluster {1,2} is represented ONLY by the forest edge (1,2) in
    # state_clusters -- the old band tables need not re-pair them. New
    # doc 9 touches 2; the whole chain lands in cluster 1.
    state_bands = _bands(spark, [(1, 0, "p"), (2, 0, "q")])
    state_clusters = spark.createDataFrame([(1, 1), (2, 1)], _CLUSTERS)
    delta_bands = _bands(spark, [(9, 0, "q")])
    out = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(
            state_bands, state_clusters, delta_bands
        ).collect()
    }
    assert out == {1: 1, 2: 1, 9: 1}


def test_merge_delta_self_pairs_and_singleton_adoption(spark):
    # two new docs pairing only with each other, plus one adopting an
    # old singleton
    state_bands = _bands(spark, [(5, 0, "s")])
    state_clusters = spark.createDataFrame([(5, 5)], _CLUSTERS)
    delta_bands = _bands(
        spark, [(11, 0, "x"), (12, 0, "x"), (13, 0, "s")]
    )
    out = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(
            state_bands, state_clusters, delta_bands
        ).collect()
    }
    assert out == {11: 11, 12: 11, 5: 5, 13: 5}


def test_incremental_equals_full_other_split(spark, sf_dir):
    # different split than the oracled query (mod 3): equivalence is a
    # property of the contract, not of the 80/20 fixture
    docs = read_table(spark, sf_dir, "documents")
    old = docs.where(F.pmod("doc_id", F.lit(3)) != 0)
    delta = docs.where(F.pmod("doc_id", F.lit(3)) == 0)
    sb = lsh_band_state(old, "doc_id", "text").localCheckpoint(eager=True)
    sc = connected_components(pairs_from_bands(sb, "doc_id")).localCheckpoint(
        eager=True
    )
    db = lsh_band_state(delta, "doc_id", "text").localCheckpoint(eager=True)
    inc = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(sb, sc, db).collect()
    }
    full_bands = lsh_band_state(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    full = {
        r["node"]: r["cluster"]
        for r in connected_components(
            pairs_from_bands(full_bands, "doc_id")
        ).collect()
    }
    assert inc == full


def test_delta_cost_contract(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    old = docs.where(F.pmod("doc_id", F.lit(10)) < 8)
    delta = docs.where(F.pmod("doc_id", F.lit(10)) >= 8)
    n_old, n_delta = old.count(), delta.count()
    # (1) per-doc hashing input scales with the delta: the shingle rows
    # feeding the signature stage come from delta docs only
    sh_delta = shingle_rows(delta, "doc_id", "text").count()
    sh_all = shingle_rows(docs, "doc_id", "text").count()
    assert sh_delta < 0.4 * sh_all  # ~20% of docs -> ~20% of hash work
    # (2) the merge over PERSISTED state does zero re-hashing: band
    # tables round-trip through parquet (the deployment shape) and the
    # delta-edge plan contains parquet scans of the state, no md5
    state_dir = tmp_path / "state_bands"
    lsh_band_state(old, "doc_id", "text").write.parquet(str(state_dir))
    state_bands = spark.read.parquet(str(state_dir))
    delta_bands = lsh_band_state(delta, "doc_id", "text").localCheckpoint(
        eager=True
    )
    a, b = delta_bands.alias("a"), state_bands.alias("b")
    delta_vs_state = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash")),
    )
    plan = delta_vs_state._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" not in plan.lower()
    # state side is a bare parquet relation (no recompute lineage) and
    # the physical scan points at the persisted state directory
    assert "Relation [doc_id" in plan and "parquet" in plan
    phys = delta_vs_state._jdf.queryExecution().executedPlan().toString()
    assert "state_bands" in phys
    # (3) end to end on the persisted state: still equals the full run
    state_clusters = connected_components(
        pairs_from_bands(state_bands, "doc_id")
    )
    inc = {
        r["node"]: r["cluster"]
        for r in incremental_lsh_merge(
            state_bands, state_clusters, delta_bands
        ).collect()
    }
    full = {
        r["node"]: r["cluster"]
        for r in connected_components(
            pairs_from_bands(
                lsh_band_state(docs, "doc_id", "text").localCheckpoint(
                    eager=True
                ),
                "doc_id",
            )
        ).collect()
    }
    assert inc == full
    assert n_delta < n_old


def test_oracled_query_runs(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext198 import (
        q_incremental_minhash_dedup,
    )

    pdf = q_incremental_minhash_dedup(spark, sf_dir).toPandas()
    assert len(pdf) == read_table(spark, sf_dir, "documents").count()
    # every cluster root is canonical and a member of its own cluster
    roots = set(pdf["cluster"])
    canon = set(pdf.loc[pdf["is_canonical"] == 1, "doc_id"])
    assert roots == canon
    assert (pdf.groupby("cluster")["doc_id"].min() == sorted(roots)).all()
