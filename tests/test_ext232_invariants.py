"""Definition-level invariants for ext232 (incremental CC): forest
merge == full recompute on random graphs, the bridge-merge case, and
the delta-cost contract that makes it the 100 TB ingest path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
    _driver_union_find,
    cc_forest_merge,
    connected_components,
)


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )


def _labels(df):
    return {r["node"]: r["cluster"] for r in df.collect()}


def test_forest_merge_equals_full_cc_fuzz(spark):
    """Three-snapshot sequential forest merge == one-shot union-find
    over the union, on random graphs across sparse/dense regimes."""
    rng = random.Random(11)
    for _ in range(8):
        n = rng.randint(6, 30)
        m = rng.randint(3, 60)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(m)
            }
        )
        snaps = [[], [], []]
        for a, b in edges:
            snaps[(a * 31 + b) % 3].append((a, b))
        if not snaps[0]:
            snaps[0] = [edges[0]]
        state = connected_components(_edges_df(spark, snaps[0]))
        for k in (1, 2):
            if snaps[k]:
                state = cc_forest_merge(state, _edges_df(spark, snaps[k]))
        expect = _driver_union_find(edges)
        assert _labels(state) == expect


def test_bridge_merge(spark):
    """A delta edge bridging two old clusters merges them through the
    forest exactly as through the full graph."""
    state = connected_components(_edges_df(spark, [(1, 2), (3, 4)]))
    assert _labels(state) == {1: 1, 2: 1, 3: 3, 4: 3}
    merged = cc_forest_merge(state, _edges_df(spark, [(2, 3)]))
    assert _labels(merged) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_delta_cost_contract(spark):
    """The incremental step's CC input is O(old nodes + delta), never
    O(old edges): a 12-clique (66 edges) compresses to an 11-row
    forest, and a no-op delta leaves assignments identical."""
    clique = [(a, b) for a in range(12) for b in range(a + 1, 12)]
    state = connected_components(_edges_df(spark, clique))
    forest = state.where(F.col("node") != F.col("cluster"))
    assert forest.count() == 11  # nodes - components, << 66 edges
    # delta that changes nothing: an edge inside the clique
    merged = cc_forest_merge(state, _edges_df(spark, [(0, 5)]))
    assert _labels(merged) == _labels(state)
    # delta attaching a new node costs one forest scan + one edge
    merged2 = cc_forest_merge(state, _edges_df(spark, [(11, 99)]))
    lab = _labels(merged2)
    assert lab[99] == 0 and len(lab) == 13


def test_singleton_state_rows_survive(spark):
    """Totality guard (r11 ADVICE): a hand-built state containing
    singleton clusters (node == cluster, size 1 -- impossible from CC
    output, possible from a filtered/synthetic state) must not lose
    those assignments: untouched singletons come back as themselves,
    and a delta edge can absorb one into a cluster."""
    state = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (9, 9)], "node long, cluster long"
    )
    merged = cc_forest_merge(state, _edges_df(spark, [(2, 9)]))
    assert _labels(merged) == {1: 1, 2: 1, 9: 1, 7: 7}
