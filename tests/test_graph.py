"""Connected-components operator: multi-hop chains, separate components,
and the iteration fixpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import connected_components


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain (diameter 4: takes several propagation rounds) + 8-9
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "doc_a long, doc_b long"
    )
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 8: 8, 9: 8}


def test_direction_and_duplicates_ignored(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2), (3, 2)], "doc_a long, doc_b long"
    )
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_loop_path_matches_driver_path(spark):
    """driver_max_edges=0 forces the distributed large-star/small-star
    loop; it must produce the identical clustering to the driver
    union-find fast path on a shape that needs several rounds (chain)
    plus a clique and a singleton-ish pair."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9), (20, 21), (21, 22), (20, 22)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {r.node: r.cluster for r in connected_components(pairs).collect()}
    dist = {
        r.node: r.cluster
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert dist == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 8: 8, 9: 8, 20: 20, 21: 20, 22: 20}


def test_max_iter_bounds_work(spark):
    # a long chain with max_iter too small must still return labels
    # (possibly unconverged) without error; with enough iterations it
    # converges. Chain 0..10.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    converged = connected_components(pairs, max_iter=20)
    assert {r.cluster for r in converged.collect()} == {0}


def test_pagerank_toy_chain(spark):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import pagerank

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    out = {r["node"]: (r["d"], r["r"]) for r in pagerank(pairs, n_iter=20).collect()}
    ranks = {n: r for n, (d, r) in out.items()}
    # conservation: undirected graph with no dangling nodes keeps total mass 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # the chain center has degree 2 and must out-rank the endpoints
    assert out[2][0] == 2 and out[1][0] == 1
    assert ranks[2] > ranks[1] and ranks[2] > ranks[3]
    assert abs(ranks[1] - ranks[3]) < 1e-12  # symmetry
