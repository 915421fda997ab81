"""Connected components over a pair/edge table -- turns near-dup PAIRS
into dedup CLUSTERS (the step every large-scale dedup pipeline needs
after LSH: pick one canonical doc per component).

Algorithm: iterative min-label propagation (the DataFrame rendering of
Pregel-style CC): every node starts labeled with itself; each round a
node takes the min label among itself and its neighbors; fixpoint in
O(graph diameter) rounds. Near-dup graphs are unions of small cliques,
so diameter -- and round count -- is tiny in practice.

Scale: each round is one join + one groupBy on the node id (same key ->
exchange reuse), data volume |edges|; lineage is truncated per round
with localCheckpoint so 20 rounds don't build a 20-deep plan. This is
the engine's template for iterative algorithms (PageRank, label prop)
without needing GraphX/GraphFrames jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Returns (node, cluster): cluster = min node id in the component.
    Nodes = every id appearing in `pairs`; join singletons back with
    coalesce(cluster, id) at the call site."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_labels = edges.join(
            labels, edges.b == labels.node, "inner"
        ).select(F.col("a").alias("node"), "label")
        new_labels = (
            neighbor_labels.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster"))
