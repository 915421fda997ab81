"""Cluster-level dedup queries: connected components over near-dup pairs
(iterative label propagation vs a recursive-CTE oracle) and SimHash
hamming-ball pairs via pigeonhole banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_SHINGLE_PAIRS_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                              i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))
             )) AS tok
      FROM t),
    hashed AS (
      SELECT doc_id, i.i, min(substr(md5((i.i // 2) || ':' || tok), 1 + 16 * (i.i % 2), 16)) AS h
      FROM sh CROSS JOIN (SELECT unnest(range(8)) AS i) i
      GROUP BY doc_id, i.i),
    bands AS (
      SELECT doc_id, CAST(i // 2 AS INTEGER) AS band_id,
             md5(string_agg(h, '|' ORDER BY i)) AS band_hash
      FROM hashed GROUP BY doc_id, CAST(i // 2 AS INTEGER)),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)
"""


# ---------------------------------------------------------------------------
# Dedup clusters: LSH pairs -> connected components -> one cluster id per doc
# ---------------------------------------------------------------------------
@register(
    "dedup_clusters",
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
           CAST(coalesce(comp.cluster, d.doc_id) = d.doc_id AS INTEGER) AS is_canonical
    FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
    """,
    tags=("dedup", "graph", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import connected_components

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    comp = connected_components(pairs)
    return (
        docs.join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce("cluster", "doc_id").alias("cluster"),
            (F.coalesce("cluster", "doc_id") == F.col("doc_id")).cast("int").alias("is_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash hamming-ball near-dup pairs: pigeonhole banding (4 bands of 15
# bits -- hamming <= 3 guarantees at least one identical band), verified
# by exact bit_count(xor).
# ---------------------------------------------------------------------------
_SIMHASH_CTE = """
    toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents),
    th AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th
      FROM toks),
    bits AS (
      SELECT doc_id, b.bit,
             CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS contrib
      FROM th CROSS JOIN (SELECT unnest(range(60)) AS bit) b),
    pb AS (SELECT doc_id, bit, sum(contrib) AS s FROM bits GROUP BY doc_id, bit),
    sh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM pb GROUP BY doc_id)
"""


@register(
    "simhash_near_pairs",
    f"""
    WITH {_SIMHASH_CTE},
    banded AS (
      SELECT doc_id, simhash, i.i AS band_id,
             (simhash >> (15 * i.i)) & 32767 AS band_val
      FROM sh CROSS JOIN (SELECT unnest(range(4)) AS i) i),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                      b.doc_id AS doc_b, b.simhash AS sim_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cands WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
    tags=("dedup", "simhash", "lsh"),
)
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import simhash64

    docs = read_table(spark, sf_dir, "documents")
    sh = simhash64(docs, "doc_id", "text")
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_id"),
    ).withColumn("band_val", F.expr("(simhash >> (15 * band_id)) & 32767"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph: which documents sit at the center of
# duplication clusters (the canonical-doc-selection signal that weights
# by connectivity instead of min-id). Oracle: the 5 power iterations
# UNROLLED as plain CTEs -- exact SQL, no recursion extension needed.
# ---------------------------------------------------------------------------
def _pagerank_sql(n_iter: int = 5) -> str:
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT nd.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(s.c, 0) AS r
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.b AS node, sum(p.r / dg.d) AS c
        FROM edges e JOIN pr{k} p ON p.node = e.a JOIN deg dg ON dg.a = e.a
        GROUP BY e.b) s ON s.node = nd.node)""")
    return f"""
    WITH {_SHINGLE_PAIRS_CTE},
    edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY a),
    nodes AS (SELECT a AS node FROM deg),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
    {','.join(steps)}
    SELECT nd.node, dg.d, round(p.r, 6) AS rank
    FROM nodes nd JOIN deg dg ON dg.a = nd.node
    JOIN pr{n_iter} p ON p.node = nd.node
    """


@register(
    "pagerank_sim_graph",
    _pagerank_sql(5),
    tags=("graph", "iterative", "pagerank"),
)
def q_pagerank_sim_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 power iterations over the shingle-MinHash near-dup graph
    (operators/graph.pagerank). The iterative-join template's second
    instantiation after connected components; every iteration shuffles
    on node id only."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import pagerank

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    pr = pagerank(pairs, n_iter=5)
    return pr.select("node", "d", F.round("r", 6).alias("rank"))


# ---------------------------------------------------------------------------
# Triangle counting on the near-dup graph: the clustering-coefficient
# building block (how clique-like is each duplication cluster). Standard
# distributed formulation: orient edges low->high, join twice -- cost
# bounded by sum of degree^2, never |V|^3.
# ---------------------------------------------------------------------------
@register(
    "triangle_counts",
    f"""
    WITH {_SHINGLE_PAIRS_CTE},
    e AS (SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM pairs WHERE doc_a <> doc_b),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
    FROM tri
    """,
    tags=("graph", "triangles"),
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count triangles in the shingle-MinHash near-dup graph via the
    oriented two-join (each triangle found exactly once as a<b<c). Both
    joins shuffle on a node id; the wedge table (e1 x e2) is the size
    lever -- orientation by id bounds it by sum over nodes of
    out-degree^2, the standard MapReduce-triangles trick."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    e = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        )
        .distinct()
        # r14: e sits on THREE sides of the wedge/closure joins plus
        # the edge-count aggregate -- four consumers re-ran the
        # dedup distinct (and its exchange) per reference (the
        # CLAUDE.md self-join rule). O(edges) rows, pin once.
        .localCheckpoint(eager=True)
    )
    e1 = e.alias("e1")
    e2 = e.select(F.col("a").alias("b2a"), F.col("b").alias("b2b")).alias("e2")
    e3 = e.select(F.col("a").alias("b3a"), F.col("b").alias("b3b")).alias("e3")
    wedges = e1.join(e2, F.col("e2.b2a") == F.col("e1.b"))
    tri = wedges.join(
        e3,
        (F.col("e3.b3a") == F.col("e1.a")) & (F.col("e3.b3b") == F.col("e2.b2b")),
    )
    return tri.agg(F.count("*").cast("bigint").alias("n_triangles")).crossJoin(
        F.broadcast(e.agg(F.count("*").cast("bigint").alias("n_edges")))
    )
