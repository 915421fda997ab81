"""Extension batch 119 (round 6): graph centralities with EXACT integer
cores (truncated Katz via walk counts, 3-hop harmonic centrality via
BFS level sizes) and held-out Stupid Backoff language-model scoring.

Scale notes (the 100 TB story):
- katz_centrality keeps the ENTIRE iteration integer: w_k(v) = number
  of k-walks ending at v (A^k * 1), four joins shuffling on node id
  only, attenuation applied once in the closing expression -- so
  there is no cross-engine float accumulation anywhere and no
  per-iteration rounding. Walk counts are bounded by degree^K, itself
  bounded by the LSH bucket cap.
- harmonic_centrality_3hop materializes the distinct k-hop frontier
  per seed ((src, node) dedup per level -- the khop_reachability BFS
  shape); the centrality closes over three exact integers
  n1 + n2/2 + n3/3.
- stupid_backoff_heldout scores one source's trigrams against counts
  from the OTHER sources (so backoff genuinely fires on unseen
  n-grams): three count tables keyed by n-gram, three shuffles, and a
  CASE ladder per scored token; per-token log scores round to e8
  integers before the order-free sum (the LM cross-entropy rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import (
    _SHINGLE_PAIRS_CTE,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_KATZ_ALPHA = 0.05
_KATZ_K = 4


def _near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected near-dup edge list (both directions), eager LSH
    pipeline -- the shared graph of pagerank_sim_graph/triangle_counts."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    return pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))


def _katz_sql() -> str:
    steps = []
    for k in range(_KATZ_K):
        steps.append(f"""
    w{k + 1} AS (
      SELECT e.b AS node, CAST(sum(w.c) AS BIGINT) AS c
      FROM edges e JOIN w{k} w ON w.node = e.a
      GROUP BY e.b)""")
    # alpha = 0.05 makes every alpha^k * 1e8 an exact INTEGER
    # (5e6/250000/12500/625), so the whole attenuation sum is integer
    # arithmetic and the 6-dp output is a half-up integer division --
    # the r10 sf0.1 sweep caught the float form flipping 4/803 rows
    # between Spark's and DuckDB's round() at 6-dp half boundaries.
    close = " + ".join(
        f"{round(_KATZ_ALPHA ** (k + 1) * 10**8)} * coalesce(w{k + 1}.c, 0)"
        for k in range(_KATZ_K)
    )
    joins = "\n    ".join(
        f"LEFT JOIN w{k + 1} ON w{k + 1}.node = nd.node" for k in range(_KATZ_K)
    )
    return f"""
    WITH {_SHINGLE_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    w0 AS (SELECT node, CAST(1 AS BIGINT) AS c FROM nodes),
    {','.join(steps)}
    SELECT nd.node, CAST(coalesce(w1.c, 0) AS BIGINT) AS degree,
           CAST(coalesce(w{_KATZ_K}.c, 0) AS BIGINT) AS walks_{_KATZ_K},
           CAST((({close}) + 50) // 100 AS DOUBLE) / 1e6 AS katz
    FROM nodes nd
    {joins}
    """


@register("katz_centrality", _katz_sql(), tags=("graph", "iterative", "centrality"))
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (alpha=0.05, K=4) on the near-dup
    graph: katz(v) = sum_k alpha^k * (# k-walks ending at v). The
    walk-count vectors are EXACT INTEGERS through all four iterative
    joins -- attenuation enters once in the closing round(6) -- so
    unlike float PageRank there is zero accumulation-order risk.
    Katz rewards being reachable by many short paths (not just direct
    degree), the canonical 'influence' complement to PageRank's
    random-surfer weighting."""
    edges = _near_dup_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = edges.select(F.col("a").alias("node")).distinct()
    w = nodes.select("node", F.lit(1).cast("bigint").alias("c"))
    walks = []
    for _ in range(_KATZ_K):
        w = (
            edges.join(w.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        walks.append(w)
    out = nodes
    for k, wk in enumerate(walks):
        out = out.join(
            wk.withColumnRenamed("c", f"c{k + 1}"), "node", "left"
        )
    # exact e8-integer attenuation (mirrors the oracle text; see the
    # r10 note there)
    close = None
    for k in range(_KATZ_K):
        term = F.lit(round(_KATZ_ALPHA ** (k + 1) * 10**8)) * F.coalesce(
            F.col(f"c{k + 1}"), F.lit(0)
        )
        close = term if close is None else close + term
    return out.withColumn("katz_e8", close.cast("bigint")).select(
        "node",
        F.coalesce(F.col("c1"), F.lit(0)).cast("bigint").alias("degree"),
        F.coalesce(F.col(f"c{_KATZ_K}"), F.lit(0))
        .cast("bigint")
        .alias(f"walks_{_KATZ_K}"),
        F.expr("CAST((katz_e8 + 50) DIV 100 AS DOUBLE) / 1e6").alias(
            "katz"
        ),
    )


@register(
    "harmonic_centrality_3hop",
    f"""
    WITH {_SHINGLE_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    l1 AS (SELECT DISTINCT a AS src, b AS node FROM edges),
    l2 AS (
      SELECT DISTINCT l1.src, e.b AS node
      FROM l1 JOIN edges e ON e.a = l1.node
      WHERE e.b <> l1.src
        AND NOT EXISTS (SELECT 1 FROM l1 p
                        WHERE p.src = l1.src AND p.node = e.b)),
    l3 AS (
      SELECT DISTINCT l2.src, e.b AS node
      FROM l2 JOIN edges e ON e.a = l2.node
      WHERE e.b <> l2.src
        AND NOT EXISTS (SELECT 1 FROM l1 p
                        WHERE p.src = l2.src AND p.node = e.b)
        AND NOT EXISTS (SELECT 1 FROM l2 p
                        WHERE p.src = l2.src AND p.node = e.b)),
    counts AS (
      SELECT src,
             CAST((SELECT count(*) FROM l1 WHERE l1.src = s.src) AS BIGINT) AS n1,
             CAST((SELECT count(*) FROM l2 WHERE l2.src = s.src) AS BIGINT) AS n2,
             CAST((SELECT count(*) FROM l3 WHERE l3.src = s.src) AS BIGINT) AS n3
      FROM (SELECT DISTINCT src FROM l1) s)
    SELECT src AS node, n1, n2, n3,
           round(n1 + n2 / 2.0 + n3 / 3.0, 6) AS harmonic3
    FROM counts
    """,
    tags=("graph", "bfs", "centrality"),
)
def q_harmonic_centrality_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality truncated at 3 hops on the near-dup graph:
    sum over reachable v of 1/dist(u,v) = n1 + n2/2 + n3/3 with exact
    per-level frontier sizes (BFS with (src, node) dedup per level,
    anti-joined against earlier levels -- the khop_reachability shape).
    Harmonic handles disconnected graphs where closeness breaks, and
    the truncation bounds every frontier join."""
    edges = _near_dup_edges(spark, sf_dir).localCheckpoint(eager=True)
    l1 = edges.select(F.col("a").alias("src"), F.col("b").alias("node")).distinct()

    def next_level(cur, *prev):
        nxt = (
            cur.join(edges.withColumnRenamed("a", "node"), "node")
            .select("src", F.col("b").alias("node"))
            .where(F.col("node") != F.col("src"))
            .distinct()
        )
        for p in prev:
            nxt = nxt.join(p, ["src", "node"], "left_anti")
        return nxt

    l2 = next_level(l1, l1)
    l3 = next_level(l2, l1, l2)

    def cnt(df, name):
        return df.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias(name))

    out = (
        cnt(l1, "n1")
        .join(cnt(l2, "n2"), "src", "left")
        .join(cnt(l3, "n3"), "src", "left")
        .select(
            F.col("src").alias("node"),
            F.col("n1"),
            F.coalesce("n2", F.lit(0)).cast("bigint").alias("n2"),
            F.coalesce("n3", F.lit(0)).cast("bigint").alias("n3"),
        )
    )
    return out.select(
        "node", "n1", "n2", "n3",
        F.round(
            F.col("n1") + F.col("n2") / F.lit(2.0) + F.col("n3") / F.lit(3.0), 6
        ).alias("harmonic3"),
    )


# ---------------------------------------------------------------------------
# Stupid Backoff trigram scoring of a held-out source.
# ---------------------------------------------------------------------------
_SB_LAMBDA = 0.4
_HELD_OUT = "src0"  # scored source; counts come from the other sources


@register(
    "stupid_backoff_heldout",
    f"""
    WITH toks AS (
      SELECT t.doc_id, t.source, i.i AS pos, t.tk[i.i] AS tok
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tk
            FROM documents) t,
           (SELECT unnest(range(1, 401)) AS i) i
      WHERE i.i <= len(t.tk)
    ),
    train AS (SELECT * FROM toks WHERE source <> '{_HELD_OUT}'),
    uni AS (SELECT tok AS w1, CAST(count(*) AS BIGINT) AS c FROM train GROUP BY tok),
    n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(count(DISTINCT tok) AS BIGINT) AS v FROM train),
    bi AS (
      SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c
      FROM train a JOIN train b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY a.tok, b.tok),
    tri AS (
      SELECT a.tok AS w1, b.tok AS w2, c.tok AS w3, CAST(count(*) AS BIGINT) AS c
      FROM train a JOIN train b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN train c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      GROUP BY a.tok, b.tok, c.tok),
    test AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2, c.tok AS w3
      FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      WHERE a.source = '{_HELD_OUT}'),
    scored AS (
      SELECT t.doc_id,
             CASE WHEN tri.c IS NOT NULL
                    THEN CAST(tri.c AS DOUBLE) / bi.c
                  WHEN bi2.c IS NOT NULL
                    THEN {_SB_LAMBDA} * CAST(bi2.c AS DOUBLE) / u2.c
                  ELSE {_SB_LAMBDA} * {_SB_LAMBDA}
                       * CAST(coalesce(u3.c, 0) + 1 AS DOUBLE) / (nt.n + nt.v)
             END AS s,
             CASE WHEN tri.c IS NOT NULL THEN 0
                  WHEN bi2.c IS NOT NULL THEN 1 ELSE 2 END AS backoff_level
      FROM test t
      LEFT JOIN tri ON tri.w1 = t.w1 AND tri.w2 = t.w2 AND tri.w3 = t.w3
      LEFT JOIN bi ON bi.w1 = t.w1 AND bi.w2 = t.w2
      LEFT JOIN bi bi2 ON bi2.w1 = t.w2 AND bi2.w2 = t.w3
      LEFT JOIN uni u2 ON u2.w1 = t.w2
      LEFT JOIN uni u3 ON u3.w1 = t.w3
      CROSS JOIN n_tot nt),
    terms AS (
      SELECT doc_id, backoff_level,
             CAST(round(100000000.0 * ln(s), 0) AS BIGINT) AS ln_e8
      FROM scored)
    SELECT CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(CASE WHEN backoff_level = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_direct,
           CAST(sum(CASE WHEN backoff_level = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bigram_backoff,
           CAST(sum(CASE WHEN backoff_level = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unigram_backoff,
           round(CAST(sum(ln_e8) AS DOUBLE) / count(*) / 100000000.0, 6)
             AS avg_log_score
    FROM terms
    """,
    tags=("llm", "language-model", "backoff"),
)
def q_stupid_backoff_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff (Brants et al. 2007) trigram scoring of the
    held-out 'src0' source against counts from the other sources:
    S = c(w1w2w3)/c(w1w2), else 0.4 * c(w2w3)/c(w2), else 0.4^2 *
    add-one unigram -- the web-scale LM smoothing that needs no
    discount estimation. Because scoring is cross-source, the backoff
    ladder genuinely fires; the output counts per level prove it.
    Per-token ln scores round to e8 integers before the sum."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "tok")
    train = toks.where(F.col("source") != _HELD_OUT)
    uni = train.groupBy(F.col("tok").alias("w1")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n_tot = train.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("tok").cast("bigint").alias("v"),
    )

    def ngrams(src, n):
        a = src.alias("a")
        out = a.select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("pos"),
            F.col("a.tok").alias("w1"),
        )
        for j in range(2, n + 1):
            b = src.alias(f"b{j}")
            out = out.join(
                b.select(
                    F.col(f"b{j}.doc_id").alias("doc_id"),
                    (F.col(f"b{j}.pos") - (j - 1)).alias("pos"),
                    F.col(f"b{j}.tok").alias(f"w{j}"),
                ),
                ["doc_id", "pos"],
            )
        return out

    bi = ngrams(train, 2).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tri = ngrams(train, 3).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    test = ngrams(toks.where(F.col("source") == _HELD_OUT), 3).select(
        "doc_id", "w1", "w2", "w3"
    )
    j = (
        test.join(
            tri.select("w1", "w2", "w3", F.col("c").alias("c_tri")),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            bi.select("w1", "w2", F.col("c").alias("c_bi12")), ["w1", "w2"], "left"
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                F.col("c").alias("c_bi23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(uni.select(F.col("w1").alias("w2"), F.col("c").alias("c_u2")), ["w2"], "left")
        .join(uni.select(F.col("w1").alias("w3"), F.col("c").alias("c_u3")), ["w3"], "left")
        .crossJoin(F.broadcast(n_tot))
    )
    s = (
        F.when(
            F.col("c_tri").isNotNull(),
            F.col("c_tri").cast("double") / F.col("c_bi12"),
        )
        .when(
            F.col("c_bi23").isNotNull(),
            F.lit(_SB_LAMBDA) * F.col("c_bi23").cast("double") / F.col("c_u2"),
        )
        .otherwise(
            F.lit(_SB_LAMBDA * _SB_LAMBDA)
            * (F.coalesce(F.col("c_u3"), F.lit(0)) + 1).cast("double")
            / (F.col("n") + F.col("v"))
        )
    )
    lvl = (
        F.when(F.col("c_tri").isNotNull(), 0)
        .when(F.col("c_bi23").isNotNull(), 1)
        .otherwise(2)
    )
    terms = j.select(
        F.round(F.lit(100000000.0) * F.log(s), 0).cast("bigint").alias("ln_e8"),
        lvl.alias("backoff_level"),
    )

    def nlvl(k):
        return F.sum(F.when(F.col("backoff_level") == k, 1).otherwise(0)).cast(
            "bigint"
        )

    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        nlvl(0).alias("n_direct"),
        nlvl(1).alias("n_bigram_backoff"),
        nlvl(2).alias("n_unigram_backoff"),
        F.round(
            F.sum("ln_e8").cast("double") / F.count(F.lit(1)) / 100000000.0, 6
        ).alias("avg_log_score"),
    )
