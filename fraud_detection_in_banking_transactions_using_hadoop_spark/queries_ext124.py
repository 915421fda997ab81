"""Extension batch 124 (round 6): contrastive-training and retrieval
ops on the embeddings table -- hard-negative mining, norm-outlier
screening, and MMR (maximal marginal relevance) reranking.

Scale notes (the 100 TB story):
- hard_negative_mining is the ann_cosine_topk shape (bounded anchor
  set broadcast against the corpus -- the documented brute-force
  baseline; the LSH/IVF bucketed tiers in operators/similarity are
  the scale path) with a label-aware argmax: per anchor, the highest-
  cosine vector of a DIFFERENT label (hardest negative) and of the
  same label (hardest positive). The margin column is the
  triplet-loss diagnostic batch miners compute.
- label_coherence_score needs NO pairwise join: for unit vectors the
  mean intra-label cosine is (|sum v|^2 - n)/(n(n-1)), one component
  aggregation with e6-integer sums -- billions of vectors cost one
  (label, dim)-keyed exchange.
- mmr_rerank unrolls 4 greedy MMR selection steps as joins over a
  bounded 10-candidate table (scores e6-rounded before every argmax,
  id tiebreak) -- the RAG diversification pass, deterministic enough
  to hash-gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_N_ANCHORS = 20
_MMR_LAMBDA = 0.7
_MMR_POOL = 10
_MMR_K = 4


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


@register(
    "hard_negative_mining",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    anch AS (SELECT * FROM base WHERE vec_id < {_N_ANCHORS}),
    sims AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS other_id, b.label AS other_label,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
      FROM anch a, base b WHERE a.vec_id <> b.vec_id),
    neg AS (
      SELECT anchor_id, other_id AS hard_neg_id, cosine AS neg_cosine,
             row_number() OVER (PARTITION BY anchor_id
               ORDER BY cosine DESC, other_id) AS rk
      FROM sims WHERE other_label <> anchor_label),
    pos AS (
      SELECT anchor_id, other_id AS hard_pos_id, cosine AS pos_cosine,
             row_number() OVER (PARTITION BY anchor_id
               ORDER BY cosine DESC, other_id) AS rk
      FROM sims WHERE other_label = anchor_label)
    SELECT n.anchor_id, p.hard_pos_id, p.pos_cosine,
           n.hard_neg_id, n.neg_cosine,
           round(p.pos_cosine - n.neg_cosine, 6) AS margin
    FROM neg n JOIN pos p ON p.anchor_id = n.anchor_id
    WHERE n.rk = 1 AND p.rk = 1
    """,
    tags=("llm", "contrastive", "similarity"),
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for contrastive training: per anchor (bounded
    broadcast set), the hardest NEGATIVE (highest cosine, different
    label) and hardest POSITIVE (highest cosine, same label), plus
    the pos-neg margin. Negative margins mark the anchors where a
    contrastive loss still has gradient -- the batch-mining signal.
    Brute-force baseline shape (whitelisted); bucketed tiers are the
    scale path."""
    emb = _emb(spark, sf_dir)
    anch = emb.where(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("v").alias("av"),
        F.col("label").alias("anchor_label"),
    )
    sims = (
        emb.crossJoin(F.broadcast(anch))
        .where(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("other_id"),
            F.col("label").alias("other_label"),
            F.round(
                _dot(F.col("av"), F.col("v"))
                / (
                    F.sqrt(_dot(F.col("av"), F.col("av")))
                    * F.sqrt(_dot(F.col("v"), F.col("v")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("other_id")
    )
    neg = (
        sims.where(F.col("other_label") != F.col("anchor_label"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("hard_neg_id"),
            F.col("cosine").alias("neg_cosine"),
        )
    )
    pos = (
        sims.where(F.col("other_label") == F.col("anchor_label"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("hard_pos_id"),
            F.col("cosine").alias("pos_cosine"),
        )
    )
    return neg.join(pos, "anchor_id").select(
        "anchor_id",
        "hard_pos_id",
        "pos_cosine",
        "hard_neg_id",
        "neg_cosine",
        F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias("margin"),
    )


@register(
    "label_coherence_score",
    """
    WITH comp AS (
      SELECT label, i.i AS pos,
             CAST(round(1000000.0 * (embedding::DOUBLE[])[i.i], 0) AS BIGINT)
               AS c_e6
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
    cent AS (
      SELECT label, pos, CAST(sum(c_e6) AS BIGINT) AS s
      FROM comp GROUP BY label, pos),
    sizes AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings
      GROUP BY label),
    norms AS (
      SELECT label, CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2
      FROM cent GROUP BY label),
    gcent AS (
      SELECT pos, CAST(sum(s) AS BIGINT) AS g FROM cent GROUP BY pos),
    gdot AS (
      SELECT c.label,
             CAST(sum(CAST(c.s AS HUGEINT) * g.g) AS HUGEINT) AS dg
      FROM cent c JOIN gcent g ON g.pos = c.pos GROUP BY c.label),
    gnorm AS (SELECT CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS g2
              FROM gcent)
    SELECT z.label, z.n,
           round((CAST(nr.s2 AS DOUBLE) / 1000000000000.0 - z.n)
                 / (CAST(z.n AS DOUBLE) * (z.n - 1)), 6)
             AS mean_intra_cosine,
           round(CAST(gd.dg AS DOUBLE)
                 / (sqrt(CAST(nr.s2 AS DOUBLE)) * sqrt(CAST(gn.g2 AS DOUBLE))),
                 6) AS centroid_vs_global_cos
    FROM sizes z
    JOIN norms nr ON nr.label = z.label
    JOIN gdot gd ON gd.label = z.label
    CROSS JOIN gnorm gn
    """,
    tags=("llm", "embedding", "quality"),
)
def q_label_coherence_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster quality per embedding label via the centroid-norm
    identity: for unit vectors, mean intra-label cosine =
    (|sum v|^2 - n) / (n(n-1)) -- NO pairwise join, one component
    aggregation (the corpus is unit-normalized; measured max norm
    deviation 7e-8). Components e6-round to integers, so centroid
    sums, squared norms, and the centroid-vs-global-centroid cosine
    all close over exact integers. High intra-cosine + low
    global-alignment = a well-separated class; the screen that says
    whether `label` is learnable from these embeddings at all."""
    emb = _emb(spark, sf_dir)
    comp = emb.select(
        "label", F.posexplode("v").alias("pos0", "c")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.lit(1000000.0) * F.col("c"), 0).cast("bigint").alias("c_e6"),
    )
    dec = "decimal(38,0)"
    cent = comp.groupBy("label", "pos").agg(
        F.sum("c_e6").cast("bigint").alias("s")
    )
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    norms = cent.groupBy("label").agg(
        F.sum(F.col("s").cast(dec) * F.col("s")).cast(dec).alias("s2")
    )
    glob = cent.groupBy("pos").agg(F.sum("s").cast("bigint").alias("g"))
    gdot = (
        cent.join(glob, "pos")
        .groupBy("label")
        .agg(F.sum(F.col("s").cast(dec) * F.col("g")).cast(dec).alias("dg"))
    )
    gnorm = glob.agg(
        F.sum(F.col("g").cast(dec) * F.col("g")).cast(dec).alias("g2")
    )
    j = (
        sizes.join(norms, "label")
        .join(gdot, "label")
        .crossJoin(F.broadcast(gnorm))
    )
    nd = F.col("n").cast("double")
    return j.select(
        "label",
        "n",
        F.round(
            (F.col("s2").cast("double") / 1000000000000.0 - F.col("n"))
            / (nd * (F.col("n") - 1)),
            6,
        ).alias("mean_intra_cosine"),
        F.round(
            F.col("dg").cast("double")
            / (
                F.sqrt(F.col("s2").cast("double"))
                * F.sqrt(F.col("g2").cast("double"))
            ),
            6,
        ).alias("centroid_vs_global_cos"),
    )


_MMR_MU = 0.3  # 1 - lambda, spelled as an exact shared literal


def _mmr_sql() -> str:
    lam, mu = _MMR_LAMBDA, _MMR_MU
    steps = ["sel1 AS (SELECT id, 1 AS ord FROM cand ORDER BY rel_e6 DESC, id LIMIT 1)"]
    prev = "sel1"
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
    pick{k} AS (
      SELECT c.id, c.rel_e6,
             CAST(round({lam} * c.rel_e6
                        - {mu} * max(ps.cos_e6), 0) AS BIGINT) AS mmr_e6
      FROM cand c
      JOIN pairsim ps ON ps.a = c.id
      JOIN {prev} s ON s.id = ps.b
      WHERE c.id NOT IN (SELECT id FROM {prev})
      GROUP BY c.id, c.rel_e6),
    top{k} AS (SELECT id FROM pick{k} ORDER BY mmr_e6 DESC, id LIMIT 1),
    sel{k} AS (SELECT id, ord FROM {prev}
               UNION ALL SELECT id, {k} FROM top{k})""")
        prev = f"sel{k}"
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM base WHERE vec_id = 0),
    cand AS (
      SELECT vec_id AS id, v,
             CAST(round(1000000.0 * list_dot_product(q.qv, b.v) /
                   (sqrt(list_dot_product(q.qv, q.qv))
                    * sqrt(list_dot_product(b.v, b.v))), 0) AS BIGINT)
               AS rel_e6
      FROM base b CROSS JOIN q WHERE b.vec_id <> 0
      ORDER BY rel_e6 DESC, vec_id LIMIT {_MMR_POOL}),
    pairsim AS (
      SELECT c1.id AS a, c2.id AS b,
             CAST(round(1000000.0 * list_dot_product(c1.v, c2.v) /
                   (sqrt(list_dot_product(c1.v, c1.v))
                    * sqrt(list_dot_product(c2.v, c2.v))), 0) AS BIGINT)
               AS cos_e6
      FROM cand c1, cand c2 WHERE c1.id <> c2.id),
    {','.join(steps)}
    SELECT s.ord AS position, s.id AS vec_id,
           round(c.rel_e6 / 1000000.0, 6) AS relevance
    FROM {prev} s JOIN cand c ON c.id = s.id
    """


@register("mmr_rerank", _mmr_sql(), tags=("llm", "retrieval", "mmr"))
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR reranking (lambda=0.7) of vec 0's top-10 cosine candidates:
    greedily pick 4 results maximizing lambda*relevance - (1-lambda)*
    max-similarity-to-already-picked -- the RAG diversification pass
    that stops near-duplicate passages crowding a context window. All
    relevance/similarity scores e6-round BEFORE each argmax (id
    tiebreak), so the greedy trajectory is engine-identical; the 4
    steps unroll as bounded joins over the 10-candidate table."""
    emb = _emb(spark, sf_dir).select("vec_id", "v")
    q = emb.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))

    def cos_e6(x, y):
        return F.round(
            F.lit(1000000.0)
            * _dot(x, y)
            / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y))),
            0,
        ).cast("bigint")

    cand = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("id"), "v", cos_e6(F.col("qv"), F.col("v")).alias("rel_e6"))
        .orderBy(F.col("rel_e6").desc(), "id")
        .limit(_MMR_POOL)
    ).localCheckpoint(eager=True)
    c1 = cand.select(F.col("id").alias("a"), F.col("v").alias("va"))
    c2 = cand.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    pairsim = (
        c1.crossJoin(F.broadcast(c2))
        .where(F.col("a") != F.col("b"))
        .select("a", "b", cos_e6(F.col("va"), F.col("vb")).alias("cos_e6"))
    ).localCheckpoint(eager=True)
    sel = (
        cand.orderBy(F.col("rel_e6").desc(), "id")
        .limit(1)
        .select("id", F.lit(1).alias("ord"))
    ).localCheckpoint(eager=True)
    for k in range(2, _MMR_K + 1):
        scored = (
            cand.join(sel.select("id"), "id", "left_anti")
            .join(pairsim, F.col("id") == F.col("a"))
            .join(sel.select(F.col("id").alias("b")), "b")
            .groupBy("id", "rel_e6")
            .agg(F.max("cos_e6").alias("mx"))
            .select(
                "id",
                F.round(
                    F.lit(_MMR_LAMBDA) * F.col("rel_e6")
                    - F.lit(_MMR_MU) * F.col("mx"),
                    0,
                )
                .cast("bigint")
                .alias("mmr_e6"),
            )
        )
        pick = scored.orderBy(F.col("mmr_e6").desc(), "id").limit(1).select(
            "id", F.lit(k).alias("ord")
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    rel = cand.select(F.col("id").alias("cid"), "rel_e6")
    return sel.join(rel, sel.id == rel.cid).select(
        F.col("ord").cast("int").alias("position"),
        F.col("id").alias("vec_id"),
        F.round(F.col("rel_e6") / 1000000.0, 6).alias("relevance"),
    )
