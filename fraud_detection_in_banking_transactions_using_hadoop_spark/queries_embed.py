"""Embedding-column operators beyond ANN search: scalar quantization
(the storage/serving compression every 100 TB vector corpus applies)
and distributed covariance (the aggregation PCA and whitening are built
from).

Both stay in LONG form (vec_id/pos rows) -- the distributed shape for
per-dimension statistics: posexplode is a map-side expression, the
shuffles carry only dim-keyed partial aggregates, and the oracle
compare stays scalar-typed (CLAUDE.md: no array outputs in oracled
queries).

Float parity: per-dim min/max are order-insensitive aggregates;
quantization arithmetic is pure scalar IEEE-754 expressions (identical
bit-for-bit in both engines given identical inputs); only the final
avg/covar aggregates see order-dependent summation, and those are
round(6)-stable at these magnitudes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Int8-style scalar quantization with per-dimension ranges.
# ---------------------------------------------------------------------------
@register(
    "embedding_quantize",
    """
    WITH x AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
    stats AS (
      SELECT pos, min(val) AS mn, max(val) AS mx FROM x GROUP BY pos),
    q AS (
      SELECT vec_id, x.pos, val, mn, mx,
             CASE WHEN mx = mn THEN 0
                  ELSE least(255, greatest(0,
                    CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT)))
             END AS code
      FROM x JOIN stats ON stats.pos = x.pos)
    SELECT vec_id,
           CAST(sum(code) AS BIGINT) AS code_sum,
           round(avg(pow(val - (mn + (code + 0.5) * (mx - mn) / 255.0), 2)), 6)
             AS mse
    FROM q GROUP BY vec_id
    """,
    tags=("embedding", "quantization"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min/max scalar quantization to 8-bit codes (the
    IVF-SQ8 storage layout): code = floor((x-min)*255/(max-min)), then
    per-vector reconstruction MSE against the bin midpoint. Scale: the
    range stats are a 64-row broadcast; codes are map-side expressions;
    the only fact-sized shuffle is the per-vector aggregate, keyed on
    vec_id. Quantization arithmetic is branch-free scalar IEEE ops, so
    codes are bit-identical across engines and partitionings."""
    emb = read_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "val"),
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    stats = x.groupBy("pos").agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(255).cast("bigint"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.floor(
                    (F.col("val") - F.col("mn")) * 255.0 / (F.col("mx") - F.col("mn"))
                ),
            ),
        )
    )
    deq = F.col("mn") + (F.col("code") + 0.5) * (F.col("mx") - F.col("mn")) / 255.0
    return (
        x.join(F.broadcast(stats), "pos")
        .withColumn("code", code)
        .groupBy("vec_id")
        .agg(
            F.sum("code").cast("bigint").alias("code_sum"),
            F.round(F.avg(F.pow(F.col("val") - deq, 2)), 6).alias("mse"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed covariance/correlation matrix (long form) -- the PCA input.
# ---------------------------------------------------------------------------
@register(
    "embedding_covariance",
    """
    SELECT i AS pos_a, j AS pos_b,
           round(covar_pop(CAST(embedding[i] AS DOUBLE),
                           CAST(embedding[j] AS DOUBLE)), 6) AS cov,
           round(corr(CAST(embedding[i] AS DOUBLE),
                      CAST(embedding[j] AS DOUBLE)), 6) AS pearson,
           CAST(count(*) AS BIGINT) AS n
    FROM embeddings,
         (SELECT unnest(range(1, 9)) AS i) ii,
         (SELECT unnest(range(1, 9)) AS j) jj
    WHERE j >= i
    GROUP BY i, j
    """,
    tags=("embedding", "pca", "stats"),
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance/correlation of the first 8 embedding
    dims, computed WITHOUT a self-join: each vector emits its d(d+1)/2
    dimension pairs from the carried array (sequence x sequence
    explode), so the plan is one map-side expansion + one aggregate on
    36 groups -- map-side combined, no join, no d^2 shuffle of the fact.
    This is exactly how a PCA/whitening pipeline builds its Gram matrix
    at 100 TB (the eigensolve then runs driver-side on the tiny d x d
    result; see operators/similarity.pca_fit)."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    pairs = (
        emb.select(F.col("vec_id"), v.alias("v"))
        .select("vec_id", "v", F.explode(F.sequence(F.lit(1), F.lit(8))).alias("i"))
        .select(
            "vec_id",
            "v",
            "i",
            F.explode(F.sequence(F.col("i"), F.lit(8))).alias("j"),
        )
        .select(
            F.col("i").alias("pos_a"),
            F.col("j").alias("pos_b"),
            F.try_element_at("v", F.col("i")).alias("va"),
            F.try_element_at("v", F.col("j")).alias("vb"),
        )
    )
    return pairs.groupBy("pos_a", "pos_b").agg(
        F.round(F.covar_pop("va", "vb"), 6).alias("cov"),
        F.round(F.corr("va", "vb"), 6).alias("pearson"),
        F.count("*").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Hyperplane-LSH ANN: the bucketed approximate tier, FULLY oracled.
# The md5-derived +-1 planes are deterministic Python constants, so both
# engines can inline the identical literals; sign(dot) bucket assignment
# is reproducible (|dot| ~ O(sqrt(dim)) -- never near the 1-ulp zero
# boundary on real embeddings), which makes even the approximate tier
# hash-checkable, recall tradeoff and all.
# ---------------------------------------------------------------------------
def _lsh_sql(n_planes: int = 6, dim: int = 64, k: int = 5) -> str:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import _hyperplane

    planes = [_hyperplane(dim, p) for p in range(n_planes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {planes[p]!r}::DOUBLE[]) >= 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {bucket_terms} AS bucket
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM base WHERE vec_id < 10),
    sims AS (
      SELECT q.query_id, base.vec_id AS neighbor_id,
             round(list_dot_product(qv, v) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))),
                   6) AS cosine
      FROM base JOIN q USING (bucket)
      WHERE base.vec_id <> q.query_id),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
      FROM sims)
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {k}
    """


@register("ann_lsh_topk", _lsh_sql(), tags=("similarity", "ann", "lsh"))
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k (operators/similarity.lsh_cosine_topk):
    compare only vectors sharing the query's 6-bit sign bucket -- the
    bucket join prunes ~63/64 of the brute-force pairs at this setting,
    and the plan shuffles on the small-int bucket id (AQE splits hot
    buckets). The oracle reproduces the exact bucket assignment from the
    same literal planes, so recall loss is part of the CHECKED contract,
    not hand-waving."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import lsh_cosine_topk

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_cosine_topk(emb, queries, dim=64, k=5, n_planes=6)
