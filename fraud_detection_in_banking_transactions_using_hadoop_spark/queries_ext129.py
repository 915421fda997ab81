"""Extension batch 129 (round 6): retrieval evaluation -- mean
reciprocal rank and precision@k of the cosine ranking against the
label relevance signal.

Scale notes: both run on the bounded 20-anchor brute-force ranking
(ann_cosine baseline family, whitelisted); rank positions come from a
per-anchor partitioned window, reciprocal ranks fold as exact e9
integers, and the fleet numbers are integer-ratio closes. The bucketed
ANN tiers (LSH/IVF) are the scale path for the ranking itself; these
queries are the EVAL harness you point at either tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_N_Q = 20
_P_AT = 5

_RANKED_CTE = f"""
    base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    anch AS (SELECT * FROM base WHERE vec_id < {_N_Q}),
    sims AS (
      SELECT a.vec_id AS query_id, a.label AS qlabel,
             b.vec_id AS other_id, b.label AS olabel,
             round(list_dot_product(a.v, b.v) /
                   (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
      FROM anch a, base b WHERE a.vec_id <> b.vec_id),
    ranked AS (
      SELECT query_id, qlabel, other_id, olabel,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, other_id) AS BIGINT) AS rk
      FROM sims)"""


@register(
    "mean_reciprocal_rank",
    f"""
    WITH {_RANKED_CTE},
    firsts AS (
      SELECT query_id, CAST(min(rk) AS BIGINT) AS first_rel
      FROM ranked WHERE olabel = qlabel GROUP BY query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN first_rel = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit_at_1,
           round(CAST(sum(CAST(round(1000000000.0 / first_rel, 0) AS BIGINT))
                 AS DOUBLE) / count(*) / 1000000000.0, 6) AS mrr
    FROM firsts
    """,
    tags=("ml", "retrieval", "evaluation"),
)
def q_mean_reciprocal_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR of the cosine ranking with same-label as relevance: per
    query, 1/rank of the FIRST same-label neighbor, averaged (each
    reciprocal e9-rounds to an integer before the order-free sum).
    The metric that grades 'did the right answer come first', which
    recall@k can't see."""
    ranked = _ranked(spark, sf_dir)
    firsts = (
        ranked.where(F.col("olabel") == F.col("qlabel"))
        .groupBy("query_id")
        .agg(F.min("rk").cast("bigint").alias("first_rel"))
    )
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("first_rel") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hit_at_1"),
        F.round(
            F.sum(
                F.round(F.lit(1000000000.0) / F.col("first_rel"), 0).cast(
                    "bigint"
                )
            ).cast("double")
            / F.count(F.lit(1))
            / 1000000000.0,
            6,
        ).alias("mrr"),
    )


@register(
    "precision_at_k_labels",
    f"""
    WITH {_RANKED_CTE},
    topk AS (SELECT * FROM ranked WHERE rk <= {_P_AT}),
    per AS (
      SELECT query_id,
             CAST(sum(CASE WHEN olabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel
      FROM topk GROUP BY query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST({_P_AT} AS BIGINT) AS k,
           CAST(sum(n_rel) AS BIGINT) AS n_relevant_total,
           round(CAST(sum(n_rel) AS DOUBLE) / (count(*) * {_P_AT}), 6)
             AS precision_at_k
    FROM per
    """,
    tags=("ml", "retrieval", "evaluation"),
)
def q_precision_at_k_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@5 of the cosine ranking under same-label relevance:
    the fraction of top-5 neighbors sharing the query's label, fleet-
    averaged as one exact integer ratio. Together with MRR (first-hit
    depth) and lsh_recall_eval (tier fidelity) this completes the
    retrieval eval harness."""
    ranked = _ranked(spark, sf_dir)
    per = (
        ranked.where(F.col("rk") <= _P_AT)
        .groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("olabel") == F.col("qlabel"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_rel")
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(_P_AT).cast("bigint").alias("k"),
        F.sum("n_rel").cast("bigint").alias("n_relevant_total"),
        F.round(
            F.sum("n_rel").cast("double") / (F.count(F.lit(1)) * _P_AT), 6
        ).alias("precision_at_k"),
    )


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    anch = emb.where(F.col("vec_id") < _N_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
        )

    sims = (
        emb.crossJoin(F.broadcast(anch))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("other_id"),
            F.col("label").alias("olabel"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("v"), F.col("v")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("other_id")
    )
    return sims.withColumn("rk", F.row_number().over(w).cast("bigint"))
