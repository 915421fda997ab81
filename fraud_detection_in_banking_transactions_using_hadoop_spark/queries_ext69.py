"""Extension batch 69: Johnson-Lindenstrauss projection distortion and
sign-bucket cluster purity -- two embedding-pipeline quality gauges.

Scale notes (the 100 TB story per query):
- jl_projection_distortion: random-projection dimensionality reduction
  (64 -> 16 dims with a +-1/sqrt(16) sign matrix) is the cheap first
  stage of every large-scale ANN/dedup pipeline; this query MEASURES
  the distance distortion JL promises to bound. The 1024 projection
  signs are md5-derived in Python at registration and inlined as
  literals in BOTH engines (one F.expr per leg -- the py4j/codegen
  lesson from semantic_dedup); distances are left-associative unrolled
  chains, so every double is bit-identical cross-engine. The pair scan
  is a constant 32-probe broadcast self-join (496 pairs) -- the
  distortion ESTIMATE needs a fixed sample, not the corpus.
- embedding_bucket_purity: how well do 8-bit sign buckets (the
  LSH/SemDeDup blocking key) align with document sources? Purity =
  majority-source share per bucket in exact ppm. One equi-join
  (embeddings x documents on id) + two groupBys; the argmax is a
  per-bucket max_by with source as tiebreak.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_JL_IN = 64
_JL_OUT = 16
_JL_PROBES = 32


def _jl_sign(j: int, k: int) -> int:
    return 1 if int(hashlib.md5(f"jl-{j}-{k}".encode()).hexdigest()[:1], 16) % 2 == 0 else -1


_JL_SIGNS = [[_jl_sign(j, k) for k in range(_JL_IN)] for j in range(_JL_OUT)]


def _sq_dist_sql(x: str, y: str, dim: int, one_based: bool) -> str:
    """Left-associative unrolled squared distance (bit-identical chain
    in both engines; DuckDB arrays are 1-based, Spark 0-based)."""
    off = 1 if one_based else 0
    terms = " + ".join(
        f"(({x})[{i + off}] - ({y})[{i + off}]) * (({x})[{i + off}] - ({y})[{i + off}])"
        for i in range(dim)
    )
    return f"0.0{'' if one_based else 'D'} + {terms}"


def _jl_proj_sq_sql(x: str, y: str, one_based: bool) -> str:
    """Unrolled squared distance of the JL projections of x and y:
    sum_j (sum_k s_jk * (x[k]-y[k]))^2 / OUT. Signs inlined as +-
    literals; inner and outer chains left-associative."""
    off = 1 if one_based else 0
    comps = []
    for j in range(_JL_OUT):
        inner = " + ".join(
            f"{'' if _JL_SIGNS[j][k] == 1 else '-'}"
            f"(({x})[{k + off}] - ({y})[{k + off}])"
            for k in range(_JL_IN)
        )
        comps.append(f"(0.0{'' if one_based else 'D'} + {inner})")
    sq = " + ".join(f"{c} * {c}" for c in comps)
    return f"(0.0{'' if one_based else 'D'} + {sq}) / {float(_JL_OUT)!r}"


@register(
    "jl_projection_distortion",
    f"""
    WITH probes AS (
      -- ::DOUBLE[] is load-bearing: bare `embedding` keeps the chain
      -- in FLOAT32 on DuckDB while Spark casts to double -- the d2/p2
      -- doubles then differ in the 8th digit on every pair (caught by
      -- the r10 sf0.1 sweep; sf0.01 only passed because round(6)
      -- absorbed the float noise).
      SELECT vec_id, embedding::DOUBLE[] AS embedding
      FROM embeddings WHERE vec_id < {_JL_PROBES}),
    pairs AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             {_sq_dist_sql('a.embedding', 'b.embedding', _JL_IN, True)} AS d2,
             {_jl_proj_sq_sql('a.embedding', 'b.embedding', True)} AS p2
      FROM probes a JOIN probes b ON a.vec_id < b.vec_id),
    ratios AS (
      SELECT CAST(floor(1e9 * sqrt(p2 / d2) + 0.5) AS BIGINT) AS ratio_e9
      FROM pairs WHERE d2 > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST((min(ratio_e9) + 500) // 1000 AS DOUBLE) / 1e6
             AS min_ratio,
           CAST((max(ratio_e9) + 500) // 1000 AS DOUBLE) / 1e6
             AS max_ratio,
           CAST((2 * CAST(sum(ratio_e9) AS BIGINT) + 1000 * count(*))
                // (2000 * count(*)) AS DOUBLE) / 1e6 AS avg_ratio,
           CAST(sum(CASE WHEN ratio_e9 BETWEEN 700000000 AND 1300000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30pct
    FROM ratios
    """,
    tags=("embedding", "jl", "dimensionality"),
)
def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance distortion of a 64->16 sign-matrix JL projection over
    496 probe pairs: ratio = projected distance / original distance,
    each pair's ratio an e9 integer before the order-free aggregate.
    The invariant test checks the JL promise empirically (mean ratio
    near 1, most pairs within 30%). At corpus scale the projection
    itself is one map-side expression per row; only the distortion
    AUDIT uses the bounded probe set."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probes = emb.where(F.col("vec_id") < _JL_PROBES)
    a = probes.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea")
    )
    b = probes.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("eb")
    )
    pairs = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        F.expr(_sq_dist_sql("ea", "eb", _JL_IN, False)).alias("d2"),
        F.expr(_jl_proj_sq_sql("ea", "eb", False)).alias("p2"),
    )
    # floor(x + 0.5) + pure-integer output rounding: the r10 sf0.1
    # sweep caught round() flipping one pair's e9 ratio between
    # Spark's BigDecimal HALF_UP and DuckDB's binary nearbyint, moving
    # max_ratio by 1e-6. Integer half-up is the same function in both.
    ratios = pairs.where(F.col("d2") > 0).select(
        F.floor(F.lit(1e9) * F.sqrt(F.col("p2") / F.col("d2")) + 0.5)
        .cast("bigint")
        .alias("ratio_e9")
    )
    return ratios.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                      F.min("ratio_e9").alias("mn"),
                      F.max("ratio_e9").alias("mx"),
                      F.sum("ratio_e9").cast("bigint").alias("s"),
                      F.sum(
                          F.when(
                              F.col("ratio_e9").between(700000000, 1300000000),
                              1,
                          ).otherwise(0)
                      ).cast("bigint").alias("n_within_30pct")).selectExpr(
        "n_pairs",
        "CAST((mn + 500) DIV 1000 AS DOUBLE) / 1e6 AS min_ratio",
        "CAST((mx + 500) DIV 1000 AS DOUBLE) / 1e6 AS max_ratio",
        "CAST((2 * s + 1000 * n_pairs) DIV (2000 * n_pairs) AS DOUBLE)"
        " / 1e6 AS avg_ratio",
        "n_within_30pct",
    )


@register(
    "embedding_bucket_purity",
    """
    WITH keyed AS (
      SELECT e.vec_id,
             (CASE WHEN e.embedding[1] > 0 THEN 1 ELSE 0 END)
             + 2 * (CASE WHEN e.embedding[2] > 0 THEN 1 ELSE 0 END)
             + 4 * (CASE WHEN e.embedding[3] > 0 THEN 1 ELSE 0 END)
             + 8 * (CASE WHEN e.embedding[4] > 0 THEN 1 ELSE 0 END)
             + 16 * (CASE WHEN e.embedding[5] > 0 THEN 1 ELSE 0 END)
             + 32 * (CASE WHEN e.embedding[6] > 0 THEN 1 ELSE 0 END)
             + 64 * (CASE WHEN e.embedding[7] > 0 THEN 1 ELSE 0 END)
             + 128 * (CASE WHEN e.embedding[8] > 0 THEN 1 ELSE 0 END) AS bucket,
             d.source
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    per AS (
      SELECT bucket, source, CAST(count(*) AS BIGINT) AS n
      FROM keyed GROUP BY bucket, source),
    best AS (
      SELECT bucket, CAST(sum(n) AS BIGINT) AS n_total,
             CAST(max(n) AS BIGINT) AS n_major
      FROM per GROUP BY bucket),
    majority AS (
      SELECT p.bucket, min(p.source) AS majority_source
      FROM per p JOIN best b ON p.bucket = b.bucket AND p.n = b.n_major
      GROUP BY p.bucket)
    SELECT CAST(b.bucket AS INTEGER) AS bucket, b.n_total,
           m.majority_source,
           b.n_major,
           CAST((1000000 * b.n_major) // b.n_total AS BIGINT) AS purity_ppm
    FROM best b JOIN majority m ON b.bucket = m.bucket
    """,
    tags=("embedding", "clustering", "quality"),
)
def q_embedding_bucket_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the 8-bit sign buckets (the SemDeDup/LSH blocking key) align
    with document sources? Per bucket: size, majority source (smallest
    source string on count ties -- deterministic both engines), and
    purity in exact ppm. Low purity = the blocking key mixes sources,
    high = embeddings encode the source signal. One equi-join + two
    groupBys; the per-bucket argmax is a min-on-ties aggregate."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    bucket = sum(
        (1 << k) * F.when(F.col("e").getItem(k) > 0, 1).otherwise(0) for k in range(8)
    )
    keyed = emb.join(docs, emb.vec_id == docs.doc_id).select(
        bucket.alias("bucket"), "source"
    )
    per = keyed.groupBy("bucket", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    best = per.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.max("n").cast("bigint").alias("n_major"),
    )
    majority = (
        per.join(best, "bucket")
        .where(F.col("n") == F.col("n_major"))
        .groupBy("bucket")
        .agg(F.min("source").alias("majority_source"))
    )
    return (
        best.join(majority, "bucket")
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_total",
            "majority_source",
            "n_major",
            F.expr("CAST((1000000 * n_major) DIV n_total AS BIGINT)").alias(
                "purity_ppm"
            ),
        )
    )
