"""Extension batch 146 (round 6): representation-quality diagnostics
over the embedding corpus -- the Wang-Isola alignment/uniformity pair
(the two-number summary of contrastive-embedding health: positives
close, everything else spread on the sphere), the TwoNN intrinsic-
dimension estimator (how many degrees of freedom the 64-d vectors
actually use), and the participation ratio (the eigenvalue-free
effective-rank tr(C)^2 / tr(C^2), computable from pure Gram
aggregates -- no eigensolve, unlike pca_fit).

Cross-engine discipline:
- Pair dots ride DuckDB list_dot_product == Spark's sequential fold
  (bit-identical; the ann_cosine_topk precedent). Every pair-level
  float (exp terms, squared distances, ln ratios, Gram products) is
  e9/e12-quantized per row before summation, so engine float order
  never matters.
- TwoNN's nearest-neighbor ratio uses 0.5*ln(d2^2/d1^2) -- no sqrt of
  tiny values; exact-duplicate neighbors (embedding_dup_pairs shows
  they exist) are excluded by the d^2 > 1e-12 guard BEFORE ranking.

Scale notes:
- uniformity_alignment / twonn: bounded ANCHOR joins (20 / 50 anchors
  x corpus -- the hard_negative_mining pattern), never all-pairs.
- participation_ratio: each vector emits its d(d+1)/2 dimension pairs
  map-side (the embedding_covariance Gram path); the only shuffle is
  the 2080-cell aggregate. This is the 100 TB whitening-health check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_DIM = 64
_N_ANCH_UA = 20
_N_ANCH_ID = 50


def _fold_dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
    )


@register(
    "uniformity_alignment",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    anch AS (SELECT * FROM base WHERE vec_id < {_N_ANCH_UA}),
    pairs AS (
      SELECT a.vec_id AS qa, b.vec_id AS qb,
             CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS pos,
             list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
               - 2.0 * list_dot_product(a.v, b.v) AS d2
      FROM anch a JOIN base b ON a.vec_id <> b.vec_id),
    quant AS (
      SELECT pos,
             CAST(floor(d2 * 1e12 + 0.5) AS BIGINT) AS d2_e12,
             CAST(floor(exp(-2.0 * d2) * 1e12 + 0.5) AS BIGINT) AS u_e12
      FROM pairs),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(CASE WHEN pos = 1 THEN d2_e12 END) AS HUGEINT) AS s_pos,
             CAST(sum(u_e12) AS HUGEINT) AS s_unif
      FROM quant)
    SELECT n_pairs AS n_anchor_pairs, n_pos AS n_positive_pairs,
           round(CAST(s_pos AS DOUBLE) / 1e12 / n_pos, 6) AS alignment_l2sq,
           round(ln(CAST(s_unif AS DOUBLE) / 1e12 / n_pairs), 6) + 0.0
             AS uniformity_log
    FROM agg
    """,
    tags=("embedding", "quality", "contrastive"),
)
def q_uniformity_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wang-Isola representation metrics from 20 deterministic anchors
    against the whole corpus: alignment = mean ||x-y||^2 over
    same-label pairs (smaller = positives embed together), uniformity
    = ln mean exp(-2||x-y||^2) over ALL pairs (more negative = mass
    spread over the sphere; 0 = total collapse). Distances come from
    three fold-dots; both the squared distances and the Gaussian-
    kernel terms are e12-quantized before their sums."""
    base = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    anch = base.where(F.col("vec_id") < _N_ANCH_UA).select(
        F.col("vec_id").alias("qa"),
        F.col("label").alias("la"),
        F.col("v").alias("va"),
    )
    pairs = anch.join(base, F.col("vec_id") != F.col("qa")).select(
        F.when(F.col("la") == F.col("label"), 1).otherwise(0).alias("pos"),
        (
            _fold_dot(F.col("va"), F.col("va"))
            + _fold_dot(F.col("v"), F.col("v"))
            - 2.0 * _fold_dot(F.col("va"), F.col("v"))
        ).alias("d2"),
    )
    quant = pairs.select(
        "pos",
        F.floor(F.col("d2") * 1e12 + 0.5).cast(_DEC).alias("d2_e12"),
        F.floor(F.exp(-2.0 * F.col("d2")) * 1e12 + 0.5).cast(_DEC).alias("u_e12"),
    )
    agg = quant.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("pos") == 1, F.col("d2_e12"))).cast(_DEC).alias("s_pos"),
        F.sum("u_e12").cast(_DEC).alias("s_unif"),
    )
    return agg.select(
        F.col("n_pairs").alias("n_anchor_pairs"),
        F.col("n_pos").alias("n_positive_pairs"),
        F.round(
            F.col("s_pos").cast("double") / 1e12 / F.col("n_pos"), 6
        ).alias("alignment_l2sq"),
        (
            F.round(
                F.log(F.col("s_unif").cast("double") / 1e12 / F.col("n_pairs")),
                6,
            )
            + F.lit(0.0)
        ).alias("uniformity_log"),
    )


@register(
    "twonn_intrinsic_dim",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    anch AS (SELECT * FROM base WHERE vec_id < {_N_ANCH_ID}),
    dists AS (
      SELECT a.vec_id AS qa, b.vec_id AS qb,
             list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
               - 2.0 * list_dot_product(a.v, b.v) AS d2
      FROM anch a JOIN base b ON a.vec_id <> b.vec_id),
    ranked AS (
      SELECT qa, d2,
             row_number() OVER (PARTITION BY qa ORDER BY d2, qb) AS rk
      FROM dists WHERE d2 > 1e-12),
    mu AS (
      SELECT qa,
             CAST(floor(0.5 * ln(max(CASE WHEN rk = 2 THEN d2 END)
                      / max(CASE WHEN rk = 1 THEN d2 END)) * 1e9 + 0.5)
                  AS BIGINT) AS lnmu_e9
      FROM ranked WHERE rk <= 2 GROUP BY qa)
    SELECT CAST(count(*) AS BIGINT) AS n_anchors,
           round(avg(CAST(lnmu_e9 AS DOUBLE)) / 1e9, 6) AS mean_ln_mu,
           round(CAST(count(*) AS DOUBLE)
                 / (CAST(sum(lnmu_e9) AS DOUBLE) / 1e9), 4)
             AS intrinsic_dim_twonn
    FROM mu
    """,
    tags=("embedding", "quality", "dimension"),
)
def q_twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic dimension (Facco et al.): for 50 anchors, the
    ratio mu = r2/r1 of the two nearest-neighbor distances follows
    P(mu > x) = x^-d under local uniformity, so d_hat = m / sum ln mu.
    ln mu = 0.5 ln(d2^2/d1^2) straight from squared distances (no
    sqrt); exact-duplicate vectors are excluded before ranking; the
    per-anchor log ratios are e9-quantized so the MLE sum is exact.
    A value far below 64 is why the IVF/LSH buckets work at all."""
    base = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    anch = base.where(F.col("vec_id") < _N_ANCH_ID).select(
        F.col("vec_id").alias("qa"), F.col("v").alias("va")
    )
    dists = anch.join(base, F.col("vec_id") != F.col("qa")).select(
        "qa",
        F.col("vec_id").alias("qb"),
        (
            _fold_dot(F.col("va"), F.col("va"))
            + _fold_dot(F.col("v"), F.col("v"))
            - 2.0 * _fold_dot(F.col("va"), F.col("v"))
        ).alias("d2"),
    )
    w = Window.partitionBy("qa").orderBy("d2", "qb")
    ranked = (
        dists.where(F.col("d2") > 1e-12)
        .select("qa", "d2", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 2)
    )
    mu = ranked.groupBy("qa").agg(
        F.floor(
            0.5
            * F.log(
                F.max(F.when(F.col("rk") == 2, F.col("d2")))
                / F.max(F.when(F.col("rk") == 1, F.col("d2")))
            )
            * 1e9
            + 0.5
        )
        .cast("bigint")
        .alias("lnmu_e9")
    )
    return mu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        F.round(F.avg(F.col("lnmu_e9").cast("double")) / 1e9, 6).alias(
            "mean_ln_mu"
        ),
        F.round(
            F.count(F.lit(1)).cast("double")
            / (F.sum("lnmu_e9").cast("double") / 1e9),
            4,
        ).alias("intrinsic_dim_twonn"),
    )


@register(
    "participation_ratio_embeddings",
    f"""
    WITH x AS (
      SELECT vec_id, i, j,
             CAST(embedding[i] AS DOUBLE) AS va,
             CAST(embedding[j] AS DOUBLE) AS vb
      FROM embeddings,
           (SELECT unnest(range(1, {_DIM + 1})) AS i) ii,
           (SELECT unnest(range(1, {_DIM + 1})) AS j) jj
      WHERE j >= i),
    cells AS (
      SELECT i, j,
             CAST(sum(CAST(floor(va * vb * 1e12 + 0.5) AS BIGINT)) AS HUGEINT)
               AS s_e12,
             CAST(sum(CASE WHEN i = j
                  THEN CAST(floor(va * 1e12 + 0.5) AS BIGINT) END) AS HUGEINT)
               AS m_e12,
             CAST(count(*) AS BIGINT) AS n
      FROM x GROUP BY i, j),
    means AS (
      SELECT i AS d, CAST(m_e12 AS DOUBLE) / 1e12 / n AS mu
      FROM cells WHERE i = j),
    cov AS (
      SELECT c.i, c.j,
             CAST(c.s_e12 AS DOUBLE) / 1e12 / c.n - ma.mu * mb.mu AS cij
      FROM cells c JOIN means ma ON ma.d = c.i JOIN means mb ON mb.d = c.j),
    quant AS (
      SELECT CASE WHEN i = j THEN 1 ELSE 2 END AS w,
             CAST(floor(cij * 1e9 + 0.5) AS BIGINT) AS c_e9,
             CAST(floor(cij * cij * 1e12 + 0.5) AS BIGINT) AS c2_e12,
             i, j
      FROM cov),
    agg AS (
      SELECT CAST(sum(CASE WHEN i = j THEN c_e9 END) AS BIGINT) AS tr_e9,
             CAST(sum(w * c2_e12) AS BIGINT) AS tr2_e12
      FROM quant)
    SELECT CAST({_DIM} AS INTEGER) AS dim,
           round(tr_e9 / 1e9, 6) AS trace_cov,
           round((tr_e9 / 1e9) * (tr_e9 / 1e9) / (tr2_e12 / 1e12), 4)
             AS participation_ratio,
           round((tr_e9 / 1e9) * (tr_e9 / 1e9) / (tr2_e12 / 1e12) / {_DIM}, 6)
             AS pr_fraction_of_dim
    FROM agg
    """,
    tags=("embedding", "quality", "dimension"),
)
def q_participation_ratio_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio PR = tr(C)^2 / tr(C^2) of the embedding
    covariance -- the effective number of dimensions carrying
    variance, WITHOUT an eigensolve: tr(C^2) = sum C_ij^2 needs only
    the Gram cells. Each vector emits its d(d+1)/2 dimension pairs
    map-side (embedding_covariance's no-join path); per-row products
    are e12-quantized so cell sums are exact, covariance cells are
    identical doubles, and the final two traces fold e9/e12 integers.
    PR == dim for isotropic vectors, << dim when variance collapses
    onto a few directions (the anisotropy that kills cosine recall)."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    x = (
        emb.select(v.alias("v"))
        .select("v", F.explode(F.sequence(F.lit(1), F.lit(_DIM))).alias("i"))
        .select(
            "v",
            "i",
            F.explode(F.sequence(F.col("i"), F.lit(_DIM))).alias("j"),
        )
        .select(
            "i",
            "j",
            F.try_element_at("v", F.col("i")).alias("va"),
            F.try_element_at("v", F.col("j")).alias("vb"),
        )
    )
    cells = x.groupBy("i", "j").agg(
        F.sum(F.floor(F.col("va") * F.col("vb") * 1e12 + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("s_e12"),
        F.sum(
            F.when(
                F.col("i") == F.col("j"),
                F.floor(F.col("va") * 1e12 + 0.5).cast("bigint"),
            )
        )
        .cast(_DEC)
        .alias("m_e12"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    means = cells.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"),
        (F.col("m_e12").cast("double") / 1e12 / F.col("n")).alias("mu"),
    )
    ma = means.select(F.col("d").alias("da"), F.col("mu").alias("mua"))
    mb = means.select(F.col("d").alias("db"), F.col("mu").alias("mub"))
    cov = (
        cells.join(F.broadcast(ma), cells.i == ma.da)
        .join(F.broadcast(mb), cells.j == mb.db)
        .select(
            "i",
            "j",
            (
                F.col("s_e12").cast("double") / 1e12 / F.col("n")
                - F.col("mua") * F.col("mub")
            ).alias("cij"),
        )
    )
    quant = cov.select(
        "i",
        "j",
        F.when(F.col("i") == F.col("j"), 1).otherwise(2).alias("w"),
        F.floor(F.col("cij") * 1e9 + 0.5).cast("bigint").alias("c_e9"),
        F.floor(F.col("cij") * F.col("cij") * 1e12 + 0.5)
        .cast("bigint")
        .alias("c2_e12"),
    )
    agg = quant.agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("c_e9")))
        .cast("bigint")
        .alias("tr_e9"),
        F.sum(F.col("w") * F.col("c2_e12")).cast("bigint").alias("tr2_e12"),
    )
    tr = F.col("tr_e9") / 1e9
    tr2 = F.col("tr2_e12") / 1e12
    return agg.select(
        F.lit(_DIM).cast("integer").alias("dim"),
        F.round(tr, 6).alias("trace_cov"),
        F.round(tr * tr / tr2, 4).alias("participation_ratio"),
        F.round(tr * tr / tr2 / _DIM, 6).alias("pr_fraction_of_dim"),
    )
