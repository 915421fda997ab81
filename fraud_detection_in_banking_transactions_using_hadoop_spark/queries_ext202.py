"""Extension batch 202 (round 8): geostatistics -- the empirical
semivariogram (and its directional/anisotropy split) of a field over
the embedding plane: points = (embedding[1], embedding[2]), field
z = embedding[3].

gamma(h) = (1 / 2|N(h)|) * sum over pairs at lag-bin h of (z_i - z_j)^2
is THE spatial-dependence summary (nugget/sill/range live on it).

Cross-engine exactness: distances quantize to e9 integers (the
lof_embedding_plane convention), the field to e6 integers, so every
squared difference is an exact integer; per-bin sums accumulate in
HUGEINT/DECIMAL(38) (they pass 2^63 at sf0.1) and divide once at the
end. The estimator is the exact all-pairs form (i < j) like the
ripley_k / LOF tier -- documented brute-force baseline; at 100 TB the
scale path is the same grid-cell equi-join ripley_k_grid ships, binned
per cell pair."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_BIN_Q = 200000000  # e9-quantized distance units per lag bin (0.2)
_NBINS = 9  # bins 0..9, the last capped

_PAIRS_SQL = f"""
    pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS px,
             CAST(embedding[2] AS DOUBLE) AS py,
             CAST(round(1000000.0 * CAST(embedding[3] AS DOUBLE), 0)
                  AS BIGINT) AS z
      FROM embeddings),
    pair AS (
      SELECT least(CAST(round(1.0e9 * sqrt(
               (a.px - b.px) * (a.px - b.px)
               + (a.py - b.py) * (a.py - b.py)), 0) AS BIGINT)
               // {_BIN_Q}, {_NBINS}) AS bin,
             CASE WHEN abs(a.px - b.px) >= abs(a.py - b.py)
                  THEN 'EW' ELSE 'NS' END AS direction,
             (a.z - b.z) * (a.z - b.z) AS sqd
      FROM pts a JOIN pts b ON a.vec_id < b.vec_id)
"""


@register(
    "semivariogram_embedding",
    f"""
    WITH {_PAIRS_SQL}
    SELECT bin,
           round(bin * 0.2, 1) AS lag_lo,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(CAST(sum(CAST(sqd AS HUGEINT)) AS DOUBLE)
                 AS DOUBLE) / (2.0 * count(*)) / 1e12, 6) AS gamma
    FROM pair GROUP BY bin
    """,
    tags=("spatial", "geostatistics", "exact-arith"),
)
def q_semivariogram_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of embedding[3] over the (dim1, dim2)
    plane: per 0.2-wide lag bin, half the mean squared field difference
    (rescaled back from the e6 quantization by /1e12). Rising gamma
    toward a sill = spatial dependence with finite range; flat gamma
    at the nugget = no structure. Exact integer pair sums."""
    emb = read_table(spark, sf_dir, "embeddings")
    # Spark arrays are 0-based via []; the SQL side's embedding[1]
    # (DuckDB, 1-based) is embedding[0] here. z = third component.
    pts = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("px"),
        F.col("embedding")[1].cast("double").alias("py"),
        F.expr(
            "CAST(round(1000000.0 * CAST(element_at(embedding, 3)"
            " AS DOUBLE), 0) AS BIGINT)"
        ).alias("z"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    pair = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.expr(
            f"least(CAST(round(1.0e9 * sqrt((a.px - b.px) * (a.px - b.px)"
            f" + (a.py - b.py) * (a.py - b.py)), 0) AS BIGINT)"
            f" DIV {_BIN_Q}, {_NBINS}L)"
        ).alias("bin"),
        F.expr("(a.z - b.z) * (a.z - b.z)").alias("sqd"),
    )
    return pair.groupBy("bin").agg(
        F.round(F.col("bin") * 0.2, 1).alias("lag_lo"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.expr("CAST(sum(CAST(sqd AS DECIMAL(38,0))) AS DOUBLE)")
            / (2.0 * F.count(F.lit(1)))
            / 1e12,
            6,
        ).alias("gamma"),
    ).select("bin", "lag_lo", "n_pairs", "gamma")


@register(
    "semivariogram_anisotropy",
    f"""
    WITH {_PAIRS_SQL}
    SELECT direction, bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(CAST(sum(CAST(sqd AS HUGEINT)) AS DOUBLE)
                 AS DOUBLE) / (2.0 * count(*)) / 1e12, 6) AS gamma
    FROM pair GROUP BY direction, bin
    """,
    tags=("spatial", "geostatistics", "exact-arith"),
)
def q_semivariogram_anisotropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Directional semivariogram: the same lag bins split by dominant
    axis (|dx| >= |dy| -> EW, else NS). Materially different EW/NS
    gamma curves = anisotropic spatial structure (the range depends on
    direction); isotropy is the null on embedding data."""
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("px"),
        F.col("embedding")[1].cast("double").alias("py"),
        F.expr(
            "CAST(round(1000000.0 * CAST(element_at(embedding, 3)"
            " AS DOUBLE), 0) AS BIGINT)"
        ).alias("z"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    pair = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.expr(
            f"least(CAST(round(1.0e9 * sqrt((a.px - b.px) * (a.px - b.px)"
            f" + (a.py - b.py) * (a.py - b.py)), 0) AS BIGINT)"
            f" DIV {_BIN_Q}, {_NBINS}L)"
        ).alias("bin"),
        F.expr(
            "CASE WHEN abs(a.px - b.px) >= abs(a.py - b.py)"
            " THEN 'EW' ELSE 'NS' END"
        ).alias("direction"),
        F.expr("(a.z - b.z) * (a.z - b.z)").alias("sqd"),
    )
    return pair.groupBy("direction", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.expr("CAST(sum(CAST(sqd AS DECIMAL(38,0))) AS DOUBLE)")
            / (2.0 * F.count(F.lit(1)))
            / 1e12,
            6,
        ).alias("gamma"),
    ).select("direction", "bin", "n_pairs", "gamma")
