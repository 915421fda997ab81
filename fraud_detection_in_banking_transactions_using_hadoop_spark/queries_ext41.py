"""Extension batch 41: perceptual-hash image dedup and Haar wavelet
energy decomposition.

Scale notes (the 100 TB story per query):
- image_phash_dedup is how image corpora deduplicate at scale: a
  perceptual difference-hash (adjacent-pixel gray comparisons) is
  computed MAP-SIDE by the real Arrow decoder, and near-dup candidate
  pairs come from an equi-join on the narrow BIGINT hash -- pixel
  bytes never shuffle, and per-hash fan-out bounds the pair join
  exactly like LSH bands bound text dedup. The DuckDB oracle
  re-derives every gray intensity and comparison bit from the md5
  hex, so the decode+hash path is hash-checked cross-engine.
- haar_wavelet_energy is the multi-resolution energy profile of the
  revenue series: three unnormalized Haar levels (pairwise sums and
  differences -- PURE INTEGER arithmetic) over the first 256 days,
  detail energy per level from exact decimal sums. Which time scale
  carries the variance, with zero float accumulation; each level is
  one bounded groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup pairs over the raw8 image tier.
# ---------------------------------------------------------------------------
@register(
    "image_phash_dedup",
    """
    WITH h AS (
      SELECT doc_id AS media_id,
             md5(CAST(doc_id AS VARCHAR) || 'a')
               || md5(CAST(doc_id AS VARCHAR) || 'b')
               || md5(CAST(doc_id AS VARCHAR) || 'c') AS hex
      FROM documents),
    px AS (
      SELECT media_id, p.p AS p,
             ('0x' || substr(hex, (p.p * 3 + 0) * 2 + 1, 2))::BIGINT
             + ('0x' || substr(hex, (p.p * 3 + 1) * 2 + 1, 2))::BIGINT
             + ('0x' || substr(hex, (p.p * 3 + 2) * 2 + 1, 2))::BIGINT AS g
      FROM h, (SELECT unnest(range(0, 16)) AS p) p),
    bits AS (
      SELECT a.media_id,
             CAST(sum(CASE WHEN a.g > b.g
                  THEN 1 << ((a.p // 4) * 3 + (a.p % 4)) ELSE 0 END)
                  AS BIGINT) AS dhash
      FROM px a JOIN px b
        ON a.media_id = b.media_id AND b.p = a.p + 1 AND a.p % 4 < 3
      GROUP BY a.media_id)
    SELECT x.dhash, x.media_id AS media_a, y.media_id AS media_b
    FROM bits x JOIN bits y
      ON x.dhash = y.dhash AND x.media_id < y.media_id
    """,
    tags=("multimodal", "dedup", "phash"),
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash over the deterministic raw8 corpus (the raw8_stats
    synthesis): the REAL numpy decoder computes gray intensities and
    the 12 horizontal comparison bits map-side; candidate pairs are an
    equi-join on the hash with id orientation. The oracle rebuilds
    every bit from hex arithmetic."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        image_dhash,
    )

    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(
            F.concat(
                F.md5(F.concat(d, F.lit("a"))),
                F.md5(F.concat(d, F.lit("b"))),
                F.md5(F.concat(d, F.lit("c"))),
            )
        ).alias("content"),
    )
    hashes = image_dhash(media, width=4, height=4)
    x = hashes.select(F.col("dhash"), F.col("media_id").alias("media_a"))
    y = hashes.select(F.col("dhash").alias("dh2"), F.col("media_id").alias("media_b"))
    return (
        x.join(y, (F.col("dhash") == F.col("dh2")) & (F.col("media_a") < F.col("media_b")))
        .select("dhash", "media_a", "media_b")
    )


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition of the daily revenue series.
# ---------------------------------------------------------------------------
@register(
    "haar_wavelet_energy",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    idx AS (
      SELECT c, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM days QUALIFY row_number() OVER (ORDER BY d) <= 256
    ),
    l1 AS (
      SELECT (i - 1) // 2 AS j,
             CAST(sum(CASE WHEN i % 2 = 1 THEN c ELSE 0 END)
                  - sum(CASE WHEN i % 2 = 0 THEN c ELSE 0 END) AS HUGEINT)
               AS det,
             CAST(sum(c) AS BIGINT) AS app
      FROM idx GROUP BY (i - 1) // 2
    ),
    l2 AS (
      SELECT j // 2 AS j,
             CAST(sum(CASE WHEN j % 2 = 0 THEN app ELSE 0 END)
                  - sum(CASE WHEN j % 2 = 1 THEN app ELSE 0 END) AS HUGEINT)
               AS det,
             CAST(sum(app) AS BIGINT) AS app2
      FROM l1 GROUP BY j // 2
    ),
    l3 AS (
      SELECT j // 2 AS j,
             CAST(sum(CASE WHEN j % 2 = 0 THEN app2 ELSE 0 END)
                  - sum(CASE WHEN j % 2 = 1 THEN app2 ELSE 0 END) AS HUGEINT)
               AS det
      FROM l2 GROUP BY j // 2
    )
    SELECT CAST(1 AS INTEGER) AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
           CAST(sum(det * det) AS DOUBLE) AS energy
    FROM l1
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(det * det) AS DOUBLE) FROM l2
    UNION ALL
    SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(det * det) AS DOUBLE) FROM l3
    ORDER BY level
    """,
    tags=("timeseries", "wavelet", "signal"),
)
def q_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unnormalized Haar levels over the first 256 daily revenue
    values: detail = pair difference, approximation = pair sum, all
    exact integers; per-level detail energy accumulates in exact
    decimal and converts to DOUBLE once (deterministic conversion).
    Each level is one bounded groupBy on the halved index."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    idx = (
        days.select("c", F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"))
        .where(F.col("i") <= 256)
    )

    def level(df, icol, vcol):
        return df.groupBy(F.expr(f"({icol} - 1) DIV 2").alias("j")).agg(
            (
                F.sum(F.when(F.col(icol) % 2 == 1, F.col(vcol)).otherwise(0))
                - F.sum(F.when(F.col(icol) % 2 == 0, F.col(vcol)).otherwise(0))
            )
            .cast(_DEC)
            .alias("det"),
            F.sum(vcol).cast("bigint").alias("app"),
        ).select((F.col("j") + 1).alias("i2"), "det", "app")

    l1 = level(idx, "i", "c")
    l2 = level(l1.select(F.col("i2").alias("i"), F.col("app").alias("c")), "i", "c")
    l3 = level(l2.select(F.col("i2").alias("i"), F.col("app").alias("c")), "i", "c")

    def summarize(df, lv):
        return df.agg(
            F.lit(lv).cast("integer").alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum(F.col("det") * F.col("det")).cast(_DEC).cast("double").alias("energy"),
        )

    out = summarize(l1, 1).unionByName(summarize(l2, 2)).unionByName(summarize(l3, 3))
    return out.orderBy("level")
