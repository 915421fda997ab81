"""Extension batch 35: audio PCM window features (third multimodal
modality), a language-ID confusion matrix, and exact median CIs from
order statistics.

Scale notes (the 100 TB story per query):
- multimodal_audio_energy drives the REAL Arrow audio front end
  (operators/multimodal.audio_window_stats): 512-byte int16-LE PCM
  clips decode map-side into 64-sample windows of (RMS, zero
  crossings, peak) -- the VAD/energy-gating pass of an audio corpus
  pipeline. Bytes never shuffle; the DuckDB oracle re-derives every
  sample from the md5 hex including the int16 two's-complement wrap,
  so the binary decode is hash-checked cross-engine. With raw8 images
  and frame-sampled video this completes the image/video/audio
  multimodal tier.
- langid_confusion turns the lang_id heuristic into its evaluation
  artifact: the (true, predicted) confusion matrix with per-class
  recall shares -- one groupBy to <=9 cells plus a class-partitioned
  window. Classifier AND its eval, both oracled.
- median_ci_orderstat is the distribution-free median confidence
  interval: the binomial normal-approximation rank bounds l, u are
  computed from n alone, and all three order statistics (median, lo,
  hi) are looked up on the distinct-value spine via cumulative counts
  -- no per-row ranks, no global sort, ties handled by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table, spread

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"

_AUDIO_DIGESTS = 32  # 32 md5 = 512 bytes = 256 int16 samples = 4 windows
_HEX_SQL = "\n               || ".join(
    f"md5(CAST(doc_id AS VARCHAR) || 'a{i}')" for i in range(_AUDIO_DIGESTS)
)


@register(
    "multimodal_audio_energy",
    f"""
    WITH h AS (
      SELECT doc_id AS media_id,
             {_HEX_SQL} AS hex
      FROM documents),
    b AS (
      SELECT media_id, i.i AS i,
             ('0x' || substr(hex, i.i * 4 + 1, 2))::BIGINT
               + 256 * ('0x' || substr(hex, i.i * 4 + 3, 2))::BIGINT AS u
      FROM h, (SELECT unnest(range(0, 256)) AS i) i),
    s AS (
      SELECT media_id, i,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v,
             i // 64 AS w
      FROM b),
    nxt AS (
      SELECT media_id, i, v, w,
             lead(v) OVER (PARTITION BY media_id ORDER BY i) AS v2,
             lead(w) OVER (PARTITION BY media_id ORDER BY i) AS w2
      FROM s)
    SELECT media_id, CAST(w AS BIGINT) AS win_idx,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           CAST(sum(CASE WHEN w2 = w AND v * v2 < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_zero_cross,
           round(sqrt(CAST(sum(v * v) AS DOUBLE) / 64), 6) AS rms
    FROM nxt GROUP BY media_id, w
    """,
    tags=("multimodal", "arrow", "audio"),
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesizes a deterministic 512-byte int16-LE PCM clip per doc
    (32 md5 digests), then runs the REAL numpy window reducer over
    mapInPandas. The oracle rebuilds each sample with hex arithmetic
    (two's-complement wrap included) and aggregates per 64-sample
    window; numpy's float64 RMS matches SQL's after round(6)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
        audio_window_stats,
    )

    docs = spread(read_table(spark, sf_dir, "documents"))
    d = F.col("doc_id").cast("string")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(
            F.concat(
                *[F.md5(F.concat(d, F.lit(f"a{i}"))) for i in range(_AUDIO_DIGESTS)]
            )
        ).alias("content"),
    )
    stats = audio_window_stats(media, window_samples=64)
    return stats.select(
        "media_id",
        "win_idx",
        "n_samples",
        "peak_abs",
        "n_zero_cross",
        F.round("rms", 6).alias("rms"),
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix with per-class recall shares.
# ---------------------------------------------------------------------------
@register(
    "langid_confusion",
    """
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    h AS (
      SELECT lang,
             len(list_filter(toks, x -> x IN ('the', 'a', 'fast'))) AS h_en,
             len(list_filter(toks, x -> x IN ('data', 'row'))) AS h_es,
             len(list_filter(toks, x -> x IN ('table', 'join'))) AS h_zh
      FROM t),
    pred AS (
      SELECT lang,
             CASE WHEN h_en >= h_es AND h_en >= h_zh THEN 'en'
                  WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS predicted
      FROM h),
    cells AS (
      SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY lang, predicted)
    SELECT lang, predicted, n,
           CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_true,
           CAST((1000000 * n)
                // sum(n) OVER (PARTITION BY lang) AS BIGINT) AS share_ppm,
           CAST(CASE WHEN lang = predicted THEN 1 ELSE 0 END AS INTEGER)
             AS is_correct
    FROM cells
    """,
    tags=("text", "eval", "confusion"),
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang_id heuristic against the labeled
    lang column: cell counts, per-true-class totals (partitioned
    window), recall share in integer ppm. One groupBy to <=9 cells --
    the eval artifact that decides whether the classifier's thresholds
    move."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    h_en = F.size(F.filter(toks, lambda t: t.isin("the", "a", "fast")))
    h_es = F.size(F.filter(toks, lambda t: t.isin("data", "row")))
    h_zh = F.size(F.filter(toks, lambda t: t.isin("table", "join")))
    pred = docs.select(
        "lang",
        F.when((h_en >= h_es) & (h_en >= h_zh), "en")
        .when(h_es >= h_zh, "es")
        .otherwise("zh")
        .alias("predicted"),
    )
    cells = pred.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "predicted",
        "n",
        F.sum("n").over(w).cast("bigint").alias("n_true"),
        F.expr("CAST((1000000 * n) DIV sum(n) OVER (PARTITION BY lang) AS BIGINT)").alias(
            "share_ppm"
        ),
        F.when(F.col("lang") == F.col("predicted"), 1).otherwise(0).cast("integer").alias(
            "is_correct"
        ),
    )


# ---------------------------------------------------------------------------
# Distribution-free median CI from order statistics on the spine.
# ---------------------------------------------------------------------------
@register(
    "median_ci_orderstat",
    f"""
    WITH vals AS (SELECT {_CENTS} AS v FROM orders),
    spine AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
    cum AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST((sum(c) + 1) // 2 AS BIGINT) AS r_med,
             CAST(greatest(floor((sum(c) - 1.959964 * sqrt(sum(c))) / 2), 1)
                  AS BIGINT) AS r_lo,
             CAST(least(ceil(1 + (sum(c) + 1.959964 * sqrt(sum(c))) / 2),
                        sum(c)) AS BIGINT) AS r_hi
      FROM spine),
    pick AS (
      SELECT t.n, t.r_lo, t.r_hi,
             min(CASE WHEN cum.cc >= t.r_med THEN cum.v END) AS median_cents,
             min(CASE WHEN cum.cc >= t.r_lo THEN cum.v END) AS lo_cents,
             min(CASE WHEN cum.cc >= t.r_hi THEN cum.v END) AS hi_cents
      FROM cum CROSS JOIN tot t
      GROUP BY t.n, t.r_lo, t.r_hi)
    SELECT n, r_lo, r_hi, median_cents, lo_cents, hi_cents FROM pick
    """,
    tags=("stats", "order-statistics", "uncertainty"),
)
def q_median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% distribution-free CI for the median: binomial
    normal-approximation rank bounds from n alone, then all three
    order statistics looked up as 'first spine value whose cumulative
    count reaches the rank'. No per-row ranks, no global sort; the
    rank bounds broadcast."""
    orders = read_table(spark, sf_dir, "orders")
    spine = orders.select(F.expr(_CENTS).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # o_totalprice's distinct-cent spine is ~O(rows): cumulative count
    # via the two-level rank plan, not a single-task global window
    cum = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc": "c"}
    ).select("v", "cc")
    sn = F.sum("c")
    tot = spine.agg(
        sn.cast("bigint").alias("n"),
        F.expr("CAST((sum(c) + 1) DIV 2 AS BIGINT)").alias("r_med"),
        F.greatest(
            F.floor((sn - 1.959964 * F.sqrt(sn)) / 2), F.lit(1).cast("bigint")
        )
        .cast("bigint")
        .alias("r_lo"),
        F.least(
            F.ceil(1 + (sn + 1.959964 * F.sqrt(sn)) / 2), sn.cast("bigint")
        )
        .cast("bigint")
        .alias("r_hi"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n", "r_lo", "r_hi")
        .agg(
            F.min(F.when(F.col("cc") >= F.col("r_med"), F.col("v"))).alias(
                "median_cents"
            ),
            F.min(F.when(F.col("cc") >= F.col("r_lo"), F.col("v"))).alias("lo_cents"),
            F.min(F.when(F.col("cc") >= F.col("r_hi"), F.col("v"))).alias("hi_cents"),
        )
        .select("n", "r_lo", "r_hi", "median_cents", "lo_cents", "hi_cents")
    )
