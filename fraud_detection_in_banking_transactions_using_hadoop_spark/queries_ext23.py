"""Extension batch 23: pipeline meta-evaluation and operations
diagnostics -- LSH quality measurement, source freshness, and join-key
skew profiling.

Scale notes (the 100 TB story per query):
- lsh_recall_eval is the OFFLINE QUALITY HARNESS for the minhash-LSH
  tier: it computes exact shingle-Jaccard ground truth (shingle
  equi-join -- on a full corpus you run it on a sampled block; the
  join itself shuffles on the shingle key, never all-pairs) and scores
  the production candidate generator against it. Knowing the recall
  of your sketch AT YOUR THRESHOLD is what makes an approximate tier
  defensible at 100 TB.
- source_freshness_audit is one groupBy over the stream fact with
  integer-microsecond lag arithmetic against the corpus max -- the
  table every ingestion SLA dashboard reads.
- join_skew_profile aggregates the fact side of a join key to per-key
  counts, then summarizes the key histogram (max/mean/p99, hot keys)
  -- the number that decides whether the join needs salting or AQE
  skew handling BEFORE it burns a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import _SHINGLE_PAIRS_CTE
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_J_THRESHOLD = 0.5


# ---------------------------------------------------------------------------
# LSH candidate-quality evaluation: precision/recall of the banded
# minhash candidates against exact shingle-Jaccard ground truth.
# ---------------------------------------------------------------------------
@register(
    "lsh_recall_eval",
    f"""
    WITH {_SHINGLE_PAIRS_CTE},
    sizes AS (SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS n FROM sh
              GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS c
      FROM (SELECT DISTINCT doc_id, tok FROM sh) a
      JOIN (SELECT DISTINCT doc_id, tok FROM sh) b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {_J_THRESHOLD}
    ),
    hits AS (
      SELECT count(*) AS n FROM pairs p
      JOIN truth t ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_candidates,
           CAST((SELECT n FROM hits) AS BIGINT) AS n_hits,
           CASE WHEN (SELECT count(*) FROM pairs) = 0 THEN NULL
                ELSE round(CAST((SELECT n FROM hits) AS DOUBLE)
                           / (SELECT count(*) FROM pairs), 6) END AS precision,
           CASE WHEN (SELECT count(*) FROM truth) = 0 THEN NULL
                ELSE round(CAST((SELECT n FROM hits) AS DOUBLE)
                           / (SELECT count(*) FROM truth), 6) END AS recall
    """,
    tags=("dedup", "lsh", "evaluation"),
)
def q_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production candidates from the SAME operators the dedup tier
    runs (minhash_signatures 8 hashes / lsh_candidate_pairs band_size
    2 -- already fully oracled by minhash_lsh_pairs); ground truth =
    exact w=3 shingle Jaccard >= 0.5 via a shingle equi-join. Reports
    candidate precision and, critically, RECALL -- the sketch-quality
    number that justifies the approximate tier."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    cands = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2).select(
        "doc_a", "doc_b"
    )
    # consumed 3x (both truth-join sides + sizes): pin once (r13)
    sh = (
        shingle_rows(docs, "doc_id", "text", w=3)
        .select("doc_id", "tok")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    truth = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
            >= _J_THRESHOLD
        )
        .select("doc_a", "doc_b")
        # consumed 2x (count + the hits join): pin the small pair set
    ).localCheckpoint(eager=True)
    t_n = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    c_n = cands.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    h_n = cands.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return (
        t_n.crossJoin(F.broadcast(c_n))
        .crossJoin(F.broadcast(h_n))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.when(F.col("n_candidates") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(F.col("n_hits").cast("double") / F.col("n_candidates"), 6)
            )
            .alias("precision"),
            F.when(F.col("n_truth") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6))
            .alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Source freshness SLA audit: per event type, lag of the latest event
# behind the corpus high-water mark plus trailing-24h volume.
# ---------------------------------------------------------------------------
@register(
    "source_freshness_audit",
    """
    WITH hw AS (SELECT max(epoch_us(ts)) AS m FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST((SELECT m FROM hw) - max(epoch_us(ts)) AS BIGINT) AS lag_us,
           CAST(((SELECT m FROM hw) - max(epoch_us(ts))) // 1000000 AS BIGINT)
             AS lag_seconds,
           CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT m FROM hw) - 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h
    FROM events GROUP BY event_type
    """,
    tags=("ops", "freshness", "sla"),
)
def q_source_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-microsecond lag arithmetic against the corpus max (the
    deterministic stand-in for now()); one shuffle on event_type plus
    the 1-row high-water-mark broadcast."""
    ev = read_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    hw = ev.agg(F.max("us").alias("m"))
    return (
        ev.crossJoin(F.broadcast(hw))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.max("m") - F.max("us")).cast("bigint").alias("lag_us"),
            F.expr("(max(m) - max(us)) div 1000000").cast("bigint").alias("lag_seconds"),
            F.sum(
                F.when(F.col("us") >= F.col("m") - F.lit(86400000000), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_last_24h"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew profile for the orders->customer join: the per-key row
# histogram summary that decides salting/AQE before the join runs.
# ---------------------------------------------------------------------------
@register(
    "join_skew_profile",
    """
    WITH per_key AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_rows,
           CAST(round(round(quantile_cont(c, 0.99), 4) * 10000, 0) AS BIGINT)
             AS p99_rows_e4,
           round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS skew_ratio
    FROM per_key
    """,
    tags=("ops", "skew", "diagnostics"),
)
def q_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key counts (one map-combinable shuffle), then a tiny
    summary: max/mean ratio ('skew_ratio' = how many times the hottest
    key exceeds the average -- > ~5 means salt or let AQE split) and
    the interpolated p99 (e4-scaled integer; interpolated-percentile
    parity discipline)."""
    per_key = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.round(F.round(F.percentile("c", 0.99), 4) * 10000, 0)
        .cast("bigint")
        .alias("p99_rows_e4"),
        F.round(
            F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"), 6
        ).alias("skew_ratio"),
    )
