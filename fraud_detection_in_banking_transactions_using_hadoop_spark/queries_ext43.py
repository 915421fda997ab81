"""Extension batch 43: interval-union active time, the German tank
estimator, and boilerplate prefix detection.

Scale notes (the 100 TB story per query):
- interval_union_active_time is the sweep-line interval union done
  with windows: events pad to [t-15m, t+15m] activity intervals; a
  per-user running max of interval ends marks island starts (new
  interval begins past everything seen), islands get ids from the
  prefix sum of those flags, and the union length is one island
  groupBy. Every window is partitioned by user -- the classic O(n log
  n) sweep as three shuffle-free-after-one-exchange passes. True
  active time dedups overlapping activity, which naive per-event
  session sums double-count.
- german_tank_estimate is the serial-number population estimator
  (max-based MVU): watching only the filled orders' keys, estimate
  the total key space: N_hat = m + m/k - 1. Two aggregates, pure
  integer floors -- the classic "how many exist from what we've seen"
  trick for fraud-ring and inventory sizing.
- boilerplate_prefix_groups catches shared document HEADERS (the
  boilerplate class line-dedup misses when bodies differ): group docs
  by their first-8-token prefix, report groups with >1 doc. One
  map-side prefix extraction + one groupBy; the shuffle key is the
  prefix string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PAD_US = 15 * 60 * 1000000  # 15-minute activity pad each side


# ---------------------------------------------------------------------------
# Interval-union active time per user (sweep line via windows).
# ---------------------------------------------------------------------------
@register(
    "interval_union_active_time",
    f"""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) - {_PAD_US} AS s,
             epoch_us(ts) + {_PAD_US} AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775807)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ),
    merged AS (
      SELECT user_id, island,
             CAST(max(e) - min(s) AS BIGINT) AS len_us
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len_us) AS BIGINT) AS active_us,
           CAST(sum(len_us) // 1000000 AS BIGINT) AS active_seconds
    FROM merged GROUP BY user_id
    """,
    tags=("temporal", "interval-union", "sessionize"),
)
def q_interval_union_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of padded activity intervals per user: island
    starts from a running max of ends (strictly-greater comparison;
    (s, event_id) total order), island ids from the prefix sum, union
    lengths from one groupBy. Integer microseconds throughout; the
    only exchange is the user_id partition every per-user op shares."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - _PAD_US).alias("s"),
        (F.unix_micros("ts") + _PAD_US).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-9223372036854775807)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_cum))
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).cast("bigint").alias("len_us")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("len_us").cast("bigint").alias("active_us"),
        F.expr("CAST(sum(len_us) DIV 1000000 AS BIGINT)").alias("active_seconds"),
    )


# ---------------------------------------------------------------------------
# German tank estimator over filled-order serials.
# ---------------------------------------------------------------------------
@register(
    "german_tank_estimate",
    """
    WITH seen AS (
      SELECT CAST(o_orderkey AS BIGINT) AS serial FROM orders
      WHERE o_orderstatus = 'F'
    )
    SELECT CAST(count(*) AS BIGINT) AS k_observed,
           CAST(max(serial) AS BIGINT) AS max_serial,
           CAST(max(serial) + max(serial) // count(*) - 1 AS BIGINT)
             AS n_hat,
           (SELECT CAST(max(o_orderkey) AS BIGINT) FROM orders)
             AS true_max_serial
    FROM seen
    """,
    tags=("stats", "population", "estimation"),
)
def q_german_tank_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serial-number trick: from only the 'F'-status orders'
    keys, N_hat = m + m/k - 1 estimates the full key space (shown
    beside the true maximum). Two aggregates, integer floors -- the
    estimator behind sizing populations you only partially observe."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    seen = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").cast("bigint").alias("serial")
    )
    est = seen.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_observed"),
        F.max("serial").cast("bigint").alias("max_serial"),
        F.expr("CAST(max(serial) + max(serial) DIV count(*) - 1 AS BIGINT)").alias(
            "n_hat"
        ),
    )
    true_max = o.agg(F.max("o_orderkey").cast("bigint").alias("true_max_serial"))
    return est.crossJoin(F.broadcast(true_max)).select(
        "k_observed", "max_serial", "n_hat", "true_max_serial"
    )


# ---------------------------------------------------------------------------
# Boilerplate prefix groups: shared first-8-token headers.
# ---------------------------------------------------------------------------
_PREFIX_TOKS = 8


@register(
    "boilerplate_prefix_groups",
    f"""
    WITH p AS (
      SELECT doc_id,
             array_to_string(list_slice(string_split(text, ' '), 1,
                             {_PREFIX_TOKS}), ' ') AS prefix
      FROM documents
    )
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS sample_doc_id
    FROM p GROUP BY prefix HAVING count(*) > 1
    """,
    tags=("llm", "dedup", "boilerplate"),
)
def q_boilerplate_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing their first 8 tokens -- the shared-header
    boilerplate signal (license banners, navigation chrome) that
    body-level dedup misses. Map-side prefix extraction, one groupBy
    on the prefix string, min doc_id as the deterministic exemplar."""
    docs = read_table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split("text", " "), 1, _PREFIX_TOKS), " ")
    return (
        docs.select("doc_id", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("sample_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )
