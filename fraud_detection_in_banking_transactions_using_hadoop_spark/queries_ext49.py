"""Extension batch 49: Heaps' law vocabulary growth and bucketed peak
concurrency.

Scale notes (the 100 TB story per query):
- heaps_law_beta measures vocabulary growth V(N) ~ K*N^beta per
  source from two checkpoints (the first half of the source's docs by
  id vs all of them): distinct-type counts are two groupBys, the
  half/full split is a per-source PARTITIONED rank, and beta =
  ln(V_f/V_h)/ln(N_f/N_h) closes over e8-integer logs. Growing beta
  says scraping more of this source still buys vocabulary; flat says
  it's exhausted -- the Heaps complement to the novelty-decay curve.
- peak_concurrency answers "how many sessions were open at once":
  padded activity intervals explode into MINUTE buckets (bounded by
  the calendar, not the data), per-bucket distinct users count
  concurrency, and the peak is an ordered limit. The bucketed sweep
  replaces the classic +1/-1 event sort -- which is a single-task
  global order -- with one calendar-bounded groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PAD_US = 15 * 60 * 1000000


# ---------------------------------------------------------------------------
# Heaps' law exponent per source from half/full checkpoints.
# ---------------------------------------------------------------------------
@register(
    "heaps_law_beta",
    """
    WITH ranked AS (
      SELECT doc_id, source, text,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS nd
      FROM documents
    ),
    toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok,
             CASE WHEN rn * 2 <= nd THEN 1 ELSE 0 END AS in_half
      FROM ranked
    ),
    types AS (
      SELECT source, tok,
             CAST(count(*) AS BIGINT) AS n_occ,
             CAST(max(in_half) AS INTEGER) AS seen_in_half,
             CAST(sum(in_half) AS BIGINT) AS occ_in_half
      FROM toks GROUP BY source, tok
    ),
    cp AS (
      SELECT source,
             CAST(sum(occ_in_half) AS BIGINT) AS n_half,
             CAST(sum(n_occ) AS BIGINT) AS n_full,
             CAST(sum(seen_in_half) AS BIGINT) AS v_half,
             CAST(count(*) AS BIGINT) AS v_full
      FROM types GROUP BY source
    )
    SELECT source, n_half, n_full, v_half, v_full,
           CASE WHEN n_half = 0 OR v_half = 0 OR n_half = n_full THEN NULL
                ELSE round(
                  (CAST(round(100000000.0 * ln(CAST(v_full AS DOUBLE)), 0)
                        AS BIGINT)
                   - CAST(round(100000000.0 * ln(CAST(v_half AS DOUBLE)), 0)
                          AS BIGINT))
                  * 1.0
                  / (CAST(round(100000000.0 * ln(CAST(n_full AS DOUBLE)), 0)
                          AS BIGINT)
                     - CAST(round(100000000.0 * ln(CAST(n_half AS DOUBLE)), 0)
                            AS BIGINT)), 6)
           END AS beta
    FROM cp
    """,
    tags=("llm", "vocabulary", "heaps"),
)
def q_heaps_law_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-checkpoint Heaps exponent per source: token totals and
    distinct-type counts for the first half (per-source doc_id rank)
    and the full source come from one (source, type) groupBy; beta is
    a ratio of e8-integer log differences (deterministic cross-engine)
    rounded once."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "text",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("nd"),
    )
    toks = ranked.select(
        "source",
        F.explode(F.split("text", " ")).alias("tok"),
        F.when(F.col("rn") * 2 <= F.col("nd"), 1).otherwise(0).alias("in_half"),
    )
    types = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.max("in_half").cast("integer").alias("seen_in_half"),
        F.sum("in_half").cast("bigint").alias("occ_in_half"),
    )
    cp = types.groupBy("source").agg(
        F.sum("occ_in_half").cast("bigint").alias("n_half"),
        F.sum("n_occ").cast("bigint").alias("n_full"),
        F.sum("seen_in_half").cast("bigint").alias("v_half"),
        F.count(F.lit(1)).cast("bigint").alias("v_full"),
    )
    l8 = lambda c: F.round(
        F.lit(100000000.0) * F.log(F.col(c).cast("double")), 0
    ).cast("bigint")
    degenerate = (
        (F.col("n_half") == 0)
        | (F.col("v_half") == 0)
        | (F.col("n_half") == F.col("n_full"))
    )
    return cp.select(
        "source",
        "n_half",
        "n_full",
        "v_half",
        "v_full",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (l8("v_full") - l8("v_half")) * 1.0 / (l8("n_full") - l8("n_half")), 6
            )
        )
        .alias("beta"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency via calendar-bounded minute buckets.
# ---------------------------------------------------------------------------
@register(
    "peak_concurrency",
    f"""
    WITH iv AS (
      SELECT user_id,
             (epoch_us(ts) - {_PAD_US}) // 60000000 AS m_start,
             (epoch_us(ts) + {_PAD_US}) // 60000000 AS m_end
      FROM events
    ),
    minutes AS (
      SELECT DISTINCT user_id, m_start + g.g AS minute
      FROM iv, (SELECT unnest(range(0, 31)) AS g) g
      WHERE m_start + g.g <= m_end
    ),
    conc AS (
      SELECT minute, CAST(count(*) AS BIGINT) AS n_users
      FROM minutes GROUP BY minute
    )
    SELECT CAST(minute AS BIGINT) AS minute_epoch, n_users
    FROM conc ORDER BY n_users DESC, minute LIMIT 10
    """,
    tags=("temporal", "concurrency", "ops"),
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 busiest minutes: padded activity intervals explode into
    their minute buckets (31 per event, map-side), distinct users per
    minute count concurrency, and the peak is an ordered limit. The
    bucket grid is calendar-bounded, so this replaces the single-task
    +1/-1 sweep with one bounded groupBy -- the shape a 'live users'
    dashboard needs."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"(unix_micros(ts) - {_PAD_US}) DIV 60000000").alias("m_start"),
        F.expr(f"(unix_micros(ts) + {_PAD_US}) DIV 60000000").alias("m_end"),
    )
    minutes = (
        ev.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(30))).alias("g"),
            "m_start",
            "m_end",
        )
        .select("user_id", (F.col("m_start") + F.col("g")).alias("minute"), "m_end")
        .where(F.col("minute") <= F.col("m_end"))
        .select("user_id", "minute")
        .distinct()
    )
    conc = minutes.groupBy("minute").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (
        conc.select(F.col("minute").cast("bigint").alias("minute_epoch"), "n_users")
        .orderBy(F.col("n_users").desc(), "minute_epoch")
        .limit(10)
    )
