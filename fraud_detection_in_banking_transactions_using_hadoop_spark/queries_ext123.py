"""Extension batch 123 (round 6): event-level AML/fraud patterns on
the reference's home turf -- structuring (smurfing) detection,
account-takeover error bursts, and sudden activity-shift scoring.

Reference parity: extends the reference's 3-rule fraud predicate
(FinFraudGuard batch rules; fraud_score_events) with the transaction-
PATTERN tier a bank's monitoring stack layers on top: repeated
just-below-threshold amounts, credential-stuffing bursts before a
purchase, and rate-shift alerts.

Scale notes (the 100 TB story):
- structuring_detection is one conditional groupBy on (user, day) --
  map-side partial aggregation, no window, no join.
- ato_error_burst counts same-user errors in a trailing 24-hour
  RANGE window over integer microseconds (partitioned by user --
  never global), then joins burst anchors to follow-on purchases with
  a per-user time-band equi+range join.
- activity_shift_ratio is two conditional aggregates per user with an
  exact integer ratio score ((1e6 * recent * base_days) DIV
  (7 * (base+1))) -- the +1 prior keeps new users finite, division
  order is engine-identical, and the top-20 is an ordered limit with
  the user id tiebreak.
- events span only ~30 days (CLAUDE.md), so the 7-day recent window
  is anchored to max(ts) dynamically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_BAND_LO, _BAND_HI = 50.0, 100.0  # just-below-threshold amount band
_BURST_US = 24 * 3600 * 1_000_000  # trailing error-burst window
_FOLLOW_US = 24 * 3600 * 1_000_000  # purchase follow window after a burst


@register(
    "structuring_detection",
    f"""
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase'
        AND value >= {_BAND_LO} AND value < {_BAND_HI}),
    agg AS (
      SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_band,
             CAST(sum(cents) AS BIGINT) AS band_cents
      FROM p GROUP BY user_id, day)
    SELECT user_id, CAST(day AS VARCHAR) AS day, n_band, band_cents
    FROM agg WHERE n_band >= 2
    """,
    tags=("fraud", "aml", "structuring"),
)
def q_structuring_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structuring (smurfing) screen: users making 2+ same-day
    purchases in the just-below-threshold band [$50, $100) -- the
    classic pattern of splitting a large transfer to stay under a
    reporting limit. One conditional (user, day) aggregation; the day
    is stringified for the cross-engine hash (date formatting parity).
    """
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= _BAND_LO)
        & (F.col("value") < _BAND_HI)
    ).select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    agg = p.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_band"),
        F.sum("cents").cast("bigint").alias("band_cents"),
    )
    return agg.where(F.col("n_band") >= 2).select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        "n_band",
        "band_cents",
    )


@register(
    "ato_error_burst",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error'),
    burst AS (
      SELECT user_id, us,
             count(*) OVER (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_BURST_US} PRECEDING AND CURRENT ROW) AS n30
      FROM e),
    anchors AS (
      SELECT user_id, us FROM burst WHERE n30 >= 3),
    pur AS (
      SELECT user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'),
    followed AS (
      SELECT DISTINCT a.user_id, a.us
      FROM anchors a JOIN pur p
        ON p.user_id = a.user_id
       AND p.us > a.us AND p.us <= a.us + {_FOLLOW_US})
    SELECT a.user_id,
           CAST(count(*) AS BIGINT) AS n_burst_anchors,
           CAST(count(f.us) AS BIGINT) AS n_followed_by_purchase
    FROM anchors a
    LEFT JOIN followed f ON f.user_id = a.user_id AND f.us = a.us
    GROUP BY a.user_id
    """,
    tags=("fraud", "ato", "sequence"),
)
def q_ato_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-takeover screen: an error BURST (3+ errors within a
    trailing 24-hour window, credential-stuffing shape) optionally
    followed by a purchase within the next 24 hours (successful takeover
    monetizing). Per-user RANGE window over integer microseconds --
    partitioned, never global -- then a per-user time-band join from
    burst anchors to purchases. Output: per flagged user, anchor count
    and how many anchors were followed by a purchase."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "error").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_BURST_US, 0)
    )
    anchors = (
        e.select("user_id", "us", F.count(F.lit(1)).over(w).alias("n30"))
        .where(F.col("n30") >= 3)
        .select("user_id", "us")
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pus")
    )
    followed = (
        anchors.join(pur, "user_id")
        .where(
            (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + _FOLLOW_US)
        )
        .select("user_id", "us")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        anchors.join(followed, ["user_id", "us"], "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_burst_anchors"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_followed_by_purchase"),
        )
    )


@register(
    "activity_shift_ratio",
    """
    WITH bounds AS (
      SELECT max(epoch_us(ts)) AS mx, min(epoch_us(ts)) AS mn FROM events),
    split AS (
      SELECT mx - 604800000000 AS cut,
             CAST((mx - 604800000000 - mn) // 86400000000
                  AS BIGINT) AS base_days
      FROM bounds),
    per_user AS (
      SELECT e.user_id,
             CAST(sum(CASE WHEN epoch_us(e.ts) > s.cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_recent,
             CAST(sum(CASE WHEN epoch_us(e.ts) <= s.cut THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_base,
             s.base_days
      FROM events e CROSS JOIN split s
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, s.base_days)
    SELECT user_id, n_recent, n_base,
           CAST((1000000 * n_recent * base_days) // (7 * (n_base + 1))
                AS BIGINT) AS shift_score_e6
    FROM per_user
    ORDER BY shift_score_e6 DESC, user_id
    LIMIT 20
    """,
    tags=("fraud", "velocity", "rate-shift"),
)
def q_activity_shift_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sudden-activity alert: each user's last-7-days purchase RATE
    against their prior baseline rate, as the exact integer score
    (1e6 * n_recent * base_days) DIV (7 * (n_base + 1)) -- the +1
    prior keeps never-seen-before users finite instead of infinite.
    Top-20 by score with user tiebreak: the daily review queue, rate-
    normalized so a 2x jump on a quiet account outranks noise on a
    busy one."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.max(F.unix_micros("ts")).alias("mx"),
        F.min(F.unix_micros("ts")).alias("mn"),
    )
    split = bounds.select(
        (F.col("mx") - F.lit(7 * 86400 * 1000000)).alias("cut"),
        F.expr(
            "CAST((mx - 604800000000L - mn) DIV 86400000000L AS BIGINT)"
        ).alias("base_days"),
    )
    per_user = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(split))
        .groupBy("user_id", "base_days")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") > F.col("cut"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_recent"),
            F.sum(
                F.when(F.unix_micros("ts") <= F.col("cut"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_base"),
        )
    )
    return (
        per_user.select(
            "user_id",
            "n_recent",
            "n_base",
            F.expr(
                "CAST((1000000 * n_recent * base_days)"
                " DIV (7 * (n_base + 1)) AS BIGINT)"
            ).alias("shift_score_e6"),
        )
        .orderBy(F.desc("shift_score_e6"), "user_id")
        .limit(20)
    )
