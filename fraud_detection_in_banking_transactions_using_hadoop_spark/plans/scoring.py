"""Transaction scoring -- the reference speed layer's per-record logic
(SURVEY.md 3.2; FinFraudGuard.java:68-92) as one declarative column
pipeline.

The reference does a per-record HBase Get + in-JVM map lookups + Java
arithmetic per event. Here the same semantics is: broadcast-join the
lookup table, broadcast-join the zip geo dimension twice (current + last
postcode), then pure column expressions -- zero per-record RPCs, fully
codegen'd, and identical in batch and foreachBatch streaming use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.config import DEFAULT_CONFIG, EngineConfig
from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import (
    distance_km,
    parse_ts_multi,
    speed_kms,
)


def fraud_rules(
    score: Column,
    amount: Column,
    ucl: Column,
    speed: Column,
    dt_seconds: Column,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> Column:
    """The three-rule predicate (P4, FinFraudGuard.java:82-83):

        FRAUD iff score < 200 or amount > ucl or speed > 0.25 km/s

    Null policy (SURVEY.md 1.4(7)): a NULL input means that rule cannot
    prove fraud -> contributes False; dt <= 0 fires the speed rule
    (reference divides by zero -> Inf -> FRAUD).
    """
    rule_score = F.coalesce(score < cfg.score_threshold, F.lit(False))
    rule_amount = F.coalesce(amount > ucl, F.lit(False))
    dt_trigger = (dt_seconds <= 0) if cfg.nonpositive_dt_is_fraud else F.lit(False)
    rule_speed = F.coalesce(dt_trigger | (speed > cfg.speed_threshold_kms), F.lit(False))
    return F.when(rule_score | rule_amount | rule_speed, cfg.status_fraud).otherwise(
        cfg.status_genuine
    )


def score_transactions(
    txns: DataFrame,
    lookup: DataFrame,
    zip_geo: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Score a batch of payload transactions against the lookup state.

    txns: TXN_PAYLOAD schema (card_id, member_id, amount, pos_id,
          postcode, transaction_dt string).
    lookup: LOOKUP schema (card_id, ucl, postcode, transaction_dt, score).
    zip_geo: ZIP_GEO schema (zip, lat, lon, ...).

    Equivalent of FinFraudGuard.java:69-88 for a whole batch: one
    broadcast join against lookup (replaces per-record HBase Get, J4),
    two aliased broadcast joins against zip geo (replaces the singleton
    HashMap double lookup, J6/S14), then column expressions F5/F6/F7 and
    the P4 predicate.
    """
    lk = lookup.select(
        F.col("card_id"),
        F.col("ucl"),
        F.col("postcode").alias("last_postcode"),
        F.col("transaction_dt").alias("last_txn_dt"),
        F.col("score"),
    )
    geo_cur = zip_geo.select(
        F.col("zip").alias("cur_zip"), F.col("lat").alias("cur_lat"), F.col("lon").alias("cur_lon")
    )
    geo_last = zip_geo.select(
        F.col("zip").alias("last_zip"), F.col("lat").alias("last_lat"), F.col("lon").alias("last_lon")
    )

    cur_ts = parse_ts_multi(F.col("transaction_dt"), cfg.input_ts_formats)
    last_ts = parse_ts_multi(F.col("last_txn_dt"), cfg.input_ts_formats)

    scored = (
        txns.join(F.broadcast(lk), "card_id", "left")
        .join(F.broadcast(geo_cur), F.col("postcode").cast("string") == F.col("cur_zip"), "left")
        .join(F.broadcast(geo_last), F.col("last_postcode").cast("string") == F.col("last_zip"), "left")
        .withColumn("dt_seconds", cur_ts.cast("double") - last_ts.cast("double"))
        .withColumn(
            "dist_km",
            distance_km(F.col("cur_lat"), F.col("cur_lon"), F.col("last_lat"), F.col("last_lon")),
        )
        .withColumn("speed_kms", speed_kms(F.col("dist_km"), F.col("dt_seconds")))
        .withColumn(
            "status",
            fraud_rules(
                F.col("score"), F.col("amount"), F.col("ucl"),
                F.col("speed_kms"), F.col("dt_seconds"), cfg,
            ),
        )
    )
    return scored.select(
        "card_id", "member_id", "amount", "pos_id", "postcode", "transaction_dt",
        "dist_km", "dt_seconds", "speed_kms", "status",
    )
