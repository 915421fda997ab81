"""Skew-resilient join: salt the hot side's key so one giant key hash
bucket becomes `salt_factor` buckets, replicate the small side per salt.

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled); explicit salting is for the cases
AQE cannot split -- e.g. a single key too hot for any partition, or
aggregations (AQE skew handling only covers joins).

Correctness: salted_join(left, right) == left.join(right) row-for-row;
the salt column never escapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed` has hot keys: each skewed row gets a random
    salt in [0, salt_factor); `small` is replicated once per salt value, so
    every (key, salt) bucket holds ~1/salt_factor of the hot key's rows.

    Cost model: replicating the small side multiplies its shuffle volume by
    salt_factor -- use only when |small| * salt_factor << |skewed|'s hot
    partition. The salt uses a deterministic-per-row hash (not rand()) so
    retried tasks produce identical output (rand() breaks exactly-once on
    task retry).
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in skewed.columns])) % salt_factor).alias("_salt")
    left = skewed.select("*", salt)
    explode_salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("_salt")
    right = small.select("*", explode_salts)
    out = left.join(right, [key, "_salt"], how)
    return out.drop("_salt")


def salted_group_count(df: DataFrame, key: str, salt_factor: int = 8) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial count per
    (key, salt), then final sum per key. Same result as groupBy(key).count()
    with the hot key's work spread over salt_factor partitions. (Spark's
    hash aggregate already does map-side partials; explicit salting matters
    for aggregates without partial pushdown, e.g. collect_list.)"""
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % salt_factor).alias("_salt")
    partial = df.select(F.col(key), salt).groupBy(key, "_salt").count()
    return partial.groupBy(key).agg(F.sum("count").cast("bigint").alias("n"))
