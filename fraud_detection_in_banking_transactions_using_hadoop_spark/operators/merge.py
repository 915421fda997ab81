"""MERGE INTO (upsert) emulation for keyed Parquet tables.

Without a transactional table format (Delta/Iceberg jars are not in this
environment), upsert = anti-join the target against the updates, union,
rewrite -- the same write-then-swap shape the streaming lookup merge uses.
On a real deployment this maps 1:1 onto `MERGE INTO` of a lakehouse
format; the operator keeps the engine's semantics identical either way.

Scale: one shuffle on the key for the anti-join (or zero if both sides
are bucketed on the key); the rewrite is sized by the target table --
partition the target (e.g. by key range or date) and merge only touched
partitions to avoid full rewrites at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of `updates` win on key collision; target rows without a
    matching update survive. Returns the merged frame (caller writes it).
    `updates` must have one row per key (enforce upstream with argmax)."""
    surviving = target.join(updates.select(key), key, "left_anti")
    return surviving.unionByName(updates.select(*target.columns))


def merge_upsert_path(
    spark: SparkSession, target_path: str, updates: DataFrame, key: str
) -> None:
    """Upsert into a keyed Parquet table in place via staging write-then-
    swap (parquet cannot be overwritten while being read)."""
    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key)
    staging = target_path.rstrip("/") + "_staging"
    merged.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose
    tracked attributes changed (set valid_to), append the new versions
    (valid_from = change ts, valid_to = NULL).

    dim schema: key, *tracked_cols, valid_from, valid_to (NULL = current).
    changes schema: key, *tracked_cols, change_ts_col.
    """
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    chg = changes.select(
        key, *tracked_cols, F.col(change_ts_col).alias("_chg_ts")
    )
    joined = cur.alias("c").join(chg.alias("n"), key, "left")
    changed_pred = F.lit(False)
    for c in tracked_cols:
        changed_pred = changed_pred | ~F.col(f"n.{c}").eqNullSafe(F.col(f"c.{c}"))
    has_change = F.col("n._chg_ts").isNotNull() & changed_pred

    closed = joined.select(
        F.col(f"c.{key}").alias(key),
        *[F.col(f"c.{c}").alias(c) for c in tracked_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.when(has_change, F.col("n._chg_ts")).otherwise(F.col("c.valid_to")).alias("valid_to"),
    )
    fresh = (
        joined.filter(has_change)
        .select(
            F.col(f"c.{key}").alias(key),
            *[F.col(f"n.{c}").alias(c) for c in tracked_cols],
            F.col("n._chg_ts").alias("valid_from"),
            F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        )
    )
    new_keys = chg.join(cur, key, "left_anti").select(
        key, *tracked_cols, F.col("_chg_ts").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
    )
    return hist.unionByName(closed).unionByName(fresh).unionByName(new_keys)
