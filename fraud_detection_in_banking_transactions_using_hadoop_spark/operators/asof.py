"""As-of (backward) join -- an operator Spark lacks natively, composed
from union + window last(ignorenulls) (preference (a) of the custom-
operator ladder: pure DataFrame composition, no UDF).

Semantics: for each left row, attach the payload of the right row with the
greatest right_ts <= left_ts within the same key (ties on timestamp take
the right row first, i.e. equality matches).

Scale: one shuffle on the key for the combined union, one in-partition
sort -- identical cost profile to a window aggregation; no range
explosion, no per-key driver loops. Right side should be pre-reduced to
one row per (key, ts) for determinism (do it with max_by upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
) -> DataFrame:
    """Returns every left row + `payload` columns from the matched right
    row (NULL when no right row precedes it)."""
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload],
    )
    left_cols = [c for c in left.columns]
    u = l_tagged.select(key, "_ts", "_side", *[c for c in left_cols if c != key], *payload).unionByName(
        r_tagged, allowMissingColumns=True
    )
    # Right rows (_side 0) sort before left rows at equal _ts, so equality
    # matches; last(ignorenulls) carries the most recent right payload
    # forward into each left row.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_m_{c}") for c in payload]
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            key,
            *[c for c in left_cols if c != key],
            *[F.col(f"_m_{c}").alias(c) for c in payload],
        )
    )
