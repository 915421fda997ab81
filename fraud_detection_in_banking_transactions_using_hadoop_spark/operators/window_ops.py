"""Window operators (SURVEY.md 2.5, W1-W4).

Scale notes: a window partitioned by a high-cardinality key (card_id)
shuffles once on that key and then sorts within partitions -- the same
shuffle the downstream groupBy(card_id) needs, so Catalyst reuses the
exchange. Catalyst's WindowGroupLimit pushes `rn <= k` into the window
exec, so top-k never materializes full per-group sorts at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_window(partition_by: Sequence[str], order_by: Sequence[Column]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Rank-then-filter top-k per group (W1+W2, FDProcBatch.txt:279-293:
    ROW_NUMBER() OVER (PARTITION BY card_id ORDER BY ts DESC) rn WHERE rn <= 10).

    Callers must pass a total order (include a unique tiebreaker) for
    deterministic results -- the reference orders by timestamp only and is
    nondeterministic under ties.
    """
    w = _ordered_window(partition_by, order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def latest_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Argmax per group (W3, FDProcBatch.txt:319-333): rank + rn = 1 --
    the reference's "latest postcode/timestamp per card" query."""
    return top_k_per_group(df, partition_by, order_by, k=1).drop("rn")


def moving_ucl(
    df: DataFrame,
    partition_by: str,
    order_by: Sequence[Column],
    amount_col: str = "amount",
    n: int = 10,
    sigma: float = 3.0,
    out_col: str = "ucl",
) -> DataFrame:
    """Framed analytic UCL (W4, README.md:204-213): moving
    AVG/STDDEV_POP over ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW,
    then avg + sigma * stddev. Hive STDDEV is population stddev
    (SURVEY.md 1.4(3)) -- stddev_pop here, never Spark's sample default.
    """
    w = _ordered_window([partition_by], order_by).rowsBetween(-(n - 1), Window.currentRow)
    return df.withColumn(
        out_col,
        F.avg(amount_col).over(w) + F.lit(sigma) * F.stddev_pop(amount_col).over(w),
    )
