"""Aggregation operators (SURVEY.md 2.4, A1-A3)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.window_ops import top_k_per_group


def ucl_agg(amount: Column, sigma: float = 3.0) -> Column:
    """UCL aggregate expression: AVG + sigma * STDDEV_POP (A1-A3,
    FDProcBatch.txt:305-310). Hive's STDDEV is population stddev
    (SURVEY.md 1.4(3)) -- a one-row group yields stddev_pop = 0, not NULL,
    matching the reference."""
    return F.avg(amount) + F.lit(sigma) * F.stddev_pop(amount)


def grouped_ucl(
    df: DataFrame,
    key: str,
    amount_col: str,
    order_by: Sequence[Column],
    last_n: int = 10,
    sigma: float = 3.0,
) -> DataFrame:
    """The authoritative batch UCL (FDProcBatch.txt:276-310): per key, keep
    the `last_n` most recent rows (rank desc + filter), then one grouped
    avg/stddev_pop. Returns (key, n_txn, avg_amount, ucl).

    Scale: the window and the groupBy hash-partition on the same key, so
    the plan has exactly one shuffle; partial aggregation is automatic.
    """
    top = top_k_per_group(df, [key], order_by, k=last_n)
    return top.groupBy(key).agg(
        F.count("*").alias("n_txn"),
        F.avg(amount_col).alias("avg_amount"),
        ucl_agg(F.col(amount_col), sigma).alias("ucl"),
    )
