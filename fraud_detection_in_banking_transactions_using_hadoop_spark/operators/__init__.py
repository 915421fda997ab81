from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.agg_ops import grouped_ucl
from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.window_ops import (
    latest_per_group,
    moving_ucl,
    top_k_per_group,
)

__all__ = ["grouped_ucl", "top_k_per_group", "latest_per_group", "moving_ucl"]
