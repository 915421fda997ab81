from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.scorer import (
    read_kafka_stream,
    read_payload_file_stream,
    run_scorer,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful import score_stream_stateful

__all__ = [
    "read_payload_file_stream",
    "read_kafka_stream",
    "run_scorer",
    "score_stream_stateful",
]
