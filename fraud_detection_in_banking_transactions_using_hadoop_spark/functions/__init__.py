from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.scalar import (
    distance_km,
    parse_ts_multi,
    row_uuid,
    speed_kms,
    ts_seconds,
)

__all__ = ["distance_km", "speed_kms", "ts_seconds", "parse_ts_multi", "row_uuid"]
