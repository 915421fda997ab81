from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    read_csv_table,
    read_jdbc_incremental,
    read_jdbc_table,
    read_table,
    read_zip_geo,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.writers import (
    append_parquet,
    overwrite_keyed_table,
    overwrite_parquet,
)

__all__ = [
    "read_table",
    "read_csv_table",
    "read_zip_geo",
    "read_jdbc_table",
    "read_jdbc_incremental",
    "overwrite_parquet",
    "append_parquet",
    "overwrite_keyed_table",
]
