"""PySpark-native analytics engine with the query/data-processing surface of
the reference Lambda-architecture fraud pipeline
(`AnamikaDebi/Fraud-Detection-in-Banking-Transactions-Using-Hadoop`).

Architecture: DataFrame/SQL declarative plans compiled by Catalyst; Parquet
replaces Hive-ORC + HBase; Structured Streaming replaces DStreams. See
SURVEY.md for the operator inventory this package implements.

Package layout:
  session    -- SparkSession factory + runtime conf normalization
  config     -- semantic knobs (thresholds, ts formats, null policy)
  schemas    -- explicit StructTypes for the domain tables (SURVEY.md 1.2)
  sources/   -- readers (parquet/csv/jdbc/incremental) and writers
  functions/ -- scalar/text/vector column-expression builders (no UDFs in
                the hot path; everything Catalyst-codegen-able)
  operators/ -- window/agg/join/dedup/similarity operator compositions
  plans/     -- end-to-end batch pipelines (lookup build, scoring)
  streaming/ -- Structured Streaming scorer + stateful per-key fold
"""

from fraud_detection_in_banking_transactions_using_hadoop_spark.config import EngineConfig
from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark, normalize_runtime_conf

__all__ = ["EngineConfig", "get_spark", "normalize_runtime_conf"]
