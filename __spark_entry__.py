"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (the three-rule fraud scorer
replayed over the events table) at sf0.001. `queries()` exposes every
implemented operator from SURVEY.md 2; `oracle_sql()` the matching DuckDB
SQL. Column aliases match exactly on both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.session import normalize_runtime_conf

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    normalize_runtime_conf(spark)
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import q_fraud_score_events

    return q_fraud_score_events(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md 2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            normalize_runtime_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {q.name: wrap(q.fn) for q in registry()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check.

    Callable SQL entries (data-dependent literals, e.g. the IVF
    centroids) are resolved against /root/testdata/sf0.01 -- the scale
    the driver's compare runs at. tools/oracle_check.py regenerates
    them for whatever sf_dir it is pointed at.
    """
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import resolve_sql

    gate_sf = "/root/testdata/sf0.01"
    return {
        q.name: resolve_sql(q, gate_sf) for q in registry() if q.sql is not None
    }
