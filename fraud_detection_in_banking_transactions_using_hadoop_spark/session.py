"""SparkSession factory.

Local-mode defaults are sized for the test harness (local[N] single JVM);
the same conf keys are what you would tune on a real cluster -- shuffle
partitions ~ 2-3x total cores, AQE on for runtime re-planning (partition
coalescing, skew-join splitting, SMJ->BHJ conversion).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that must hold at *query* time for oracle parity and testdata reads.
# These are all runtime-settable SQLConf keys, so we can normalize them even
# on a session we did not create (the driver harness owns the session in
# `__spark_entry__.entry`).
_RUNTIME_CONF = {
    # The driver-generated parquet stores `events.ts` as INT64
    # TIMESTAMP(NANOS) which Spark's reader rejects by default.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB timestamps are UTC-naive; pin the session zone so
    # date_format()/casts agree with the oracle.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing + skew handling. Free wins at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def normalize_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf needed for testdata reads + oracle parity."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build: keep going, reads may still work
    try:
        # Spark's 200-partition default over-parallelizes local test scales
        # (pure scheduling overhead on iterative queries). Only replace the
        # untouched default -- an explicit caller choice is preserved.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "fraud-engine", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a local SparkSession sized from SPARK_GRAFT_CPUS.

    On a real cluster you would drop `.master(...)` and submit with
    spark-submit; every other conf key carries over.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle_parts = max(cpus, 4)
    import tempfile

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # static conf: managed (bucketed) tables go to a scratch dir, not CWD
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="spark-warehouse-"))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return normalize_runtime_conf(spark)
