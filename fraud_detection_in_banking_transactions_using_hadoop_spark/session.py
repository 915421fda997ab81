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
    # Older driver testdata stored `events.ts` as INT64 TIMESTAMP(NANOS)
    # which Spark's reader rejects by default (readers.py then converts
    # the long via integer div 1000).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Newer driver testdata stores `events.ts` as TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ. Our
    # whole surface (unix_micros, watermarks, window(ts, ...)) is typed
    # on TimestampType, so read NTZ parquet as LTZ; with the session
    # zone pinned to UTC below this is value-identical to what the
    # nanos->micros path produced, and matches DuckDB's naive-UTC read.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
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


def cluster_conf(
    profile: str = "100tb",
    executor_cores: int = 5,
    n_executors: int = 1000,
) -> dict[str, str]:
    """Recommended conf for a real deployment, encoded as data so it can
    be reviewed, tested, and fed to spark-submit. Profiles:

    '100tb' -- the target-scale batch profile. Rationale per key:
      - shuffle.partitions ~ 2-3x total cores: every reducer slot busy,
        partitions small enough to sort/spill gracefully (AQE coalesces
        the over-split tail at runtime).
      - maxPartitionBytes 256m: scan tasks sized so a 100 TB table makes
        ~400k tasks, not 4M (listing/scheduling overhead), while staying
        under executor memory per task after projection.
      - autoBroadcastJoinThreshold 64m: dims up to ~memory-safe size
        broadcast instead of shuffling the fact.
      - skewJoin thresholds: AQE splits any post-shuffle partition >
        512m and > 4x median -- the hot-key guard for power-law keys.
      - shuffle.service + dynamicAllocation: executors scale with stage
        width; shuffle files outlive executors.
      - kryo + zstd: serialized shuffle volume is the scarce resource.
    """
    total_cores = executor_cores * n_executors
    if profile == "100tb":
        return {
            "spark.sql.shuffle.partitions": str(total_cores * 2),
            "spark.sql.files.maxPartitionBytes": "256m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "4",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "512m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            "spark.io.compression.codec": "zstd",
            "spark.shuffle.service.enabled": "true",
            "spark.dynamicAllocation.enabled": "true",
            "spark.dynamicAllocation.maxExecutors": str(n_executors),
            "spark.executor.cores": str(executor_cores),
            "spark.sql.parquet.aggregatePushdown": "true",
            "spark.sql.parquet.filterPushdown": "true",
        }
    if profile == "streaming":
        return {
            "spark.sql.shuffle.partitions": str(max(total_cores // 2, 8)),
            "spark.sql.adaptive.enabled": "false",  # AQE off: stable stateful partitioning
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            "spark.io.compression.codec": "zstd",
        }
    raise ValueError(f"unknown profile: {profile}")
