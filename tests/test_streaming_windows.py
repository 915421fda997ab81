"""Watermarked windowed aggregation + streaming dedup + bucketed joins."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.writers import write_bucketed_table
from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.windows import (
    dedup_stream,
    windowed_event_counts,
)

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(path, events):
    path.write_text("\n".join(json.dumps(e) for e in events))


def test_windowed_counts_tumbling(spark, tmp_path):
    events = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:01:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 10:04:00", "value": 2.0},
        {"event_id": 3, "user_id": 1, "ts": "2024-01-01 10:07:00", "value": 4.0},
        {"event_id": 4, "user_id": 2, "ts": "2024-01-01 10:01:30", "value": 8.0},
    ]
    _write_events(tmp_path / "b1.json", events)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
    agg = windowed_event_counts(
        stream, "ts", window="5 minutes", keys=["user_id"], value_col="value"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_out").collect()
    finally:
        q.stop()
    got = {(r.window_start.minute, r.user_id): (r.n, r.total) for r in rows}
    assert got[(0, 1)] == (2, 3.0)   # 10:00-10:05 window for user 1
    assert got[(5, 1)] == (1, 4.0)   # 10:05-10:10
    assert got[(0, 2)] == (1, 8.0)


def test_dedup_stream_drops_replays(spark, tmp_path):
    events = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},  # replay
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 10:01:00", "value": 2.0},
    ]
    _write_events(tmp_path / "b1.json", events)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
    out = dedup_stream(stream, "ts", ["event_id"])
    q = out.writeStream.outputMode("append").format("memory").queryName("dd_out").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id FROM dd_out").collect()
    finally:
        q.stop()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: process everything present, then stop --
    the scheduled-batch-over-streaming-source pattern (T1 variant)."""
    events = [
        {"event_id": i, "user_id": 1, "ts": f"2024-01-01 10:{i:02d}:00", "value": 1.0}
        for i in range(5)
    ]
    _write_events(tmp_path / "b1.json", events)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("avnow")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)  # self-terminates after draining
    assert not q.isActive
    assert spark.sql("SELECT count(*) AS n FROM avnow").collect()[0].n == 5


def test_session_windows_merge_by_gap(spark, tmp_path):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.windows import session_windows

    events = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 10:10:00", "value": 2.0},  # same session
        {"event_id": 3, "user_id": 1, "ts": "2024-01-01 12:00:00", "value": 4.0},  # new session
    ]
    _write_events(tmp_path / "b1.json", events)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
    agg = session_windows(stream, "ts", gap="30 minutes", keys=["user_id"], value_col="value")
    q = agg.writeStream.outputMode("complete").format("memory").queryName("sess_out").start()
    try:
        q.processAllAvailable()
        rows = sorted(
            spark.sql("SELECT * FROM sess_out").collect(), key=lambda r: r.session_start
        )
    finally:
        q.stop()
    assert len(rows) == 2
    assert (rows[0].n, rows[0].total) == (2, 3.0)
    assert (rows[1].n, rows[1].total) == (1, 4.0)
    # session end = last event + gap
    assert rows[0].session_end.minute == 40


def test_dedup_then_window_composes(spark, tmp_path):
    """Chained stateful operators must not redefine the watermark
    (regression: doing so kills the query at runtime)."""
    events = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:01:00", "value": 1.0},
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:01:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": "2024-01-01 10:08:00", "value": 4.0},
    ]
    _write_events(tmp_path / "b1.json", events)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(tmp_path))
    agg = windowed_event_counts(
        dedup_stream(stream, "ts", ["event_id"]),
        "ts", window="5 minutes", watermark=None, value_col="value",
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("ddw").start()
    try:
        q.processAllAvailable()
        rows = {r.window_start.minute: r.n for r in spark.sql("SELECT * FROM ddw").collect()}
    finally:
        q.stop()
    assert rows == {0: 1, 5: 1}  # replay dropped before windowing


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Watermarked stream-stream join: an auth event matches a settlement
    only within [auth_ts, auth_ts + 5 min] on the same key. In-window
    settlements join; late (out-of-range) and wrong-key settlements do
    not."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.windows import stream_stream_join

    auth_dir = tmp_path / "auth"
    settle_dir = tmp_path / "settle"
    auth_dir.mkdir(), settle_dir.mkdir()
    auths = [
        {"event_id": 1, "user_id": 1, "ts": "2024-01-01 10:00:00", "value": 10.0},
        {"event_id": 2, "user_id": 2, "ts": "2024-01-01 10:00:00", "value": 20.0},
        {"event_id": 3, "user_id": 3, "ts": "2024-01-01 10:00:00", "value": 30.0},
    ]
    settles = [
        # joins: same key, 2 min after auth
        {"event_id": 101, "user_id": 1, "ts": "2024-01-01 10:02:00", "value": 10.0},
        # out of range: 20 min after auth
        {"event_id": 102, "user_id": 2, "ts": "2024-01-01 10:20:00", "value": 20.0},
        # wrong key
        {"event_id": 103, "user_id": 9, "ts": "2024-01-01 10:01:00", "value": 30.0},
    ]
    _write_events(auth_dir / "a.json", auths)
    _write_events(settle_dir / "s.json", settles)

    left = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(str(auth_dir))
        .select("user_id", F.col("ts").alias("auth_ts"), F.col("value").alias("amount"))
    )
    right = (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(str(settle_dir))
        .select("user_id", F.col("ts").alias("settle_ts"))
    )
    out = stream_stream_join(
        left, right, "user_id", "auth_ts", "settle_ts", max_lag="5 minutes"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ssj").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0].user_id == 1
    assert rows[0].amount == 10.0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf (set in session.get_spark); managed
    # tables land there and are dropped below.
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed_table(left, "bl", "k", num_buckets=8, sort_col="k")
    write_bucketed_table(right, "br", "k", num_buckets=8, sort_col="k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bl").join(spark.table("br"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: a shuffle-free sort-merge join
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bl")
        spark.sql("DROP TABLE IF EXISTS br")


def test_dedup_within_watermark_ignores_ts_differences(spark, tmp_path):
    """Replayed ids with DIFFERENT timestamps (the at-least-once case)
    must still dedup -- the [id, ts]-keyed variant would keep both."""
    import json

    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.windows import (
        dedup_stream_within_watermark,
    )
    from pyspark.sql import types as T

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2024-01-01 10:00:00"},
        {"event_id": 1, "ts": "2024-01-01 10:02:00"},  # replay, new ts
        {"event_id": 2, "ts": "2024-01-01 10:01:00"},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema).json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = dedup_stream_within_watermark(stream, "ts", ["event_id"], "10 minutes")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("dedup_wwm_out").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("dedup_wwm_out").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]
