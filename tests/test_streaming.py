"""Streaming tests (SURVEY.md 5.4): file-source replay driving the
foreachBatch scorer, and the exact stateful fold -- state evolution per
card across and within micro-batches."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.scorer import (
    read_payload_file_stream,
    run_scorer,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful import (
    fold_events,
    score_stream_stateful,
)

NYC = (40.7128, -74.0060)
LA = (34.0522, -118.2437)


@pytest.fixture(scope="module")
def zip_geo(spark):
    rows = [
        Row(zip="100", lat=NYC[0], lon=NYC[1], city="NYC", state="NY", pos_id="1"),
        Row(zip="200", lat=LA[0], lon=LA[1], city="LA", state="CA", pos_id="2"),
    ]
    return spark.createDataFrame(rows)


def _payload(card_id, amount, postcode, ts, pos_id=1):
    return {
        "card_id": card_id, "member_id": card_id, "amount": float(amount),
        "pos_id": pos_id, "postcode": postcode, "transaction_dt": ts,
    }


def test_foreach_batch_scorer_state_advances(spark, tmp_path_factory, zip_geo):
    """Two micro-batches: a GENUINE move to LA in batch 1 must update the
    lookup so a same-place LA event in batch 2 scores GENUINE (it would be
    a 3936 km teleport against the original NYC state)."""
    base = tmp_path_factory.mktemp("stream")
    stream_dir, lookup_dir = base / "in", base / "lookup"
    master_dir, ckpt_dir = base / "master", base / "ckpt"
    stream_dir.mkdir()

    lookup = spark.createDataFrame(
        [Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500)]
    )
    lookup.coalesce(1).write.parquet(str(lookup_dir))

    # batch 1: slow (10-day) genuine relocation NYC -> LA
    (stream_dir / "b1.json").write_text(
        json.dumps(_payload(1, 50, 200, "2024-01-11 10:00:00")) + "\n"
    )
    # batch 2: LA again 1h later -- genuine ONLY if batch 1 updated state
    (stream_dir / "b2.json").write_text(
        json.dumps(_payload(1, 50, 200, "2024-01-11 11:00:00")) + "\n"
    )

    stream = read_payload_file_stream(spark, str(stream_dir))
    q = run_scorer(stream, str(lookup_dir), zip_geo, str(master_dir), str(ckpt_dir))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    master = {r.transaction_dt: r for r in spark.read.parquet(str(master_dir)).collect()}
    assert master["2024-01-11 10:00:00"].status == "GENUINE"
    assert master["2024-01-11 11:00:00"].status == "GENUINE"
    assert master["2024-01-11 11:00:00"].dist_km == 0.0

    final = spark.read.parquet(str(lookup_dir)).collect()[0]
    assert final.postcode == 200
    assert final.transaction_dt == "2024-01-11 11:00:00"
    assert final.ucl == 100.0  # batch-layer fields untouched


def test_foreach_batch_fraud_does_not_advance_state(spark, tmp_path_factory, zip_geo):
    """A FRAUD event must not move the card's lookup state
    (HBaseTransLink.java:76-81 updates only on GENUINE)."""
    base = tmp_path_factory.mktemp("stream2")
    stream_dir, lookup_dir = base / "in", base / "lookup"
    master_dir, ckpt_dir = base / "master", base / "ckpt"
    stream_dir.mkdir()

    lookup = spark.createDataFrame(
        [Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500)]
    )
    lookup.coalesce(1).write.parquet(str(lookup_dir))

    # amount 500 > ucl 100 -> FRAUD, even though location is fine
    (stream_dir / "b1.json").write_text(
        json.dumps(_payload(1, 500, 100, "2024-01-01 12:00:00")) + "\n"
    )
    stream = read_payload_file_stream(spark, str(stream_dir))
    q = run_scorer(stream, str(lookup_dir), zip_geo, str(master_dir), str(ckpt_dir))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert spark.read.parquet(str(master_dir)).collect()[0].status == "FRAUD"
    final = spark.read.parquet(str(lookup_dir)).collect()[0]
    assert final.postcode == 100  # unchanged
    assert final.transaction_dt == "2024-01-01 10:00:00"


def test_foreach_batch_ddmmyyyy_payload_orders_state(spark, tmp_path_factory, zip_geo):
    """ADVICE r1 (high): the reference's streaming payloads use
    dd-MM-yyyy HH:mm:ss (FinFraudGuard.java SimpleDateFormat). The lookup
    advance must parse it (ANSI to_timestamp would kill the query) AND
    order it correctly against a canonical-format event in the same batch:
    25-06-2024 is LATER than 2024-06-10 even though it sorts earlier as a
    string."""
    base = tmp_path_factory.mktemp("stream_fmt")
    stream_dir, lookup_dir = base / "in", base / "lookup"
    master_dir, ckpt_dir = base / "master", base / "ckpt"
    stream_dir.mkdir()

    lookup = spark.createDataFrame(
        [Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500)]
    )
    lookup.coalesce(1).write.parquet(str(lookup_dir))

    # One batch, two GENUINE events: canonical format June 10, then the
    # reference dd-MM-yyyy format June 25 (moves to LA slowly -> GENUINE).
    (stream_dir / "b1.json").write_text(
        json.dumps(_payload(1, 50, 100, "2024-06-10 10:00:00")) + "\n"
        + json.dumps(_payload(1, 50, 200, "25-06-2024 10:00:00", pos_id=2)) + "\n"
    )
    stream = read_payload_file_stream(spark, str(stream_dir))
    q = run_scorer(stream, str(lookup_dir), zip_geo, str(master_dir), str(ckpt_dir))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.read.parquet(str(lookup_dir)).collect()[0]
    # string max would pick "2024-06-10..."; parsed max picks June 25
    assert final.transaction_dt == "25-06-2024 10:00:00"
    assert final.postcode == 200


def test_foreach_batch_new_card_creates_state(spark, tmp_path_factory, zip_geo):
    """ADVICE r1 (medium): a GENUINE event for a card NOT in the lookup
    must create its state row (the reference's HBase Put is unconditional,
    HBaseTransLink.java:77-81), so the card's next event scores against
    real last-location state instead of NULL forever."""
    base = tmp_path_factory.mktemp("stream_new")
    stream_dir, lookup_dir = base / "in", base / "lookup"
    master_dir, ckpt_dir = base / "master", base / "ckpt"
    stream_dir.mkdir()

    lookup = spark.createDataFrame(
        [Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500)]
    )
    lookup.coalesce(1).write.parquet(str(lookup_dir))

    # batch 1: unseen card 99 in NYC (NULL state -> all rules False -> GENUINE)
    (stream_dir / "b1.json").write_text(
        json.dumps(_payload(99, 50, 100, "2024-01-05 10:00:00")) + "\n"
    )
    # batch 2: card 99 "teleports" to LA 1h later -- FRAUD only if batch 1
    # created state for it
    (stream_dir / "b2.json").write_text(
        json.dumps(_payload(99, 50, 200, "2024-01-05 11:00:00")) + "\n"
    )
    stream = read_payload_file_stream(spark, str(stream_dir))
    q = run_scorer(stream, str(lookup_dir), zip_geo, str(master_dir), str(ckpt_dir))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = {r.card_id: r for r in spark.read.parquet(str(lookup_dir)).collect()}
    assert 99 in final, "GENUINE event for a new card must create lookup state"
    assert final[99].ucl is None and final[99].score is None
    assert final[99].postcode == 100  # FRAUD teleport did not advance it
    master = {r.transaction_dt: r for r in spark.read.parquet(str(master_dir)).collect()}
    assert master["2024-01-05 10:00:00"].status == "GENUINE"
    assert master["2024-01-05 11:00:00"].status == "FRAUD"
    assert final[1].transaction_dt == "2024-01-01 10:00:00"  # untouched card intact


def test_atomic_overwrite_and_recovery(spark, tmp_path):
    """ADVICE r1 (medium): the lookup swap must not lose the table on a
    crash. Simulate the two crash windows and check recover_table heals
    both: (a) staging written, target renamed away (promote staging);
    (b) no complete staging (restore the __old backup)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.merge import (
        atomic_overwrite,
        recover_table,
    )

    target = str(tmp_path / "tbl")
    spark.range(5).write.parquet(target)
    atomic_overwrite(spark.range(10), target, "b1")
    assert spark.read.parquet(target).count() == 10
    assert not recover_table(spark, target)  # healthy -> no-op

    # crash window (a): complete staging exists, target vanished mid-swap
    spark.range(20).write.parquet(target + "__stage_b2")
    import shutil

    shutil.move(target, target + "__old")
    assert recover_table(spark, target)
    assert spark.read.parquet(target).count() == 20  # staging promoted

    # crash window (b): incomplete staging (no _SUCCESS) -> restore backup
    spark.range(30).write.parquet(target + "__stage_b3")
    (tmp_path / "tbl__stage_b3" / "_SUCCESS").unlink()
    shutil.move(target, target + "__old")
    assert recover_table(spark, target)
    assert spark.read.parquet(target).count() == 20  # backup restored


def test_decode_payload_typed_and_malformed(spark):
    """S12: JSON value -> typed payload; malformed rows become all-NULL
    records instead of killing the batch."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.scorer import decode_payload

    raw = spark.createDataFrame(
        [
            ('{"card_id": 7, "member_id": 1, "amount": 12.5, "pos_id": 9, '
             '"postcode": 100, "transaction_dt": "2024-01-01 10:00:00"}',),
            ("not json at all",),
        ],
        "value string",
    )
    rows = decode_payload(raw).collect()
    good = next(r for r in rows if r.card_id is not None)
    assert (good.card_id, good.amount, good.postcode) == (7, 12.5, 100)
    assert good.transaction_dt == "2024-01-01 10:00:00"
    bad = next(r for r in rows if r.card_id is None)
    assert all(v is None for v in bad.asDict().values())


def test_fold_intra_batch_read_your_writes():
    """SURVEY.md 2.10: two same-card events in ONE batch -- the second must
    see the state written by the first (GENUINE) event."""
    lookup = {1: (100.0, 500)}
    geo = {"100": NYC, "200": LA}
    events = [
        _payload(1, 50, 200, "2024-01-11 10:00:00"),  # slow move NYC->LA: GENUINE
        _payload(1, 50, 200, "2024-01-11 11:00:00"),  # same place 1h later
    ]
    statuses, state = fold_events(events, (100, "2024-01-01 10:00:00"), lookup, geo)
    assert statuses == ["GENUINE", "GENUINE"]
    assert state == (200, "2024-01-11 11:00:00")

    # Against PREVIOUS-batch-only visibility the second event would be a
    # 3936 km jump in 1h (1.09 km/s > 0.25) -> the fold semantics matter.
    statuses_stale, _ = fold_events(
        [events[1]], (100, "2024-01-01 10:00:00"), lookup, geo
    )
    assert statuses_stale == ["GENUINE"]  # 10 days elapsed -> slow enough
    statuses_fast, _ = fold_events(
        [_payload(1, 50, 200, "2024-01-01 11:00:00")], (100, "2024-01-01 10:00:00"), lookup, geo
    )
    assert statuses_fast == ["FRAUD"]


def test_fold_edge_cases():
    lookup = {1: (100.0, 500)}
    geo = {"100": NYC, "200": LA}
    # new card: no lookup row -> no rule can prove fraud
    statuses, _ = fold_events(
        [_payload(99, 1e9, 100, "2024-01-01 10:00:00")], (None, None), lookup, geo
    )
    assert statuses == ["GENUINE"]
    # zero dt -> speed rule fires
    statuses, _ = fold_events(
        [_payload(1, 50, 200, "2024-01-01 10:00:00")], (100, "2024-01-01 10:00:00"), lookup, geo
    )
    assert statuses == ["FRAUD"]
    # unknown zip -> speed rule passes
    statuses, _ = fold_events(
        [_payload(1, 50, 999, "2024-01-01 12:00:00")], (100, "2024-01-01 10:00:00"), lookup, geo
    )
    assert statuses == ["GENUINE"]
    # out-of-order event (negative dt) -> speed rule fires
    statuses, _ = fold_events(
        [_payload(1, 50, 200, "2023-12-31 10:00:00")], (100, "2024-01-01 10:00:00"), lookup, geo
    )
    assert statuses == ["FRAUD"]


def test_transform_with_state_matches_v1_backend(spark, tmp_path_factory):
    """Both stateful backends (applyInPandasWithState and
    transformWithStateInPandas) must produce identical output on the same
    replay -- they share fold_events, so this pins the wiring.

    The v2 backend is EXPERIMENTAL (COVERAGE.md): its runtime needs
    google.protobuf, which this image lacks. In a capable environment the
    test asserts full parity; here it asserts the DOCUMENTED failure mode
    (anything else -- e.g. an API break in stateful_v2 itself -- still
    fails the test), so the suite carries no perpetual skip."""
    import importlib.util

    try:  # find_spec imports the parent package, which may itself be absent
        has_tws_runtime = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_tws_runtime = False

    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful_v2 import (
        score_stream_stateful_v2,
    )

    base = tmp_path_factory.mktemp("twsv2")
    stream_dir = base / "in"
    stream_dir.mkdir()
    events = [
        _payload(1, 50, 200, "2024-01-11 10:00:00", pos_id=1),
        _payload(1, 50, 200, "2024-01-11 11:00:00", pos_id=2),
        _payload(2, 500, 100, "2024-01-01 12:00:00", pos_id=3),
        _payload(1, 50, 100, "2024-01-11 11:30:00", pos_id=4),
    ]
    (stream_dir / "b1.json").write_text("\n".join(json.dumps(e) for e in events))

    lookup = {1: (100.0, 500), 2: (100.0, 500)}
    geo = {"100": NYC, "200": LA}

    try:
        stream = read_payload_file_stream(spark, str(stream_dir))
        out = score_stream_stateful_v2(stream, lookup, geo)
        q = out.writeStream.outputMode("append").format("memory").queryName("tws_v2").start()
        try:
            q.processAllAvailable()
            v2 = {r.pos_id: r.status for r in spark.sql("SELECT * FROM tws_v2").collect()}
        finally:
            q.stop()
    except Exception as e:
        msg = str(e)
        if has_tws_runtime:
            raise
        # no protobuf -> the call-time probe in stateful_v2 rejects the
        # backend with ITS error, deterministically (anything else is a
        # regression in the gate itself)
        assert "google.protobuf" in msg and "EXPERIMENTAL" in msg, (
            f"unexpected v2-backend failure mode: {msg[:300]}"
        )
        return

    # v1 backend on the same batch
    lookup_bc = spark.sparkContext.broadcast(lookup)
    geo_bc = spark.sparkContext.broadcast(geo)
    stream1 = read_payload_file_stream(spark, str(stream_dir))
    out1 = score_stream_stateful(stream1, lookup_bc, geo_bc)
    q1 = out1.writeStream.outputMode("append").format("memory").queryName("tws_v1").start()
    try:
        q1.processAllAvailable()
        v1 = {r.pos_id: r.status for r in spark.sql("SELECT * FROM tws_v1").collect()}
    finally:
        q1.stop()

    assert v2 == v1
    assert v2[4] == "FRAUD"  # intra-batch read-your-writes held in v2 too


def test_stateful_streaming_matches_fold_oracle(spark, tmp_path_factory, zip_geo):
    """applyInPandasWithState output == pure-Python fold, including state
    carried across micro-batches and intra-batch sequencing."""
    base = tmp_path_factory.mktemp("stateful")
    stream_dir = base / "in"
    stream_dir.mkdir()

    b1 = [
        _payload(1, 50, 200, "2024-01-11 10:00:00", pos_id=1),
        _payload(1, 50, 200, "2024-01-11 11:00:00", pos_id=2),
        _payload(2, 500, 100, "2024-01-01 12:00:00", pos_id=3),
    ]
    b2 = [
        _payload(1, 50, 100, "2024-01-11 11:30:00", pos_id=4),  # LA->NYC in 30min: FRAUD
        _payload(2, 50, 100, "2024-01-01 13:00:00", pos_id=5),
    ]
    (stream_dir / "b1.json").write_text("\n".join(json.dumps(e) for e in b1))
    (stream_dir / "b2.json").write_text("\n".join(json.dumps(e) for e in b2))

    lookup = {1: (100.0, 500), 2: (100.0, 500)}
    geo = {"100": NYC, "200": LA}
    lookup_bc = spark.sparkContext.broadcast(lookup)
    geo_bc = spark.sparkContext.broadcast(geo)

    stream = read_payload_file_stream(spark, str(stream_dir))
    out = score_stream_stateful(stream, lookup_bc, geo_bc)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.pos_id: r.status for r in spark.sql("SELECT * FROM stateful_out").collect()
        }
    finally:
        q.stop()

    # oracle: fold per card across both batches in order
    state1 = (None, None)
    s1, state1 = fold_events([b1[0], b1[1]], state1, lookup, geo)
    s1b, state1 = fold_events([b2[0]], state1, lookup, geo)
    state2 = (None, None)
    s2, state2 = fold_events([b1[2]], state2, lookup, geo)
    s2b, state2 = fold_events([b2[1]], state2, lookup, geo)

    expected = {1: s1[0], 2: s1[1], 3: s2[0], 4: s1b[0], 5: s2b[0]}
    assert got == expected
    assert got[4] == "FRAUD"  # LA->NYC teleport caught via state from batch 1


def test_scorer_observability_metrics(spark, tmp_path_factory, zip_geo):
    """metrics_out collects per-batch Observation counts on the same pass
    that writes the master table, and the streaming source observe()
    surfaces n_rows in progress events."""
    base = tmp_path_factory.mktemp("obs")
    stream_dir, lookup_dir = base / "in", base / "lookup"
    master_dir, ckpt_dir = base / "master", base / "ckpt"
    stream_dir.mkdir()

    lookup = spark.createDataFrame(
        [Row(card_id=1, ucl=100.0, postcode=100, transaction_dt="2024-01-01 10:00:00", score=500)]
    )
    lookup.coalesce(1).write.parquet(str(lookup_dir))

    # batch 1: one genuine (same place, under UCL) + one fraud (over UCL)
    (stream_dir / "b1.json").write_text(
        json.dumps(_payload(1, 50, 100, "2024-01-02 10:00:00")) + "\n"
        + json.dumps(_payload(1, 5000, 100, "2024-01-02 11:00:00", pos_id=2)) + "\n"
    )

    metrics: list = []
    stream = read_payload_file_stream(spark, str(stream_dir))
    q = run_scorer(
        stream, str(lookup_dir), zip_geo, str(master_dir), str(ckpt_dir),
        metrics_out=metrics,
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()

    assert len(metrics) == 1
    assert metrics[0]["n_rows"] == 2
    assert metrics[0]["n_fraud"] == 1 and metrics[0]["n_genuine"] == 1
    observed = [
        p["observedMetrics"]["scorer_source"]["n_rows"]
        for p in progress
        if p.get("observedMetrics", {}).get("scorer_source")
    ]
    assert sum(observed) == 2


def test_kafka_reader_options_and_parse_path(spark):
    """S11 (r7 verdict item 8): exercise the Kafka readStream wiring as
    far as the sandbox allows -- the option map read_kafka_stream hands
    the source is asserted exactly, and reader construction (format +
    options) succeeds without a broker. `.load()` itself needs the
    spark-sql-kafka package; when absent the failure must be the
    missing-datasource error (i.e. the options PARSED and resolution
    reached the classpath lookup), not an option error."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.scorer import (
        kafka_source_options,
        read_kafka_stream,
    )

    opts = kafka_source_options("broker1:9092,broker2:9092", "txns")
    assert opts["subscribe"] == "txns"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert kafka_source_options("b:9092", "t", "latest")[
        "startingOffsets"
    ] == "latest"
    # reader construction parses without a broker or the kafka jar
    spark.readStream.format("kafka").options(**opts)
    try:
        read_kafka_stream(spark, "broker1:9092", "txns")
    except Exception as e:  # noqa: BLE001 -- asserting the failure class
        msg = str(e)
        assert "kafka" in msg.lower()
        assert "FAILED_TO_LOAD" in msg or "Failed to find" in msg or (
            "DATA_SOURCE" in msg
        ), msg
    else:  # pragma: no cover -- only on a cluster with the kafka jar
        pass
