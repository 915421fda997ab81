"""Custom Python DataSource and UDTF extension surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.synthetic import register_synthetic_source
from fraud_detection_in_banking_transactions_using_hadoop_spark.functions.udtf import register_udtfs


def test_synthetic_source_deterministic_and_partitioned(spark):
    register_synthetic_source(spark)
    df = spark.read.format("fraud_synth").option("rows", 500).option("partitions", 4).load()
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4
    # deterministic: two independent reads agree row-for-row
    df2 = spark.read.format("fraud_synth").option("rows", 500).option("partitions", 4).load()
    assert df.exceptAll(df2).count() == 0 and df2.exceptAll(df).count() == 0
    # schema + content sanity
    row = df.filter(F.col("pos_id") == 0).collect()[0]
    assert row.amount > 0 and row.status in ("GENUINE", "FRAUDULENT")
    assert len(row.transaction_dt) == 19


def test_synthetic_source_feeds_lookup_build(spark):
    # the custom source plugs into the real pipeline unchanged
    from pyspark.sql import Row

    from fraud_detection_in_banking_transactions_using_hadoop_spark.plans.lookup import build_lookup

    register_synthetic_source(spark)
    txns = spark.read.format("fraud_synth").option("rows", 2000).option("cards", 20).load()
    members = spark.createDataFrame(
        [Row(card_id=c, member_id=(c - 1) // 2 + 1, member_joining_dt="2020-01-01",
             card_purchase_dt="2020-01-02", country="US", city="X") for c in range(1, 21)]
    )
    scores = spark.createDataFrame([Row(member_id=m, score=600) for m in range(1, 12)])
    lookup = build_lookup(txns, members, scores)
    assert lookup.count() == 20
    assert lookup.filter(F.col("ucl").isNull()).count() == 0


def test_synthetic_stream_source_bounded_replay(spark):
    """Streaming variant: micro-batches of rows_per_batch until max_rows,
    then drains; content identical to the batch source rows."""
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("fraud_synth")
        .option("rows_per_batch", 40)
        .option("max_rows", 120)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("synth_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM synth_stream").collect()
    finally:
        q.stop()
    assert len(got) == 120
    batch = spark.read.format("fraud_synth").option("rows", 120).load().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_synthetic_stream_drives_stateful_scorer(spark):
    """Soak path: streaming synthetic payloads straight into the stateful
    per-card scorer (no files anywhere)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.streaming.stateful import score_stream_stateful

    register_synthetic_source(spark)
    payloads = (
        spark.readStream.format("fraud_synth")
        .option("rows_per_batch", 100)
        .option("max_rows", 300)
        .option("cards", 10)
        .load()
        .drop("status")
    )
    lookup_bc = spark.sparkContext.broadcast({c: (300.0, 500) for c in range(1, 11)})
    geo_bc = spark.sparkContext.broadcast(
        {"100": (40.7, -74.0), "200": (34.0, -118.2), "300": (51.5, -0.1),
         "400": (35.6, 139.6)}
    )
    out = score_stream_stateful(payloads, lookup_bc, geo_bc)
    q = out.writeStream.outputMode("append").format("memory").queryName("synth_scored").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM synth_scored").collect()
    finally:
        q.stop()
    assert len(rows) == 300
    statuses = {r.status for r in rows}
    assert statuses <= {"GENUINE", "FRAUD"} and len(statuses) == 2


def test_shingles_udtf_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame([(1, "a b c d")], "id long, text string").createOrReplaceTempView(
        "udtf_docs"
    )
    rows = spark.sql(
        "SELECT id, s.shingle, s.pos FROM udtf_docs, LATERAL explode_shingles(text, 3) s"
    ).collect()
    assert [(r.shingle, r.pos) for r in rows] == [("a b c", 0), ("b c d", 1)]
    # short doc: whole text as single shingle
    spark.createDataFrame([(2, "xy")], "id long, text string").createOrReplaceTempView("udtf_docs2")
    short = spark.sql(
        "SELECT s.shingle FROM udtf_docs2, LATERAL explode_shingles(text, 3) s"
    ).collect()
    assert [r.shingle for r in short] == ["xy"]


def test_udtf_matches_expression_shingles(spark):
    # UDTF and the pure-expression operator must agree
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import shingles

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "id long, text string"
    )
    expr_out = df.select(F.explode(shingles(F.col("text"), 3)).alias("s")).collect()
    df.createOrReplaceTempView("udtf_docs3")
    udtf_out = spark.sql(
        "SELECT s.shingle AS s FROM udtf_docs3, LATERAL explode_shingles(text, 3) s"
    ).collect()
    assert [r.s for r in expr_out] == [r.s for r in udtf_out]


def test_classify_tokens_udtf(spark):
    register_udtfs(spark)
    spark.createDataFrame([("abc 123 a1!",)], "text string").createOrReplaceTempView("udtf_t")
    got = {
        (r.tok, r.kind)
        for r in spark.sql("SELECT t.* FROM udtf_t, LATERAL classify_tokens(text) t").collect()
    }
    assert got == {("abc", "word"), ("123", "number"), ("a1!", "symbol")}
