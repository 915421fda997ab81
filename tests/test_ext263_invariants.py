"""Definition-level invariants for ext263 (curation_pipeline_e2e):
the fused single-plan DAG == four MATERIALIZED sequential stages, the
funnel is monotone, and the packing layout obeys the chunk law -- the
properties the (shared-formulation) DuckDB oracle cannot see."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext263 import (
    q_curation_pipeline_e2e,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.001"


def _stagewise(spark):
    """The four stages run SEQUENTIALLY, each materialized with
    localCheckpoint before the next -- the semantics the fused plan
    must reproduce."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        shingle_rows,
    )

    docs = read_table(spark, SF_DIR, "documents")
    pool = docs.where(F.col("source") != "src0").select(
        "doc_id", "source", "text"
    ).localCheckpoint(eager=True)

    # stage 1: dedup
    wfp = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s1 = (
        pool.withColumn("rn", F.row_number().over(wfp))
        .where(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    # stage 2: quality
    toks = F.split("text", " ")
    s2 = (
        s1.withColumn("n_tok", F.size(toks).cast("bigint"))
        .withColumn("n_dist", F.size(F.array_distinct(toks)).cast("bigint"))
        .where((F.col("n_tok") >= 8) & (2 * F.col("n_dist") >= F.col("n_tok")))
        .localCheckpoint(eager=True)
    )
    # stage 3: decontamination vs the FIXED eval split
    ev_sh = (
        shingle_rows(
            docs.where(F.col("source") == "src0").select("doc_id", "text"),
            "doc_id", "text", w=3,
        )
        .select("tok")
        .distinct()
    )
    shared = (
        shingle_rows(s2.select("doc_id", "text"), "doc_id", "text", w=3)
        .select("doc_id", "tok")
        .distinct()
        .join(ev_sh, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    s3 = (
        s2.join(shared, "doc_id", "left")
        .where(F.coalesce(F.col("ns"), F.lit(0)) < 5)
        .select("doc_id", "source", "n_tok")
        .localCheckpoint(eager=True)
    )
    # stage 4: packing
    wpk = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = s3.withColumn(
        "chunk_id",
        F.floor(F.coalesce(F.sum("n_tok").over(wpk), F.lit(0)) / 512.0)
        .cast("bigint"),
    )
    return pool, s1, s2, s3, packed


def test_fused_equals_stagewise(spark):
    pool, s1, s2, s3, packed = _stagewise(spark)
    stage_funnel = {
        r["source"]: r
        for r in (
            pool.groupBy("source").agg(F.count("*").alias("n_raw"))
            .join(s1.groupBy("source").agg(F.count("*").alias("n_dedup")), "source", "left")
            .join(s2.groupBy("source").agg(F.count("*").alias("n_quality")), "source", "left")
            .join(s3.groupBy("source").agg(F.count("*").alias("n_final")), "source", "left")
            .join(
                packed.groupBy("source").agg(
                    (F.max("chunk_id") + 1).alias("n_chunks"),
                    F.sum("n_tok").alias("packed_tokens"),
                ),
                "source",
                "left",
            )
            .collect()
        )
    }
    fused = {r["source"]: r for r in q_curation_pipeline_e2e(spark, SF_DIR).collect()}
    assert set(fused) == set(stage_funnel)
    for src, f in fused.items():
        s = stage_funnel[src]
        for col in ("n_raw", "n_dedup", "n_quality", "n_final"):
            assert f[col] == (s[col] or 0), (src, col, f[col], s[col])
        assert f["n_chunks"] == (s["n_chunks"] or 0), src
        assert f["packed_tokens"] == (s["packed_tokens"] or 0), src


def test_funnel_monotone_and_nonempty(spark):
    rows = q_curation_pipeline_e2e(spark, SF_DIR).collect()
    assert rows
    assert any(r["n_final"] > 0 for r in rows)
    for r in rows:
        assert r["n_raw"] >= r["n_dedup"] >= r["n_quality"] >= r["n_final"] >= 0
        # every stage must have bite SOMEWHERE (checked globally below)
    total = lambda c: sum(r[c] for r in rows)  # noqa: E731
    assert total("n_quality") < total("n_dedup")  # the gate filters
    assert total("n_final") <= total("n_quality")


def test_packing_chunk_law(spark):
    """n_chunks == floor(tokens-before-last-doc / 512) + 1 per source,
    and chunk ids are contiguous from 0."""
    *_, s3, packed = _stagewise(spark)
    for src_rows in (
        packed.groupBy("source")
        .agg(
            F.collect_list(F.struct("doc_id", "n_tok", "chunk_id")).alias("rs")
        )
        .collect()
    ):
        rs = sorted(src_rows["rs"], key=lambda r: r["doc_id"])
        cum = 0
        chunks = set()
        for r in rs:
            assert r["chunk_id"] == cum // 512
            chunks.add(r["chunk_id"])
            cum += r["n_tok"]
        assert chunks == set(range(max(chunks) + 1))
