"""Extension batch 263 (round 13): the end-to-end curation DAG -- the
r12 verdict's item 5.

Every stage of the LLM-curation tier is verified solo (dedup, quality
gating, decontamination, packing); `curation_pipeline_e2e` composes
them as ONE Spark plan -- each stage's output feeding the next with no
materialization between stages -- which is the shape a real 100 TB
curation run has (one pass over the corpus; flags and windows, not
intermediate tables).

The pipeline (train pool = every non-src0 doc; src0 is the held-out
eval benchmark):

  1. exact dedup      keep the min-doc_id canonical per md5(text)
                      fingerprint group;
  2. quality gate     n_tokens >= 8 AND type-token ratio >= 1/2
                      (2*distinct >= total -- integer form, no float
                      threshold);
  3. decontamination  drop docs sharing >= 5 distinct word 3-shingles
                      with the eval split (the contamination_check
                      rule, applied in the filtering direction);
  4. packing          concat-and-chunk survivors per source into
                      512-token chunks (the pack_sequences layout).

Output: the per-source FUNNEL (n_raw -> n_dedup -> n_quality ->
n_final) plus the packed layout (n_chunks, packed_tokens) -- the
dashboard row a curation run emits per source shard.

Fusion correctness: stages 1-3 are flag-computable on the full pool
(dedup canonicality depends only on the doc's fingerprint group,
quality only on the doc, contamination only on the doc vs the FIXED
eval set), so conditional aggregation over one flags frame ==
sequential stage-wise filtering; stage 4's cumulative window runs over
exactly the stage-3 survivor set. tests/test_ext263_invariants.py
materializes each stage separately and asserts stage-wise == fused,
plus funnel monotonicity and packing-capacity laws.

Scale notes: dedup is a window over the fingerprint shuffle (no
pairwise compare); quality is map-side; the decon join shuffles on the
shingle string with the eval side pre-DISTINCTed; packing windows are
per-source. No stage collects, no stage re-reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_SHINGLE_LIST = (
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),"
    " i -> concat_ws(' ', string_split(text, ' ')[i],"
    " string_split(text, ' ')[i + 1], string_split(text, ' ')[i + 2])))"
)

_E2E_SQL = f"""
    WITH pool AS MATERIALIZED (
      SELECT doc_id, source, text FROM documents WHERE source <> 'src0'),
    fp AS (
      SELECT doc_id, source, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
               AS rn
      FROM pool),
    flags AS MATERIALIZED (
      SELECT doc_id, source,
             CAST(rn = 1 AS INTEGER) AS canon,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_dist
      FROM fp),
    sh AS (
      SELECT doc_id, unnest({_SHINGLE_LIST}) AS tok FROM pool),
    ev AS (
      SELECT DISTINCT unnest({_SHINGLE_LIST}) AS tok
      FROM documents WHERE source = 'src0'),
    shared AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS ns
      FROM sh s JOIN ev USING (tok) GROUP BY s.doc_id),
    staged AS MATERIALIZED (
      SELECT f.doc_id, f.source, f.n_tok,
             f.canon,
             CASE WHEN f.canon = 1 AND f.n_tok >= 8
                       AND 2 * f.n_dist >= f.n_tok
                  THEN 1 ELSE 0 END AS quality,
             CASE WHEN f.canon = 1 AND f.n_tok >= 8
                       AND 2 * f.n_dist >= f.n_tok
                       AND coalesce(sd.ns, 0) < 5
                  THEN 1 ELSE 0 END AS final
      FROM flags f LEFT JOIN shared sd ON sd.doc_id = f.doc_id),
    packed AS (
      SELECT source,
             CAST(floor(coalesce(sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 512.0) AS BIGINT) AS chunk_id,
             n_tok
      FROM staged WHERE final = 1),
    pagg AS (
      SELECT source,
             CAST(max(chunk_id) + 1 AS BIGINT) AS n_chunks,
             CAST(sum(n_tok) AS BIGINT) AS packed_tokens
      FROM packed GROUP BY source)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(s.canon) AS BIGINT) AS n_dedup,
           CAST(sum(s.quality) AS BIGINT) AS n_quality,
           CAST(sum(s.final) AS BIGINT) AS n_final,
           CAST(coalesce(max(p.n_chunks), 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(max(p.packed_tokens), 0) AS BIGINT)
             AS packed_tokens
    FROM staged s LEFT JOIN pagg p ON p.source = s.source
    GROUP BY s.source
"""


@register(
    "curation_pipeline_e2e",
    _E2E_SQL,
    tags=("llm", "data-curation", "pipeline", "dedup", "scale-path"),
)
def q_curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused curation DAG (module docstring): dedup -> quality ->
    decontamination -> packing in ONE plan. Stages 1-3 are per-doc
    flags (conditional aggregation == sequential filtering, proven by
    the invariant test); stage 4's packing window runs over the final
    survivor set only. The per-source funnel + packed layout is the
    output contract."""
    docs = read_table(spark, sf_dir, "documents")
    pool = docs.where(F.col("source") != "src0").select(
        "doc_id", "source", "text"
    )

    # stage 1: exact-fingerprint dedup (canonical = min doc_id per group)
    wfp = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    toks = F.split("text", " ")
    flags = pool.select(
        "doc_id",
        "source",
        "text",
        (F.row_number().over(wfp) == 1).cast("int").alias("canon"),
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_dist"),
    )

    # stage 3 signal: distinct 3-shingles shared with the eval split
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        shingle_rows,
    )

    pool_sh = (
        shingle_rows(pool, "doc_id", "text", w=3)
        .select("doc_id", "tok")
        .distinct()
    )
    ev_sh = (
        shingle_rows(
            docs.where(F.col("source") == "src0").select("doc_id", "text"),
            "doc_id",
            "text",
            w=3,
        )
        .select("tok")
        .distinct()
    )
    shared = (
        pool_sh.join(ev_sh, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    )

    # stages 2+3 as flags (set-independent per doc; see module docstring)
    quality_ok = (F.col("canon") == 1) & (F.col("n_tok") >= 8) & (
        2 * F.col("n_dist") >= F.col("n_tok")
    )
    staged = flags.join(shared, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_tok",
        "canon",
        F.when(quality_ok, 1).otherwise(0).alias("quality"),
        F.when(
            quality_ok & (F.coalesce(F.col("ns"), F.lit(0)) < 5), 1
        )
        .otherwise(0)
        .alias("final"),
    )

    # stage 4: concat-and-chunk packing over the final survivors
    wpk = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        staged.where(F.col("final") == 1)
        .withColumn(
            "chunk_id",
            F.floor(
                F.coalesce(F.sum("n_tok").over(wpk), F.lit(0)) / 512.0
            ).cast("bigint"),
        )
    )
    pagg = packed.groupBy("source").agg(
        (F.max("chunk_id") + 1).cast("bigint").alias("n_chunks"),
        F.sum("n_tok").cast("bigint").alias("packed_tokens"),
    )

    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.sum("canon").cast("bigint").alias("n_dedup"),
            F.sum("quality").cast("bigint").alias("n_quality"),
            F.sum("final").cast("bigint").alias("n_final"),
        )
        .join(pagg, "source", "left")
        .select(
            "source",
            "n_raw",
            "n_dedup",
            "n_quality",
            "n_final",
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("packed_tokens", F.lit(0))
            .cast("bigint")
            .alias("packed_tokens"),
        )
    )
