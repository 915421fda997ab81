"""Extension batch 266 (round 13): two pretraining-ops primitives the
curation tier still lacked.

- token_budget_waterfill: allocate a total training-token budget B
  across sources under availability caps -- the WATERFILLING rule
  (equal shares, capped sources keep their whole supply, surplus
  redistributes among the rest). Exact integer closed form via one
  sorted prefix-sum pass: j* = max { j : a_(j) * (K - j) <= B -
  cum_(j) } sources are fully taken, the rest get level = (B -
  cum_(j*)) DIV (K - j*) with the remainder handed to the first
  `rem` uncapped sources in the SAME deterministic sort order --
  sum(allocated) == B holds exactly (pytest-pinned). This is how a
  target mixture becomes an actual per-source token count at 100 TB:
  one 20-row aggregate, no iteration.

- pack_greedy_waste: the packing-layout design question behind
  pack_sequences: concat-and-chunk (cuts docs at 512-token
  boundaries, zero waste, but splits documents) vs doc-boundary-
  respecting GREEDY packing (a doc that does not fit the remaining
  capacity closes the chunk -- no doc is ever split, the chunk tail
  is padding). Output per source: both chunk counts and the greedy
  padding. The greedy fold is sequential WITHIN a source and
  embarrassingly parallel ACROSS sources (applyInPandas per source --
  exactly the 100 TB layout job); the DuckDB oracle replays it as a
  per-source recursive CTE over a MATERIALIZED doc-length LIST (the
  r12 listing pattern). Docs here are all far below the 512 cap; the
  operator still defines the oversize rule (own chunk) and the
  invariant test exercises it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CAP = 512


@register(
    "token_budget_waterfill",
    """
    WITH a AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(sum(avail) AS BIGINT) AS total,
             CAST(sum(avail) // 2 AS BIGINT) AS budget,
             CAST(count(*) AS BIGINT) AS kk
      FROM a),
    srt AS (
      SELECT source, avail,
             CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS j,
             CAST(sum(avail) OVER (ORDER BY avail, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM a),
    jstar AS (
      SELECT CAST(coalesce(max(j), 0) AS BIGINT) AS js
      FROM srt CROSS JOIN tot
      WHERE avail * (kk - j) <= budget - cum),
    lvl AS (
      SELECT js,
             CAST((budget - coalesce(cumj, 0)) // (kk - js) AS BIGINT)
               AS level,
             CAST((budget - coalesce(cumj, 0)) % (kk - js) AS BIGINT)
               AS rem
      FROM jstar CROSS JOIN tot
      LEFT JOIN (SELECT j, cum AS cumj FROM srt) c ON c.j = jstar.js)
    SELECT s.source, s.avail AS available_tokens,
           CASE WHEN s.j <= l.js THEN s.avail
                ELSE l.level + CASE WHEN s.j - l.js <= l.rem
                                    THEN 1 ELSE 0 END
           END AS allocated_tokens,
           CAST(s.j <= l.js AS INTEGER) AS capped
    FROM srt s CROSS JOIN lvl l
    """,
    tags=("llm", "data-curation", "pipeline", "exact-arith"),
)
def q_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer waterfilling of a half-the-corpus token budget across
    sources (module docstring): capped sources (supply below the water
    level) contribute everything; the rest share the remainder evenly
    with a deterministic integer-remainder assignment. One sorted
    prefix-sum pass over the per-source aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    a = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("avail")
    )
    tot = a.agg(
        F.sum("avail").cast("bigint").alias("total"),
        F.expr("CAST(sum(avail) DIV 2 AS BIGINT)").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    ws = Window.orderBy("avail", "source")
    srt = a.select(
        "source",
        "avail",
        F.row_number().over(ws).cast("bigint").alias("j"),
        F.sum("avail")
        .over(ws.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
    ).localCheckpoint(eager=True)
    jstar = (
        srt.crossJoin(F.broadcast(tot))
        .where(
            F.col("avail") * (F.col("kk") - F.col("j"))
            <= F.col("budget") - F.col("cum")
        )
        .agg(F.coalesce(F.max("j"), F.lit(0)).cast("bigint").alias("js"))
    )
    cumj = srt.select(F.col("j").alias("js"), F.col("cum").alias("cumj"))
    lvl = (
        jstar.crossJoin(F.broadcast(tot))
        .join(F.broadcast(cumj), "js", "left")
        .select(
            "js",
            F.expr(
                "CAST((budget - coalesce(cumj, 0)) DIV (kk - js) AS BIGINT)"
            ).alias("level"),
            F.expr(
                "CAST((budget - coalesce(cumj, 0)) % (kk - js) AS BIGINT)"
            ).alias("rem"),
        )
    )
    return srt.crossJoin(F.broadcast(lvl)).select(
        "source",
        F.col("avail").alias("available_tokens"),
        F.when(F.col("j") <= F.col("js"), F.col("avail"))
        .otherwise(
            F.col("level")
            + F.when(F.col("j") - F.col("js") <= F.col("rem"), 1).otherwise(0)
        )
        .alias("allocated_tokens"),
        (F.col("j") <= F.col("js")).cast("int").alias("capped"),
    )


def greedy_pack_counts(lens: list[int], cap: int = _CAP) -> tuple[int, int]:
    """(n_chunks, padding) of doc-boundary-respecting greedy packing in
    arrival order: a doc that does not fit the remaining capacity
    closes the chunk; an oversize doc (> cap) takes its own chunk with
    zero padding. Shared by the operator and its pytest."""
    if not lens:
        return 0, 0
    chunks, rem = 0, 0
    padding = 0
    for n in lens:
        if n > cap:
            padding += rem
            rem = 0
            chunks += 1
            continue
        if n > rem:
            padding += rem
            chunks += 1
            rem = cap
        rem -= n
    padding += rem
    return chunks, padding


@register(
    "pack_greedy_waste",
    f"""
    WITH RECURSIVE t AS MATERIALIZED (
      SELECT source,
             list(CAST(len(string_split(text, ' ')) AS BIGINT)
                  ORDER BY doc_id) AS ls,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tok
      FROM documents GROUP BY source),
    fold(source, i, chunks, rem, pad) AS (
      SELECT source, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM t
      UNION ALL
      SELECT f.source, f.i + 1,
             CASE WHEN ln > {_CAP} THEN f.chunks + 1
                  WHEN ln > f.rem THEN f.chunks + 1
                  ELSE f.chunks END,
             CASE WHEN ln > {_CAP} THEN CAST(0 AS BIGINT)
                  WHEN ln > f.rem THEN {_CAP} - ln
                  ELSE f.rem - ln END,
             CASE WHEN ln > {_CAP} THEN f.pad + f.rem
                  WHEN ln > f.rem THEN f.pad + f.rem
                  ELSE f.pad END
      FROM (SELECT f0.*, t.ls[f0.i + 1] AS ln, t.n_docs
            FROM fold f0 JOIN t ON t.source = f0.source
            WHERE f0.i < t.n_docs) f),
    fin AS (
      SELECT f.source, f.chunks AS n_chunks_greedy, f.pad + f.rem AS pad_g
      FROM fold f JOIN t ON t.source = f.source
      WHERE f.i = t.n_docs),
    concat_chunks AS (
      SELECT source,
             CAST(max(CAST(floor(cum_before / {_CAP}.0) AS BIGINT)) + 1
                  AS BIGINT) AS n_chunks_concat
      FROM (
        SELECT source,
               coalesce(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cum_before
        FROM documents)
      GROUP BY source)
    SELECT t.source, t.n_docs, t.total_tok AS total_tokens,
           c.n_chunks_concat, f.n_chunks_greedy,
           CAST(f.pad_g AS BIGINT) AS padding_greedy
    FROM t JOIN fin f ON f.source = t.source
    JOIN concat_chunks c ON c.source = t.source
    """,
    tags=("llm", "data-curation", "packing", "exact-arith"),
)
def q_pack_greedy_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-chunk vs doc-boundary greedy packing per source (module
    docstring). The greedy fold runs in applyInPandas -- sequential
    within a source, parallel across sources, the exact parallelism a
    real packing job has; the concat layout is the pack_sequences
    window. The oracle replays the greedy recursion over a
    materialized per-source length list."""
    docs = read_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        lens = [int(x) for x in pdf["n_tok"]]
        chunks, pad = greedy_pack_counts(lens)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(lens)],
                "total_tokens": [sum(lens)],
                "n_chunks_greedy": [chunks],
                "padding_greedy": [pad],
            }
        )

    greedy = t.groupBy("source").applyInPandas(
        pack,
        "source string, n_docs bigint, total_tokens bigint,"
        " n_chunks_greedy bigint, padding_greedy bigint",
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    concat_chunks = (
        t.withColumn(
            "cum_before", F.coalesce(F.sum("n_tok").over(wc), F.lit(0))
        )
        .select(
            "source",
            F.floor(F.col("cum_before") / float(_CAP))
            .cast("bigint")
            .alias("chunk_id"),
        )
        .groupBy("source")
        .agg((F.max("chunk_id") + 1).cast("bigint").alias("n_chunks_concat"))
    )
    return greedy.join(concat_chunks, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "n_chunks_concat",
        "n_chunks_greedy",
        "padding_greedy",
    )
