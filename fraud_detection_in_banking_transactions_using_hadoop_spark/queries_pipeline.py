"""Training-data pipeline batch: the operations a 100 TB pretraining
corpus build needs BETWEEN dedup and the trainer -- deterministic
splits, stratified sampling, sequence packing, train/test contamination
checks, repetition scoring, and source-mixture weighting.

Everything is hash-deterministic (md5-prefix buckets, identical in both
engines) rather than rand()-based, for three reasons: reproducible
pipelines (the property every published data recipe insists on),
exact DuckDB oracles, and stable re-runs on changing cluster sizes --
rand(seed) changes with partitioning; md5(doc_id) never does.

Cross-engine parity notes (CLAUDE.md): hash buckets compare md5-hex
prefixes converted to BIGINT (`conv(...,16,10)` / `('0x'||...)::BIGINT`
-- both exact on 4 hex digits); ratios round(6); counts cast BIGINT
both sides; floor() before any double->BIGINT cast (DuckDB rounds,
Spark truncates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _bucket(col, mod: int):
    """Deterministic [0, mod) bucket from the first 4 hex digits of
    md5(col-as-string). 16 bits of hash -> uniform enough for split
    ratios; identical arithmetic in DuckDB (`('0x'||substr)::BIGINT`)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint")
        % mod
    )


_BUCKET_SQL = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))::BIGINT % {mod}"


# ---------------------------------------------------------------------------
# Deterministic train/valid/test split -- the reproducibility primitive.
# ---------------------------------------------------------------------------
@register(
    "train_test_split",
    f"""
    WITH b AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
             {_BUCKET_SQL.format(col='doc_id', mod=100)} AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM b GROUP BY 1
    """,
    tags=("pipeline", "split"),
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split keyed on md5(doc_id): a doc lands in the same split
    on every run, every cluster size, every engine -- the property
    rand() cannot give. Scale: pure map-side expression + one
    3-group aggregate; no shuffle beyond the final combine."""
    docs = read_table(spark, sf_dir, "documents")
    bucket = _bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Stratified sample: same fraction from every source stratum.
# ---------------------------------------------------------------------------
@register(
    "stratified_sample",
    f"""
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    WHERE {_BUCKET_SQL.format(col='doc_id', mod=1000)} < 100
    """,
    tags=("pipeline", "sampling"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% hash-sample. Stratification is inherent: md5 is independent
    of `source`, so each stratum is sampled at the same rate without a
    per-stratum pass. Pure filter -- pushed to the scan, no shuffle,
    and the SAME rows survive at any scale factor or cluster size."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(_bucket(F.col("doc_id"), 1000) < 100).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chunk docs into fixed token windows.
# ---------------------------------------------------------------------------
@register(
    "pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
      FROM documents),
    c AS (
      SELECT source, n_tok,
             coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t)
    SELECT source, CAST(floor(cum_before / 512.0) AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS chunk_tokens
    FROM c GROUP BY source, CAST(floor(cum_before / 512.0) AS BIGINT)
    """,
    tags=("pipeline", "packing", "W4"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing (the standard pretraining batch
    layout): stream each source's docs in doc_id order, cut a chunk
    boundary every 512 tokens, assign each doc to the chunk where its
    first token lands. Packing WITHIN the source partition is the scale
    decision -- a single global ORDER BY window funnels 100 TB through
    one task, while per-source windows shuffle once on source and pack
    in parallel. doc_id ordering makes the layout reproducible."""
    docs = read_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    ).withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        t.select(
            "source",
            "n_tok",
            F.floor(F.col("cum_before") / 512.0).cast("bigint").alias("chunk_id"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Train/test contamination: eval docs sharing 3-gram shingles with train.
# ---------------------------------------------------------------------------
@register(
    "contamination_check",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                              i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]))
             )) AS tok
      FROM t),
    train_sh AS (SELECT DISTINCT tok FROM sh WHERE source <> 'src0'),
    shared AS (
      SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM sh s JOIN train_sh USING (tok)
      WHERE s.source = 'src0'
      GROUP BY s.doc_id)
    SELECT d.doc_id, coalesce(n_shared, 0) AS n_shared,
           coalesce(n_shared, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
    LEFT JOIN shared ON shared.doc_id = d.doc_id
    """,
    tags=("pipeline", "contamination", "semi"),
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval doc (source src0): how many of its distinct word
    3-shingles appear anywhere in the train split -- the n-gram-overlap
    decontamination check every published eval protocol runs. Scale: the
    join shuffles on the shingle string (the only viable key); train
    shingles are pre-DISTINCTed so the fact side is set-sized, and the
    count aggregate is map-side combined on doc_id."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import shingle_rows

    docs = read_table(spark, sf_dir, "documents")
    sh = shingle_rows(
        docs.select("doc_id", "source", "text"), "doc_id", "text", w=3,
        carry=("source",),
    )
    test_sh = (
        sh.filter(F.col("source") == "src0").select("doc_id", "tok").distinct()
    )
    train_sh = sh.filter(F.col("source") != "src0").select("tok").distinct()
    shared = (
        test_sh.join(train_sh, "tok")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    test_docs = docs.filter(F.col("source") == "src0").select("doc_id")
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint"))
    return test_docs.join(shared, "doc_id", "left").select(
        "doc_id",
        n_shared.alias("n_shared"),
        (n_shared >= 5).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Repetition scoring: the boilerplate/degenerate-text quality signal.
# ---------------------------------------------------------------------------
@register(
    "repetition_ratio",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_tok_share
    FROM cnt GROUP BY doc_id
    """,
    tags=("pipeline", "quality"),
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-repetition signals per doc: distinct/total ratio and the
    share of the single most frequent token (Gopher-style repetition
    filters threshold exactly these). Two aggregations, both keyed by
    doc_id -- the second reuses the first's hash partitioning, so the
    explode is the only fact-sized shuffle input."""
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(F.count("*").cast("double") / F.sum("c"), 6).alias("distinct_ratio"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_tok_share"),
    )


# ---------------------------------------------------------------------------
# Source mixture weighting: equalizing sampling weights across sources.
# ---------------------------------------------------------------------------
@register(
    "source_mixture",
    """
    WITH s AS (
      SELECT source, sum(len(string_split(text, ' '))) AS src_tokens
      FROM documents GROUP BY source)
    SELECT source, CAST(src_tokens AS BIGINT) AS src_tokens,
           round(least(1.0,
             (sum(src_tokens) OVER () / CAST(count(*) OVER () AS DOUBLE))
               / src_tokens), 6) AS weight
    FROM s
    """,
    tags=("pipeline", "mixture"),
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weight that equalizes the token mixture:
    weight = min(1, mean_source_tokens / source_tokens). The global mean
    arrives as a broadcast 1-row aggregate (not an unpartitioned window,
    which would log a single-partition warning even on the tiny
    per-source table) -- the 100 TB work is the first aggregate, which
    is map-side combined on the ~constant source key."""
    docs = read_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("src_tokens")
    )
    totals = s.agg(
        (F.sum("src_tokens") / F.count("*").cast("double")).alias("_mean_tokens")
    )
    return s.crossJoin(F.broadcast(totals)).select(
        "source",
        F.col("src_tokens").cast("bigint").alias("src_tokens"),
        F.round(
            F.least(F.lit(1.0), F.col("_mean_tokens") / F.col("src_tokens")), 6
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Per-source document cap -- the domain-balancing sampler.
# ---------------------------------------------------------------------------
@register(
    "source_cap_sample",
    """
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= 15
    """,
    tags=("pipeline", "sampling", "W2"),
)
def q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 15 docs, chosen by md5-hash order -- the
    'no domain dominates the mix' guard (sampling a domain down without
    favoring low doc_ids). Hash order makes the chosen subset a uniform
    random-looking sample that is still deterministic across engines
    and cluster sizes; doc_id is the total-order tiebreak (CLAUDE.md:
    windows in oracled queries always carry a unique tiebreak). Plan:
    partial+final WindowGroupLimit prunes to k rows per source BEFORE
    the single exchange -- the same top-k shape as ucl_grouped, so the
    fact never shuffles in full."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 15)
        .select("doc_id", "source")
    )
