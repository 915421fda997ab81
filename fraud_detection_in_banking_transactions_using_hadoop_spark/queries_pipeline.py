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


# ---------------------------------------------------------------------------
# Distribution drift: two-sample Kolmogorov-Smirnov statistic.
# ---------------------------------------------------------------------------
@register(
    "length_drift_ks",
    """
    WITH vals AS (
      SELECT n_chars AS v,
             count(*) FILTER (WHERE source = 'src0') AS ca,
             count(*) FILTER (WHERE source = 'src1') AS cb
      FROM documents WHERE source IN ('src0', 'src1') GROUP BY n_chars),
    tot AS (
      SELECT sum(ca) AS na, sum(cb) AS nb FROM vals),
    cdf AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v) / (SELECT CAST(na AS DOUBLE) FROM tot) AS fa,
             sum(cb) OVER (ORDER BY v) / (SELECT CAST(nb AS DOUBLE) FROM tot) AS fb
      FROM vals)
    SELECT round(max(abs(fa - fb)), 6) AS ks_stat,
           CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
           CAST((SELECT nb FROM tot) AS BIGINT) AS n_b
    FROM cdf
    """,
    tags=("pipeline", "drift", "stats"),
)
def q_length_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between two sources' doc-length
    distributions -- the drift alarm between pipeline runs. The ECDF
    window runs over the DISTINCT VALUE GRID (bounded by the metric's
    range, not the corpus), after a map-side-combined per-value count;
    partitioning by a constant documents that the single-task window is
    a deliberate bounded-input choice, the same driver-side-smallness
    argument as the IVF/PCA fits."""
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count_if(F.col("source") == "src0").alias("ca"),
        F.count_if(F.col("source") == "src1").alias("cb"),
    )
    tot = vals.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy("v")
    cdf = (
        vals.crossJoin(F.broadcast(tot))
        .withColumn("fa", F.sum("ca").over(w) / F.col("na"))
        .withColumn("fb", F.sum("cb").over(w) / F.col("nb"))
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# Winsorized (clipped) robust statistics.
# ---------------------------------------------------------------------------
@register(
    "winsorized_stats",
    """
    WITH b AS (
      SELECT source, n_chars,
             quantile_cont(n_chars, 0.05) OVER (PARTITION BY source) AS lo,
             quantile_cont(n_chars, 0.95) OVER (PARTITION BY source) AS hi
      FROM documents)
    SELECT source,
           round(avg(least(greatest(CAST(n_chars AS DOUBLE), lo), hi)), 6)
             AS wins_mean,
           round(min(lo), 6) AS p05, round(min(hi), 6) AS p95,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY source
    """,
    tags=("pipeline", "robust", "stats"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of doc length per source: clip to the [p05, p95]
    band, then average -- the robust-location estimate quality dashboards
    use so a few megadocs can't move the needle. Exact per-group
    percentiles sort within the group (the honest cost; swap in
    approx_percentile at extreme scale), and the clip + mean reuse the
    same source partitioning."""
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source")
    v = F.col("n_chars").cast("double")
    b = docs.select(
        "source",
        v.alias("v"),
        F.expr("percentile(n_chars, 0.05)").over(w).alias("lo"),
        F.expr("percentile(n_chars, 0.95)").over(w).alias("hi"),
    )
    return b.groupBy("source").agg(
        F.round(F.avg(F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))), 6)
        .alias("wins_mean"),
        F.round(F.min("lo"), 6).alias("p05"),
        F.round(F.min("hi"), 6).alias("p95"),
        F.count("*").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Mixture schedule: interleave sources into one training order.
# ---------------------------------------------------------------------------
@register(
    "mixture_schedule",
    """
    WITH w AS (
      SELECT source, count(*) AS sz,
             CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS weight
      FROM documents GROUP BY source),
    pos AS (
      SELECT doc_id, d.source,
             row_number() OVER (PARTITION BY d.source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             weight
      FROM documents d JOIN w ON w.source = d.source),
    keyed AS (
      SELECT doc_id, source, rk, rk / weight AS schedule_key FROM pos)
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY schedule_key, source, doc_id) AS BIGINT)
             AS train_pos
    FROM keyed
    WHERE schedule_key <= 60.0 / (SELECT min(weight) FROM w) / 3
    """,
    tags=("pipeline", "mixture", "W1"),
)
def q_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional source interleaving: doc k of a source with mixture
    weight p is scheduled at key k/p, so a global sort by key emits
    sources at their target rates (the deterministic form of temperature
    sampling a training dataloader runs). Hash-ordered rank within each
    source keeps the per-source order unbiased and reproducible. The
    global ordering window runs on the PREFIX being scheduled (the WHERE
    bounds it), mirroring how real schedules materialize epoch chunks,
    not whole corpora; at full scale, range-partition by schedule_key
    instead of a single sort."""
    docs = read_table(spark, sf_dir, "documents")
    total = docs.count()
    w = docs.groupBy("source").agg(
        (F.count("*").cast("double") / F.lit(float(total))).alias("weight")
    )
    min_weight = w.agg(F.min("weight").alias("mw")).first()["mw"]
    wsrc = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    keyed = (
        docs.join(F.broadcast(w), "source")
        .withColumn("rk", F.row_number().over(wsrc))
        .withColumn("schedule_key", F.col("rk") / F.col("weight"))
        .filter(F.col("schedule_key") <= 60.0 / min_weight / 3)
    )
    wglob = Window.partitionBy(F.lit(0)).orderBy("schedule_key", "source", "doc_id")
    return keyed.select(
        "doc_id", "source",
        F.row_number().over(wglob).cast("bigint").alias("train_pos"),
    )
