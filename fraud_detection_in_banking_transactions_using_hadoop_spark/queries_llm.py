"""LLM-training-data pipeline queries (driver `documents` / `embeddings`
tables): dedup, similarity search, text analysis. Registered into the same
registry as the relational queries.

Scale design notes (each query's docstring says how it survives 100 TB):
hashes are md5-hex prefixes so both engines order them identically;
everything is expression-only (no Python UDFs) except where noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import _FMT_D, _FMT_S, register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy (the 100 TB-safe baseline: one shuffle on the
# content hash; at scale partition count scales with input, no driver state)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
           count(*) AS n_copies, CAST(min(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.min("n_chars").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Canonical-form fingerprint dedup: normalize whitespace/case, then hash.
# ---------------------------------------------------------------------------


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    tags=("dedup", "text"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Text quality scoring: token counts, distinct ratio, stopword ratio.
# Pure column expressions (split/size/filter) -> codegen, no UDF.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "data", "row", "table")
_STOP_SQL = "('" + "', '".join(_STOPWORDS) + "')"


@register(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks, length(text) AS n_char
      FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio,
           round(CAST(len(list_filter(toks, t -> t IN {_STOP_SQL})) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           round(CAST(n_char AS DOUBLE) / len(toks), 6) AS avg_token_span
    FROM t
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.select(
        "doc_id", "lang", toks.alias("toks"), F.length("text").alias("n_char")
    )
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    n_stop = F.size(F.filter("toks", lambda t: t.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct"),
        F.round(n_distinct.cast("double") / n_tokens, 6).alias("distinct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.col("n_char").cast("double") / n_tokens, 6).alias("avg_token_span"),
    )


# ---------------------------------------------------------------------------
# Language ID heuristic: stopword-marker hit counting + argmax CASE.
# (The driver documents carry a lang column; the heuristic demonstrates the
# operator -- deterministic, identical in both engines.)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "a", "fast"),
    "es": ("data", "row"),
    "zh": ("table", "join"),
}


@register(
    "lang_id",
    f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    h AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> x IN ('the', 'a', 'fast'))) AS h_en,
             len(list_filter(toks, x -> x IN ('data', 'row'))) AS h_es,
             len(list_filter(toks, x -> x IN ('table', 'join'))) AS h_zh
      FROM t)
    SELECT doc_id, lang,
           CASE WHEN h_en >= h_es AND h_en >= h_zh THEN 'en'
                WHEN h_es >= h_zh THEN 'es' ELSE 'zh' END AS predicted_lang,
           CAST(h_en AS BIGINT) AS h_en, CAST(h_es AS BIGINT) AS h_es,
           CAST(h_zh AS BIGINT) AS h_zh
    FROM h
    """,
    tags=("text",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def marker_hits(markers):
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    hits = {lang: marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    predicted = (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["zh"]), "en")
        .when(hits["es"] >= hits["zh"], "es")
        .otherwise("zh")
    )
    return docs.select(
        "doc_id",
        "lang",
        predicted.alias("predicted_lang"),
        hits["en"].cast("long").alias("h_en"),
        hits["es"].cast("long").alias("h_es"),
        hits["zh"].cast("long").alias("h_zh"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs.
#
# Hash family: h_i(token) = the (i%2)-th 16-hex half of
# md5((i//2) || ':' || token), compared lexicographically -- a total order
# both engines share bit-for-bit, so the whole pipeline is
# oracle-checkable (rare for MinHash implementations), at ceil(n/2) md5
# evaluations per token (two 64-bit hashes per digest).
#
# Scale path (100 TB): tokens explode (|doc| x 16 rows) -> groupBy (doc, i)
# min -> groupBy (doc, band) -> self-join on (band_id, band_hash). Every
# stage is a hash shuffle on a high-cardinality key; the band join's
# fan-out is bounded by bucket size, and band buckets >> executors spread
# evenly. No driver-side state, no pairwise O(n^2) anywhere.
# ---------------------------------------------------------------------------

_N_HASHES = 16
_BAND_SIZE = 4
# Hot-bucket guard: the synthetic corpus has a 31-word vocabulary, so
# unigram LSH buckets are degenerate (the bucket's pair yield is quadratic
# and all noise). Both engines drop buckets over the cap identically, so
# the query stays oracle-exact WITH the guard on.
_MAX_BUCKET = 64


@register(
    "minhash_lsh_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents),
    hashed AS (
      SELECT doc_id, i.i, min(substr(md5((i.i // 2) || ':' || tok), 1 + 16 * (i.i % 2), 16)) AS h
      FROM toks CROSS JOIN (SELECT unnest(range({_N_HASHES})) AS i) i
      GROUP BY doc_id, i.i),
    bands AS (
      SELECT doc_id, CAST(i // {_BAND_SIZE} AS INTEGER) AS band_id,
             md5(string_agg(h, '|' ORDER BY i)) AS band_hash
      FROM hashed GROUP BY doc_id, CAST(i // {_BAND_SIZE} AS INTEGER)),
    capped AS (
      SELECT doc_id, band_id, band_hash FROM (
        SELECT doc_id, band_id, band_hash,
               count(*) OVER (PARTITION BY band_id, band_hash) AS bsz
        FROM bands)
      WHERE bsz <= {_MAX_BUCKET}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b FROM pairs
    """,
    tags=("dedup", "minhash", "lsh"),
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=_N_HASHES)
    return lsh_candidate_pairs(
        sigs, "doc_id", n_hashes=_N_HASHES, band_size=_BAND_SIZE,
        max_bucket_size=_MAX_BUCKET,
    )


# ---------------------------------------------------------------------------
# N-gram (token-set) Jaccard similarity for LSH candidates' verification.
# Blocked by source to bound the pair space (blocking = the scale lever).
# ---------------------------------------------------------------------------


@register(
    "jaccard_pairs",
    """
    WITH toks AS (
      SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM toks a JOIN toks b
        ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    j AS (
      SELECT doc_a, doc_b,
             round(CAST(n_common AS DOUBLE) /
                   (sa.n + sb.n - n_common), 6) AS jaccard
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
    """,
    tags=("dedup", "jaccard"),
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
        # consumed 3x (both self-join sides + sizes): pin once (r13)
    ).localCheckpoint(eager=True)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= 0.8)


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (the correctness baseline;
# the LSH-bucketed scale path lives in operators/similarity.py).
# Dot products fold left-to-right in DOUBLE in both engines -> bit-stable.
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sims AS (
      SELECT q.vec_id AS query_id, base.vec_id AS neighbor_id,
             round(list_dot_product(q.v, base.v) /
                   (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(base.v, base.v))),
                   6) AS cosine
      FROM q, base WHERE q.vec_id <> base.vec_id),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
      FROM sims)
    SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= 5
    """,
    tags=("similarity", "ann"),
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
        )

    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v")))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint: ORDER-SENSITIVE document identity (the
# set-based tiers -- md5 fingerprint, MinHash -- can't tell "a b c"
# from "c b a"; the polynomial rolling hash can).
# ---------------------------------------------------------------------------
@register(
    "rolling_hash_fingerprint",
    """
    WITH h AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                   t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
               (acc, x) -> (acc * 31 + x) % 1000000000000000) AS rhash
      FROM documents)
    SELECT doc_id, CAST(rhash AS BIGINT) AS rhash FROM h
    """,
    tags=("dedup", "fingerprint", "rolling-hash"),
)
def q_rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the token sequence:
    h = fold(acc*31 + md5_32(tok) mod 1e15). Order-sensitive dedup
    identity, computed as a pure map-side expression fold (left-to-right
    in BOTH engines, modulus keeps every intermediate < 3.2e16 so int64
    arithmetic is exact under ANSI mode). At 100 TB this replaces md5 of
    the full text when the text column is wide and only identity -- not
    content -- needs to move: the hash is 8 bytes per doc."""
    docs = read_table(spark, sf_dir, "documents")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    rhash = F.aggregate(
        F.split("text", " "),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + tok_hash(t)) % F.lit(1000000000000000).cast("bigint"),
    )
    return docs.select("doc_id", rhash.cast("bigint").alias("rhash"))
