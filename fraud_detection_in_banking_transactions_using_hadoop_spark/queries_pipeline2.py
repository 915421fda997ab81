"""Training-data pipeline batch 2: the corpus-hygiene operators a
100 TB pretraining build runs between raw ingest and the trainer --
PII redaction, line-level (cross-document substring) dedup, RAG
chunking, an inverted index for retrieval, modern selective/ordered
aggregates, and SemDeDup-style bucketed semantic pruning.

Scale notes (the 1000-executor story, per operator):
- PII redaction is pure map-side regex (JVM codegen, no shuffle).
- Line dedup shuffles once on the line hash -- the RefinedWeb/CCNet
  "duplicated-line fraction" signal without materializing a suffix
  array; the window over `line` shares the single exchange.
- Chunking is map-side explode: output rows ~ tokens/stride, no
  shuffle at all, so it streams at scan speed.
- The inverted index is the classic two-level aggregate: (term,doc)
  partial combine first, then term -- both map-side combinable, and
  posting lists are capped (top-15 by doc_id) so no term's state
  exceeds a constant.
- Semantic prune joins ONLY within hyperplane sign-buckets (equi-join
  on a small-int key) -- the scale path for embedding near-dup where
  the all-pairs `embedding_dup_pairs` baseline is O(n^2).

Cross-engine parity (CLAUDE.md): counts cast BIGINT both sides;
DuckDB regexp_replace needs the 'g' flag; ratios are k/n of small
ints (identical doubles both engines, no half-boundary denominators);
window/order determinism via unique keys; regex metacharacters kept
out of f-strings so braces survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table, spread


# ---------------------------------------------------------------------------
# PII detection + redaction (map-side regex battery).
# The corpus tables carry no real PII, so the query synthesizes
# deterministic PII-shaped spans (phone/email/IPv4 formatted from the
# event keys) into the text first -- fixture generation in-query, the
# same trick the split/sample queries use for hash determinism -- then
# runs the actual operator: per-class regexp_count + ordered
# regexp_replace redaction (email before IP before phone so the email
# domain can't be double-counted).
# ---------------------------------------------------------------------------
_RE_PHONE = r"\d{3}-\d{3}-\d{4}"
_RE_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_FIXTURE_SQL = """
      SELECT event_type,
             'ref ' || props
             || CASE WHEN event_id % 3 = 0
                     THEN ' call ' || printf('555-%03d-%04d', user_id % 1000, event_id % 10000)
                     ELSE '' END
             || CASE WHEN event_id % 5 = 0
                     THEN ' mail u' || user_id || '@mail' || (event_id % 10) || '.org'
                     ELSE '' END
             || CASE WHEN event_id % 7 = 0
                     THEN ' from 10.' || (user_id % 250) || '.' || (event_id % 250) || '.7'
                     ELSE '' END AS text
      FROM events
"""


@register(
    "pii_redaction",
    """
    WITH t AS ("""
    + _PII_FIXTURE_SQL
    + """),
    r AS (
      SELECT event_type, text,
             len(regexp_extract_all(text, '"""
    + _RE_PHONE
    + """')) AS n_phone,
             len(regexp_extract_all(text, '"""
    + _RE_EMAIL
    + """')) AS n_email,
             len(regexp_extract_all(text, '"""
    + _RE_IP
    + """')) AS n_ip,
             regexp_replace(regexp_replace(regexp_replace(text,
               '"""
    + _RE_EMAIL
    + """', '[EMAIL]', 'g'),
               '"""
    + _RE_IP
    + """', '[IP]', 'g'),
               '"""
    + _RE_PHONE
    + """', '[PHONE]', 'g') AS redacted
      FROM t)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_phone) AS BIGINT) AS phones,
           CAST(sum(n_email) AS BIGINT) AS emails,
           CAST(sum(n_ip) AS BIGINT) AS ips,
           CAST(sum(length(text) - length(redacted)) AS BIGINT) AS chars_removed
    FROM r GROUP BY event_type
    """,
    tags=("pipeline", "pii"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and redact phone/email/IPv4 spans.
    Plan: one scan, whole-stage-codegen regex expressions, a 5-group
    final aggregate -- zero shuffles beyond the combine. At 100 TB this
    is scan-bound, exactly what a redaction pass should be."""
    ev = read_table(spark, sf_dir, "events")
    text = F.concat(
        F.lit("ref "),
        F.col("props"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit(" call "),
                F.format_string("555-%03d-%04d", F.col("user_id") % 1000, F.col("event_id") % 10000),
            ),
        ).otherwise(""),
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(
                F.lit(" mail u"),
                F.col("user_id").cast("string"),
                F.lit("@mail"),
                (F.col("event_id") % 10).cast("string"),
                F.lit(".org"),
            ),
        ).otherwise(""),
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("user_id") % 250).cast("string"),
                F.lit("."),
                (F.col("event_id") % 250).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(""),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _RE_EMAIL, "[EMAIL]"),
            _RE_IP,
            "[IP]",
        ),
        _RE_PHONE,
        "[PHONE]",
    )
    return (
        ev.select(
            "event_type",
            text.alias("text"),
            F.regexp_count(text, F.lit(_RE_PHONE)).alias("n_phone"),
            F.regexp_count(text, F.lit(_RE_EMAIL)).alias("n_email"),
            F.regexp_count(text, F.lit(_RE_IP)).alias("n_ip"),
            redacted.alias("redacted"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("n_phone").cast("bigint").alias("phones"),
            F.sum("n_email").cast("bigint").alias("emails"),
            F.sum("n_ip").cast("bigint").alias("ips"),
            F.sum(F.length("text") - F.length("redacted")).cast("bigint").alias("chars_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Line-level dedup signal (RefinedWeb / CCNet): fraction of each doc
# made of "lines" (fixed 10-token windows -- the corpus has no newlines)
# that recur elsewhere in the corpus.
# ---------------------------------------------------------------------------
@register(
    "line_dedup",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    l AS (
      SELECT doc_id,
             array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ') AS line
      FROM t, (SELECT unnest(range(0, 300)) AS i) idx
      WHERE i <= (len(toks) - 1) // 10),
    f AS (SELECT doc_id, count(*) OVER (PARTITION BY line) AS freq FROM l)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count_if(freq > 1) AS BIGINT) AS dup_lines,
           round(count_if(freq > 1) * 1.0 / count(*), 6) AS dup_ratio
    FROM f GROUP BY doc_id
    """,
    tags=("pipeline", "dedup"),
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-line fraction per document. Plan: tokenize once,
    explode ~n_tok/10 line rows, ONE exchange on hash(line) shared by
    the frequency window, then re-aggregate by doc_id. No suffix array,
    no self-join -- the shuffle key is the line text itself, and a
    line's postings never exceed its corpus frequency. The follow-up
    rewrite step (drop lines with freq>K) filters on the same window
    column for free."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lines = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), ((F.size("toks") - 1) / 10).cast("int"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.array_join(F.slice("toks", F.col("i") * 10 + 1, 10), " ").alias("line"),
        )
    )
    freq = lines.select(
        "doc_id", F.count("*").over(Window.partitionBy("line")).alias("freq")
    )
    dup = F.count_if(F.col("freq") > 1)
    return freq.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        dup.cast("bigint").alias("dup_lines"),
        F.round(dup * 1.0 / F.count("*"), 6).alias("dup_ratio"),
    )


# ---------------------------------------------------------------------------
# RAG chunking: overlapping fixed-size token windows (32-token window,
# 24-token stride), the retrieval-corpus prep step.
# ---------------------------------------------------------------------------
@register(
    "chunk_overlap",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(least(32, len(toks) - i * 24) AS BIGINT) AS chunk_tokens,
           array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text
    FROM t, (SELECT unnest(range(0, 300)) AS i) idx
    WHERE i <= (len(toks) - 1) // 24
    """,
    tags=("pipeline", "chunking"),
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk explode for retrieval indexing. Pure map-side:
    tokenize, explode chunk indices, slice -- no shuffle anywhere, so
    it runs at scan speed on any corpus size; downstream embedding of
    the chunks is where the budget goes, not here."""
    docs = read_table(spark, sf_dir, "documents")
    out = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), ((F.size("toks") - 1) / 24).cast("int"))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("chunk_idx"),
            F.least(F.lit(32), F.size("toks") - F.col("i") * 24)
            .cast("bigint")
            .alias("chunk_tokens"),
            F.array_join(F.slice("toks", F.col("i") * 24 + 1, 32), " ").alias("chunk_text"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Modern selective/ordered aggregates: count_if, bool_and/bool_or,
# interpolated median, and deterministic arg-extrema (max_by/min_by on
# the unique order key).
# ---------------------------------------------------------------------------
@register(
    "misc_aggs",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS big_orders,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           round(median(o_totalprice), 6) AS med_price,
           CAST(arg_max(o_custkey, o_orderkey) AS BIGINT) AS last_cust,
           CAST(arg_min(o_custkey, o_orderkey) AS BIGINT) AS first_cust
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "modern"),
)
def q_misc_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-aggregate surface. max_by/min_by keyed on the UNIQUE
    o_orderkey (arg extrema on non-unique keys are nondeterministic --
    same discipline as window tiebreakers). All are single-pass
    map-side-combinable aggregates; median is the only full-sort state
    and Spark runs it as a typed imperative aggregate per group."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_if(F.col("o_totalprice") > 150000).cast("bigint").alias("big_orders"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.round(F.median("o_totalprice"), 6).alias("med_price"),
        F.max_by("o_custkey", "o_orderkey").cast("bigint").alias("last_cust"),
        F.min_by("o_custkey", "o_orderkey").cast("bigint").alias("first_cust"),
    )


# ---------------------------------------------------------------------------
# Inverted index build: term -> document frequency, total term
# frequency, and a capped sorted posting list (the retrieval sibling of
# bm25_hybrid_search, materializing the index instead of scoring).
# ---------------------------------------------------------------------------
@register(
    "inverted_index",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT term, doc_id, count(*) AS tf FROM tok
      WHERE term <> '' GROUP BY term, doc_id)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string(
             list_transform(list_slice(list_sort(list(doc_id)), 1, 15),
                            x -> CAST(x AS VARCHAR)), ',') AS postings_head
    FROM tf GROUP BY term
    """,
    tags=("retrieval", "index"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build as a two-level aggregate: (term, doc) tf with
    map-side combine, then per-term df/tf plus a top-15-by-doc_id
    posting head (sort_array fixes collect_list's nondeterministic
    arrival order; the slice caps per-term state at a constant, so a
    stop-word term can't blow up an executor)."""
    docs = read_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.expr(
            "array_join(transform(slice(array_sort(collect_list(doc_id)), 1, 15),"
            " x -> cast(x as string)), ',')"
        ).alias("postings_head"),
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic prune: within hyperplane sign-buckets, prune
# every vector that has a sufficiently-similar lower-id neighbor,
# reporting its canonical representative. The bucketed scale path for
# what embedding_dup_pairs does all-pairs.
# ---------------------------------------------------------------------------
def _semantic_prune_sql(n_planes: int = 6, dim: int = 64, tau: float = 0.3) -> str:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import _hyperplane

    planes = [_hyperplane(dim, p) for p in range(n_planes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {planes[p]!r}::DOUBLE[]) >= 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"""
    WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    base AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv,
             {bucket_terms} AS bucket
      FROM raw),
    p AS (
      SELECT * FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.nv, b.nv) AS cos
        FROM base a JOIN base b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      WHERE cos >= {tau})
    SELECT id_b AS vec_id,
           CAST(min(id_a) AS BIGINT) AS canonical_id,
           round(arg_min(cos, id_a), 6) AS cosine
    FROM p GROUP BY id_b
    """


@register("semantic_dedup_prune", _semantic_prune_sql(), tags=("similarity", "dedup"))
def q_semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup core move: cheap partition (6-bit sign bucket standing
    in for the k-means cell), then near-dup prune only WITHIN the
    partition -- an equi-join on a small-int key instead of the O(n^2)
    cross join, and AQE splits any hot bucket. Canonical = the minimum
    qualifying lower id, so the survivor set is deterministic and
    cluster-size independent. Recall loss vs the all-pairs baseline is
    part of the checked contract (same literal planes in the oracle)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        dot_unrolled,
        signature_bucket,
    )

    emb = spread(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # Normalize ONCE per row (norm as its own column so it isn't
    # re-evaluated per element); pairs then cost ONE dot product
    # instead of three. The per-pair dot is dot_unrolled -- a
    # codegen'd 64-term chain, value-identical to the interpreted
    # fold, so the oracle's normalize-then-dot arithmetic still
    # matches bit-for-bit.
    base = (
        emb.withColumn("norm", F.sqrt(dot_unrolled("v", "v")))
        .select(
            "vec_id",
            F.transform("v", lambda x: x / F.col("norm")).alias("nv"),
            signature_bucket("v", 64, 6).alias("bucket"),
        )
    )
    # base feeds BOTH sides of the self-join and its lineage is the
    # expensive part (normalize fold + 6 interpreted plane dots per
    # row); without a cut Spark recomputes it twice -- the CLAUDE.md
    # LSH-self-join gotcha. Same persist/checkpoint/unpersist contract
    # as lsh_candidate_pairs: persist base, materialize the (small)
    # result via eager localCheckpoint, release the blocks. The query
    # is therefore EAGER in the plan-quality gate.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    a = base.alias("a")
    b = base.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            dot_unrolled("a.nv", "b.nv").alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )
    out = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").cast("bigint").alias("canonical_id"),
        F.round(F.min_by("cos", "id_a"), 6).alias("cosine"),
    ).localCheckpoint(eager=True)
    base.unpersist()
    return out
