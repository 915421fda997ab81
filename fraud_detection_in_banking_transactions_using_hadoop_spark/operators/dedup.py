"""Deduplication operators for large-scale text pipelines.

Four tiers, in increasing fuzziness (all DataFrame-native, no Python UDFs):

  exact_dedup          -- content-hash groupBy (the 100 TB baseline)
  fingerprint          -- normalize-then-hash (whitespace/case-insensitive)
  minhash_lsh_pairs    -- MinHash signatures + LSH banding candidate pairs
  ngram_jaccard_pairs  -- exact token-set Jaccard over blocked pairs
  simhash64            -- 64-bit SimHash fingerprint per document

Hash family note: h_i(token) = substr(md5(i || ':' || token), 1, 16)
compared LEXICOGRAPHICALLY. Fixed-width hex strings give a total order any
engine reproduces bit-for-bit, which makes MinHash -- normally a
"trust me" operator -- oracle-checkable against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical content by md5; keep the smallest id as canonical.

    Scale: one hash shuffle on the digest (high-cardinality, even); the
    digest is computed map-side so full text never shuffles twice.
    """
    return df.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: trim, collapse whitespace, lower."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(id_col, F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))


def _token_hash_array(tok: Column, n_hashes: int) -> Column:
    """Array of n per-token hashes [h_0(tok) .. h_{n-1}(tok)]."""
    return F.array(
        *[F.substring(F.md5(F.concat_ws(":", F.lit(i), tok)), 1, 16) for i in range(n_hashes)]
    )


def shingles(text: Column, w: int = 3) -> Column:
    """Word w-shingles as an array column: overlapping windows of w
    consecutive tokens. Pure expression (transform over a sequence of
    offsets), so it runs JVM-side; docs shorter than w yield their whole
    token string as the single shingle."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    # try_element_at: docs shorter than w index past the end -- NULL there
    # (concat_ws skips it) instead of an ANSI-mode error.
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(w)]
        ),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, shingle_w: int = 1
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over tokens of h_i(tok).

    Plan shape (chosen over the naive tokens x n_hashes explode):
      distinct tokens -> per-VOCAB-TOKEN hash array (tiny, computed once per
      distinct token in the batch) -> explode doc tokens -> broadcast join
      the vocab hash table -> ONE groupBy(doc) with n_hashes min() aggs.
    The doc-token rows carry only (id, 16 short strings); the md5 work is
    proportional to |vocabulary|, not |corpus|. At 100 TB the single
    shuffle key is doc id (even) and partial aggregation collapses each
    partition to one row per doc before the exchange.

    shingle_w > 1 hashes overlapping word w-shingles instead of unigrams
    (the standard near-dup unit). Note the shingle vocabulary grows toward
    corpus size -- if the distinct-shingle table stops fitting broadcast,
    drop the vocab join and hash shingles directly in the explode.

    Returns (id_col, h0 .. h{n-1}).
    """
    units = (
        F.array_distinct(F.split(text_col, " "))
        if shingle_w <= 1
        else F.array_distinct(shingles(F.col(text_col), shingle_w))
    )
    toks = df.select(F.col(id_col), F.explode(units).alias("tok"))
    vocab = toks.select("tok").distinct().select(
        "tok", _token_hash_array(F.col("tok"), n_hashes).alias("harr")
    )
    joined = toks.join(F.broadcast(vocab), "tok")
    return joined.groupBy(id_col).agg(
        *[F.min(F.col("harr")[i]).alias(f"h{i}") for i in range(n_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """LSH banding over minhash signatures: docs sharing any band bucket
    become a candidate pair (doc_a < doc_b).

    Scale: the band table is (doc, band_id, band_hash); the self-join hits
    only equal (band_id, band_hash) buckets, so fan-out is bounded by
    bucket population -- the standard LSH guarantee. Skewed buckets (e.g.
    empty docs) can be salted or length-blocked upstream.
    """
    # The banded table feeds BOTH sides of the self-join; the broadcast
    # side cannot reuse the streamed side's exchange (different exchange
    # types), so without persistence the whole signature pipeline computes
    # twice. MEMORY_AND_DISK keeps the fix safe when signatures outgrow
    # executor memory.
    from pyspark import StorageLevel

    signatures = signatures.persist(StorageLevel.MEMORY_AND_DISK)

    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")

    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard for pairs sharing a blocking key.

    Blocking is the scale lever: the token self-join only pairs documents
    inside one block, so cost is sum over blocks of |block|^2, not n^2.
    Use LSH candidates (lsh_candidate_pairs) as the block at extreme scale.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok"),
    )
    sizes = toks.groupBy("_id").agg(F.count("*").alias("n"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    return (
        common.join(sa, F.col("doc_a") == F.col("sa._id"))
        .join(sb, F.col("doc_b") == F.col("sb._id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: sum +/-1 per bit over token hashes,
    take the sign. Near-dup docs differ in few bits (compare via hamming
    distance downstream).

    Bits come from the first 16 hex chars of md5(token) -- conv() maps hex
    to a 64-bit integer JVM-side. The per-bit +/- counting explodes each
    token into 64 (token, bit) rows; at scale prefer the grouped
    aggregation form below which keeps it to one row per token with an
    array accumulator.

    Returns (id_col, simhash BIGINT, n_tokens).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok")
    )
    # 64-bit value from md5 hex; conv returns string -> cast. First 15 hex
    # chars (60 bits) keep it positive within BIGINT; bits 0..59.
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    toks = toks.withColumn("th", h)
    bit = F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit")
    bits = toks.select(id_col, "th", bit).withColumn(
        "contrib", F.when(F.expr("(th >> bit) & 1") == 1, 1).otherwise(-1)
    )
    per_bit = bits.groupBy(id_col, "bit").agg(F.sum("contrib").alias("s"))
    return (
        per_bit.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").cast("bigint").alias("simhash"))
    )
