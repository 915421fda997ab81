"""Deduplication operators for large-scale text pipelines.

Four tiers, in increasing fuzziness (all DataFrame-native, no Python UDFs):

  exact_dedup          -- content-hash groupBy (the 100 TB baseline)
  fingerprint          -- normalize-then-hash (whitespace/case-insensitive)
  minhash_lsh_pairs    -- MinHash signatures + LSH banding candidate pairs
  ngram_jaccard_pairs  -- exact token-set Jaccard over blocked pairs
  simhash64            -- 64-bit SimHash fingerprint per document

Hash family note: h_i(token) = the (i%2)-th 16-hex half of
md5((i//2) || ':' || token), compared LEXICOGRAPHICALLY. Fixed-width hex
strings give a total order any engine reproduces bit-for-bit, which
makes MinHash -- normally a "trust me" operator -- oracle-checkable
against plain SQL; packing two 64-bit hashes per digest halves the md5
work (see _token_hash_array).
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
    """Array of n per-token hashes [h_0(tok) .. h_{n-1}(tok)].

    Each md5 digest (32 hex chars) yields TWO independent 64-bit hashes
    (its 16-hex halves): h_{2j} / h_{2j+1} both come from md5(j':'tok),
    so a corpus pays ceil(n/2) md5 evaluations per token instead of n --
    md5 is the dominant signature cost at 100 TB and Spark's
    subexpression elimination computes each digest once per projection.
    Fixed-width hex halves keep the lexicographic total order that makes
    MinHash oracle-checkable (module docstring)."""
    digests = [
        F.md5(F.concat_ws(":", F.lit(j), tok)) for j in range((n_hashes + 1) // 2)
    ]
    return F.array(
        *[
            F.substring(digests[i // 2], 1 + 16 * (i % 2), 16)
            for i in range(n_hashes)
        ]
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


def shingle_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 3,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, tok) rows of word w-shingles -- the codegen-friendly form.

    The array form (shingles()) is built from higher-order functions,
    which are CodegenFallback in Spark: every element goes through
    interpreted lambda eval (measured ~5x slower per token locally).
    Here: posexplode the token array while CARRYING the array column, so
    each shingle is `concat_ws(tok, try_element_at(arr, pos+j)...)` --
    plain codegen'd expressions, zero shuffles (a window-lead variant
    costs a full (id, pos) shuffle-sort and measured ~7x slower). The
    carried array is referenced per output row but streams through
    whole-stage codegen; nothing is materialized per row. Docs shorter
    than w yield their whole token string as the single shingle
    (concat_ws skips NULL out-of-range lookups), matching shingles().

    Duplicate shingles are NOT deduped: min-agg consumers (MinHash) are
    insensitive to multiplicity; dedupe downstream if set semantics are
    needed.

    `carry` names extra columns to keep on every output row (cheaper
    than re-joining them back on id_col afterwards -- the explode is
    map-side either way, a join is a shuffle).
    """
    toks = F.split(F.col(text_col), " ")
    t = df.select(
        F.col(id_col), *carry, toks.alias("_tk"), F.size(toks).alias("_n")
    ).select(id_col, *carry, "_tk", "_n", F.posexplode("_tk").alias("_p", "_tok"))
    # _p is 0-based; try_element_at is 1-based, so token _p+j sits at
    # index _p + 1 + j
    sh = F.concat_ws(
        " ",
        F.col("_tok"),
        *[F.try_element_at("_tk", F.col("_p") + 1 + j) for j in range(1, w)],
    )
    return (
        t.withColumn("tok", sh)
        .filter(F.col("_p") <= F.greatest(F.col("_n") - w, F.lit(0)))
        .select(id_col, *carry, "tok")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_w: int = 1,
    vocab_broadcast: bool | None = None,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over tokens of h_i(tok).

    Two plan shapes, picked by vocabulary size (auto: unigrams -> vocab
    join, shingles -> direct):

    vocab_broadcast=True -- distinct tokens -> per-VOCAB-TOKEN hash array
      (computed once per distinct token) -> explode doc tokens ->
      broadcast join the vocab hash table -> ONE groupBy(doc) with
      n_hashes min() aggs. md5 work proportional to |vocabulary|, not
      |corpus|: the right plan when vocabulary << corpus (natural-language
      unigrams). Costs an extra pass over the explode to build the vocab.

    vocab_broadcast=False -- hash each exploded unit directly, no vocab
      table. md5 work proportional to corpus, but single-pass and no
      broadcast: the right plan for w-shingles, whose vocabulary grows
      toward corpus size (a broadcast that big would stop fitting anyway).

    Either way the single shuffle key is doc id (even) and partial
    aggregation collapses each partition to one row per doc before the
    exchange. Returns (id_col, h0 .. h{n-1}).
    """
    if vocab_broadcast is None:
        vocab_broadcast = shingle_w <= 1
    if shingle_w <= 1:
        toks = df.select(
            F.col(id_col), F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok")
        )
    else:
        toks = shingle_rows(df, id_col, text_col, shingle_w)
    if vocab_broadcast:
        vocab = toks.select("tok").distinct().select(
            "tok", _token_hash_array(F.col("tok"), n_hashes).alias("harr")
        )
        joined = toks.join(F.broadcast(vocab), "tok")
    else:
        joined = toks.withColumn("harr", _token_hash_array(F.col("tok"), n_hashes))
    return joined.groupBy(id_col).agg(
        *[F.min(F.col("harr")[i]).alias(f"h{i}") for i in range(n_hashes)]
    )


def band_table(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH band rows (id, band_id, band_hash) from a minhash signature
    table: band_hash = md5 of the band's '|'-joined signature slice.
    Pure per-row projection (no shuffle) -- the shared building block
    of the batch self-join (lsh_candidate_pairs) and the streaming fold
    (streaming_minhash_replay), whose folded band table is row-identical
    to the batch one because each doc's signature is computed whole
    within its arrival micro-batch."""
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{i}") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("|", *cols)).alias("band_hash"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")


def pairs_from_bands(banded: DataFrame, id_col: str) -> DataFrame:
    """Candidate pairs (id_a < id_b) from a band table: the equi-self-
    join on (band_id, band_hash). Shared by the one-shot pipeline
    (lsh_candidate_pairs) and the incremental path, whose delta join
    reuses it against a persisted band table."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def lsh_band_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_w: int = 3,
) -> DataFrame:
    """The persistable LSH dedup state of one snapshot: its band table
    (id, band_id, band_hash). Signatures depend only on each document's
    own text, so band rows NEVER need recomputation when later
    snapshots arrive -- write this table once per snapshot and the
    incremental path (incremental_lsh_merge) joins new docs' bands
    against it. At 100 TB this is the difference between re-hashing the
    whole corpus per ingest batch and hashing only the delta."""
    sigs = minhash_signatures(
        df, id_col, text_col, n_hashes=n_hashes, shingle_w=shingle_w
    )
    return band_table(sigs, id_col, n_hashes=n_hashes, band_size=band_size)


def incremental_lsh_merge(
    state_bands: DataFrame,
    state_clusters: DataFrame,
    delta_bands: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold a delta snapshot into persisted dedup state: returns the
    updated (node, cluster) assignment over old + new docs, EXACTLY
    equal to a full recompute (oracled as such).

    The delta work is bounded by the delta: new candidate edges =
    delta-bands x (state-bands UNION delta-bands) equi-join -- old x old
    pairs are never re-derived (per-doc signatures are snapshot-
    independent, so the old pair set cannot change; NOTE this exactness
    argument requires the band pipeline to run WITHOUT a bucket-size
    cap, since caps depend on bucket population, which grows) -- and the
    connected-components input is the old SPANNING FOREST (one
    (cluster, node) edge per non-root old doc, O(n) rows) plus only the
    delta edges, not the full old edge set. A new doc bridging two old
    clusters merges them through the forest exactly as it would through
    the full graph."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import (
        connected_components,
    )

    d = delta_bands.alias("a")
    s = state_bands.unionByName(delta_bands).alias("b")
    delta_edges = (
        d.join(
            s,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                "doc_b"
            ),
        )
        .distinct()
    )
    forest = state_clusters.where(F.col("node") != F.col("cluster")).select(
        F.col("cluster").alias("doc_a"), F.col("node").alias("doc_b")
    )
    return connected_components(forest.unionByName(delta_edges))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 16,
    band_size: int = 4,
    max_bucket_size: int | None = None,
    eager: bool = True,
) -> DataFrame:
    """LSH banding over minhash signatures: docs sharing any band bucket
    become a candidate pair (doc_a < doc_b).

    Scale: the band table is (doc, band_id, band_hash); the self-join hits
    only equal (band_id, band_hash) buckets, so fan-out is bounded by
    bucket population -- the standard LSH guarantee. That guarantee fails
    on degenerate corpora (boilerplate/empty docs, tiny vocabularies)
    where one hot bucket degrades toward all-pairs: `max_bucket_size`
    drops buckets over the cap BEFORE the self-join (candidate count from
    a bucket is quadratic, so an over-cap bucket contributes noise, not
    recall -- near-identical docs still meet in their other, smaller
    bands). The documented tradeoff: pairs whose ONLY shared bucket is
    over-cap are missed.

    With eager=True (default) the pair table is materialized via
    localCheckpoint before returning and the intermediate cache is
    released -- the band table feeds both sides of the self-join, and
    without persistence the whole signature pipeline computes twice;
    without the unpersist, repeated calls leak cached blocks. Pass
    eager=False to keep the frame lazy (caller owns the double-compute).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    banded = band_table(signatures, id_col, n_hashes=n_hashes, band_size=band_size)
    if max_bucket_size is not None:
        # window count shares the (band_id, band_hash) shuffle the
        # self-join needs anyway -- the guard costs no extra exchange
        w = Window.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    if eager:
        # the band table feeds both sides of the self-join; persist so the
        # signature pipeline doesn't compute twice, release after the
        # checkpoint below. With eager=False we deliberately skip the
        # persist: a cached frame with no handle returned to the caller
        # would leak blocks for the session lifetime.
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = pairs_from_bands(banded, id_col)
    if eager:
        pairs = pairs.localCheckpoint(eager=True)
        banded.unpersist()
    return pairs


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


def simhash64(df: DataFrame, id_col: str, text_col: str, n_bits: int = 60) -> DataFrame:
    """SimHash per document: sum +/-1 per bit over token hashes, take the
    sign. Near-dup docs differ in few bits (compare via hamming distance
    downstream). Width is 60 bits, not 64: the token hash is the first 15
    hex chars of md5 (conv() maps hex to BIGINT JVM-side), which keeps the
    value positive within a signed 64-bit integer.

    Plan shape: ONE row per (doc, distinct token). The per-bit +/-1
    contributions are `n_bits` sum() aggregates over bit-tests of the
    token hash -- all codegen'd, with map-side partial aggregation
    collapsing each partition to one row per doc BEFORE the exchange. The
    shuffle carries |docs| x (60 ints), vs the previous explode form that
    shuffled 60 rows per token (a 60x volume multiplier on 100 TB of
    text).

    Returns (id_col, simhash BIGINT).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok")
    )
    toks = toks.withColumn(
        "th", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    )
    per_bit_sums = [
        F.sum(F.when(F.expr(f"(th >> {b}) & 1") == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(n_bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*per_bit_sums)
    simhash = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        simhash = term if simhash is None else simhash + term
    return per_doc.select(id_col, simhash.cast("bigint").alias("simhash"))
