"""Extension batch 234 (round 11): transport encoding + error
correction -- the storage/transport integrity tier next to ext226's
CRC-32.

- multimodal_base64: the 13th REAL codec. Spark runs its JVM RFC 4648
  implementation (base64/unbase64 over BINARY -- zero Python, the
  decode roundtrip asserted IN-PLAN via md5 equality); the DuckDB
  oracle re-derives the encoding from scratch by 6-bit repacking
  (3 bytes -> one 24-bit word -> 4 alphabet lookups, '=' padding from
  n mod 3) and the two encodings must md5-agree per media. Media
  lengths are varied 54..60 bytes so all three padding classes
  (0/1/2 '=') are exercised.

- hamming74_ecc: Hamming(7,4) single-error correction run in-engine as
  pure BIGINT bit algebra. Each media's 60 bytes split into 120
  nibbles; each nibble encodes to the 7-bit codeword
  [p1 p2 d0 p3 d1 d2 d3] (p1 = d0^d1^d3, p2 = d0^d2^d3,
  p3 = d1^d2^d3); a deterministic md5-derived single-bit error is
  injected per codeword; the decoder recomputes the syndrome
  s = s1 + 2 s2 + 4 s3, which equals the 1-based flipped position, and
  corrects. The two engines derive parity DIFFERENTLY -- Spark
  composes the generator-matrix bits explicitly, the oracle reads
  each syndrome bit as bit_count(word & mask) % 2 (the parity-check
  matrix view) -- so hash equality checks the H*G identity, not one
  shared formula. tests/test_ext234_invariants.py proves correction
  exhaustively (16 nibbles x 8 single-bit positions) and the
  syndrome==position law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_B64_ALPHA = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)

# shared md5-hex media source (the ext172/ext226 convention), with a
# per-media byte count 54 + media_id % 7 so padding varies
_HEX_SRC_SQL = """
    h AS (
      SELECT doc_id AS media_id,
             54 + doc_id % 7 AS nb,
             md5(CAST(doc_id AS VARCHAR) || 'a')
               || md5(CAST(doc_id AS VARCHAR) || 'b')
               || md5(CAST(doc_id AS VARCHAR) || 'c')
               || md5(CAST(doc_id AS VARCHAR) || 'd') AS hex
      FROM documents)
"""


@register(
    "multimodal_base64",
    f"""
    WITH {_HEX_SRC_SQL},
    b AS (
      SELECT media_id, nb, i,
             ('0x' || substr(hex, CAST(i * 2 + 1 AS INTEGER), 2))::BIGINT AS v
      FROM h, LATERAL (SELECT unnest(range(0, nb)) AS i) idx),
    grp AS (
      SELECT media_id, nb, i // 3 AS g,
             CAST(count(*) AS BIGINT) AS gn,
             CAST(sum(v * CASE i % 3 WHEN 0 THEN 65536
                                     WHEN 1 THEN 256 ELSE 1 END)
                  AS BIGINT) AS w
      FROM b GROUP BY media_id, nb, i // 3),
    chars AS (
      SELECT media_id, nb, g,
             substr('{_B64_ALPHA}', CAST((w // 262144) % 64 AS INTEGER) + 1, 1)
             || substr('{_B64_ALPHA}', CAST((w // 4096) % 64 AS INTEGER) + 1, 1)
             || CASE WHEN gn >= 2
                     THEN substr('{_B64_ALPHA}',
                                 CAST((w // 64) % 64 AS INTEGER) + 1, 1)
                     ELSE '=' END
             || CASE WHEN gn = 3
                     THEN substr('{_B64_ALPHA}', CAST(w % 64 AS INTEGER) + 1, 1)
                     ELSE '=' END AS quad
      FROM grp),
    enc AS (
      SELECT media_id, nb, string_agg(quad, '' ORDER BY g) AS b64
      FROM chars GROUP BY media_id, nb)
    SELECT media_id, nb AS n_bytes,
           CAST(length(b64) AS BIGINT) AS b64_len,
           CAST((3 - nb % 3) % 3 AS BIGINT) AS n_pad,
           md5(b64) AS b64_md5,
           CAST(1 AS INTEGER) AS roundtrip_ok
    FROM enc
    """,
    tags=("multimodal", "codec", "transport", "exact-arith"),
)
def q_multimodal_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real RFC 4648 base64 in-engine (module docstring): Spark's JVM
    base64/unbase64 over BINARY, roundtrip asserted in-plan; oracle
    re-derives the encoding by 6-bit repacking from scratch."""
    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    h = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(54) + F.col("doc_id") % 7).cast("bigint").alias("nb"),
        F.concat(
            F.md5(F.concat(d, F.lit("a"))),
            F.md5(F.concat(d, F.lit("b"))),
            F.md5(F.concat(d, F.lit("c"))),
            F.md5(F.concat(d, F.lit("d"))),
        ).alias("hex"),
    )
    return h.select(
        "media_id",
        F.col("nb").alias("n_bytes"),
        # Spark's base64 is the JVM MIME encoder: it wraps lines with
        # CRLF every 76 chars; RFC 4648 plain base64 (what the oracle
        # re-derives) is the unwrapped form, so strip the CRLFs
        F.expr(
            "CAST(length(replace(base64(unhex(substr(hex, 1,"
            " CAST(2 * nb AS INT)))), concat(char(13), char(10)), ''))"
            " AS BIGINT)"
        ).alias("b64_len"),
        F.expr("CAST((3 - nb % 3) % 3 AS BIGINT)").alias("n_pad"),
        F.expr(
            "md5(replace(base64(unhex(substr(hex, 1, CAST(2 * nb AS INT)))),"
            " concat(char(13), char(10)), ''))"
        ).alias("b64_md5"),
        F.expr(
            "CAST(md5(unbase64(base64(unhex(substr(hex, 1,"
            " CAST(2 * nb AS INT))))))"
            " = md5(unhex(substr(hex, 1, CAST(2 * nb AS INT)))) AS INT)"
        ).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# Hamming(7,4)
# ---------------------------------------------------------------------------
# codeword bit layout (1-based positions): [p1 p2 d0 p3 d1 d2 d3]
# stored as integer bits 6..0 (position 1 = bit 6). Parity-check masks
# in that integer encoding: s1 covers positions 1,3,5,7; s2 covers
# 2,3,6,7; s3 covers 4,5,6,7.
_S1_MASK = (1 << 6) | (1 << 4) | (1 << 2) | (1 << 0)
_S2_MASK = (1 << 5) | (1 << 4) | (1 << 1) | (1 << 0)
_S3_MASK = (1 << 3) | (1 << 2) | (1 << 1) | (1 << 0)


def _enc_sql(d: str) -> str:
    """Generator-matrix encoding of nibble {d} (bits d0..d3, d0 = MSB
    of the nibble's data positions): explicit parity composition."""
    d0, d1, d2, d3 = (
        f"(({d}) // 8) % 2",
        f"(({d}) // 4) % 2",
        f"(({d}) // 2) % 2",
        f"({d}) % 2",
    )
    p1 = f"(({d0}) + ({d1}) + ({d3})) % 2"
    p2 = f"(({d0}) + ({d2}) + ({d3})) % 2"
    p3 = f"(({d1}) + ({d2}) + ({d3})) % 2"
    return (
        f"(({p1}) * 64 + ({p2}) * 32 + ({d0}) * 16 + ({p3}) * 8"
        f" + ({d1}) * 4 + ({d2}) * 2 + ({d3}))"
    )


@register(
    "hamming74_ecc",
    f"""
    WITH {_HEX_SRC_SQL},
    nib AS (
      SELECT media_id, i,
             ('0x' || substr(hex, CAST(i + 1 AS INTEGER), 1))::BIGINT AS d
      FROM h, LATERAL (SELECT unnest(range(0, 120)) AS i) idx),
    cw AS (
      SELECT media_id, i, d,
             {_enc_sql('d')} AS code,
             ('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':'
                             || CAST(i AS VARCHAR)), 1, 4))::BIGINT % 7 AS k
      FROM nib),
    rx AS (
      SELECT media_id, i, d, code, k,
             xor(code, CAST(1 AS BIGINT) << CAST(6 - k AS INTEGER)) AS word
      FROM cw),
    dec AS (
      -- parity-check matrix view: each syndrome bit is the parity of
      -- the masked word (a DIFFERENT derivation than the encoder's
      -- generator composition -- hash equality checks H*G = 0)
      SELECT media_id, i, d, code, k, word,
             bit_count(word & {_S1_MASK}) % 2
               + 2 * (bit_count(word & {_S2_MASK}) % 2)
               + 4 * (bit_count(word & {_S3_MASK}) % 2) AS syn
      FROM rx),
    fix AS (
      SELECT media_id, d, k, syn,
             CASE WHEN syn = 0 THEN word
                  ELSE xor(word, CAST(1 AS BIGINT)
                             << CAST(7 - syn AS INTEGER)) END AS fixed,
             code
      FROM dec)
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_cw,
           CAST(sum(k + 1) AS BIGINT) AS err_pos_sum,
           CAST(sum(syn) AS BIGINT) AS syndrome_sum,
           CAST(min(CASE WHEN fixed = code THEN 1 ELSE 0 END) AS INTEGER)
             AS all_corrected,
           CAST(sum(CASE WHEN syn = k + 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_syn_eq_pos
    FROM fix GROUP BY media_id
    """,
    tags=("multimodal", "integrity", "ecc", "exact-arith"),
)
def q_hamming74_ecc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming(7,4) SEC in-engine (module docstring): 120 nibbles per
    media, one md5-derived bit flip per codeword, syndrome decode and
    correct -- all pure BIGINT column algebra, no UDF."""
    docs = read_table(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    h = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.md5(F.concat(d, F.lit("a"))),
            F.md5(F.concat(d, F.lit("b"))),
            F.md5(F.concat(d, F.lit("c"))),
            F.md5(F.concat(d, F.lit("d"))),
        ).alias("hex"),
    )
    nib = h.select(
        "media_id",
        F.expr("explode(sequence(0, 119))").alias("i"),
        "hex",
    ).select(
        "media_id",
        "i",
        F.expr(
            "CAST(conv(substr(hex, CAST(i + 1 AS INT), 1), 16, 10) AS BIGINT)"
        ).alias("d"),
    )
    enc = _enc_sql("d").replace("//", "DIV")
    cw = nib.select(
        "media_id",
        "i",
        "d",
        F.expr(enc).alias("code"),
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(media_id AS STRING), ':',"
            " CAST(i AS STRING))), 1, 4), 16, 10) AS BIGINT) % 7"
        ).alias("k"),
    )
    rx = cw.select(
        "*",
        F.expr("code ^ shiftleft(CAST(1 AS BIGINT), CAST(6 - k AS INT))").alias(
            "word"
        ),
    )
    dec = rx.select(
        "*",
        F.expr(
            f"bit_count(word & {_S1_MASK}) % 2"
            f" + 2 * (bit_count(word & {_S2_MASK}) % 2)"
            f" + 4 * (bit_count(word & {_S3_MASK}) % 2)"
        ).alias("syn"),
    )
    fix = dec.select(
        "media_id",
        "d",
        "k",
        "syn",
        "code",
        F.expr(
            "CASE WHEN syn = 0 THEN word"
            " ELSE word ^ shiftleft(CAST(1 AS BIGINT), CAST(7 - syn AS INT))"
            " END"
        ).alias("fixed"),
    )
    return fix.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cw"),
        F.sum(F.col("k") + 1).cast("bigint").alias("err_pos_sum"),
        F.sum("syn").cast("bigint").alias("syndrome_sum"),
        F.min(
            F.when(F.col("fixed") == F.col("code"), 1).otherwise(0)
        ).cast("int").alias("all_corrected"),
        F.sum(
            F.when(F.col("syn") == F.col("k") + 1, 1).otherwise(0)
        ).cast("bigint").alias("n_syn_eq_pos"),
    )
