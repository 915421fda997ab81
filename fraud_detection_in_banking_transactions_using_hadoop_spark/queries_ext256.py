"""Extension batch 256 (round 12): phonetic encoding from scratch --
American Soundex as ONE shared SQL pipeline in both engines, plus the
phonetic-blocked ER candidate pipeline it enables.

Soundex pipeline (canonical Knuth/NARA rules, no library anywhere):
  first letter kept; tail H/W removed (they merge neighbors); every
  letter mapped by ONE translate() call (B F P V->1, C G J K Q S X Z->2,
  D T->3, L->4, M N->5, R->6, vowels+Y->0); the first letter's DIGIT is
  prepended before collapsing adjacent repeats (so a same-class second
  letter dies against the first, PFISTER->P236) and dropped after;
  zeros (vowel positions) are removed last, so vowel-separated repeats
  survive (TYMCZAK->T522) while H/W-separated ones collapse
  (ASHCRAFT->A261); right-pad to 3 digits. Adjacent-repeat collapse is
  seven chained regexp_replace('d{2,}') calls -- RE2 (DuckDB) has no
  backreferences, so '(\\d)\\1+' is not portable (build-notes class).

- soundex_blocking: the phonetic blocking profile of the part-name
  vocabulary: per code, distinct words, total occurrences, and the
  candidate-pair mass b(b-1)/2 the block would generate -- the
  blocking_quality methodology (ext241) on a DERIVED key instead of a
  natural one.
- soundex_er_pairs: the pipeline the key exists for -- distinct part
  names blocked on the FIRST word's soundex code (the name vocabulary
  is bounded, so blocks are O(1) in corpus rows), pairs verified by
  levenshtein <= 4; top pairs + the exact candidate/survivor
  accounting. Equi-join on the phonetic key: bucketed, never
  all-pairs -- the fuzzy_name_match_djoin shape with a derived key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_SND_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_SND_TO = "111122222222334556000000"


def soundex_sql(w: str, duck: bool) -> str:
    """Shared-pipeline soundex of the SQL string expression `w`
    (letters only assumed). `duck` adds DuckDB's mandatory 'g' flag to
    the regexp_replace calls (Spark replaces globally by default)."""
    g = ", 'g'" if duck else ""
    u = f"upper({w})"
    tail_nohw = f"regexp_replace(substr({u}, 2), '[HW]', ''{g})"
    digits = (
        f"translate(substr({u}, 1, 1) || {tail_nohw},"
        f" '{_SND_FROM}', '{_SND_TO}')"
    )
    collapsed = digits
    for d in range(7):
        collapsed = (
            f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}'{g})"
        )
    body = f"replace(substr({collapsed}, 2), '0', '')"
    return f"substr({u}, 1, 1) || rpad(substr({body}, 1, 3), 3, '0')"


def soundex_ref(word: str) -> str:
    """Independent Python reference (explicit per-letter walk with the
    canonical H/W and vowel separation rules) for the invariant test."""
    codes = dict(zip(_SND_FROM, _SND_TO))
    u = "".join(ch for ch in word.upper() if ch.isalpha())
    if not u:
        return ""
    out = []
    prev = codes.get(u[0], "0")
    for ch in u[1:]:
        if ch in "HW":
            continue  # transparent: previous code survives across H/W
        c = codes.get(ch, "0")
        if c != "0" and c != prev:
            out.append(c)
        prev = c
    return u[0] + "".join(out)[:3].ljust(3, "0")


_WORDS_CTE = """
    words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS occ
      FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
      GROUP BY w)
"""


def _blocking_sql() -> str:
    snd = soundex_sql("w", duck=True)
    return f"""
    WITH {_WORDS_CTE},
    coded AS (SELECT w, occ, {snd} AS code FROM words),
    blocks AS (
      SELECT code, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(occ) AS BIGINT) AS n_occurrences,
             CAST(count(*) * (count(*) - 1) / 2 AS BIGINT)
               AS candidate_pairs
      FROM coded GROUP BY code),
    tot AS (
      SELECT CAST(sum(n_words) AS BIGINT) AS v,
             CAST(sum(candidate_pairs) AS BIGINT) AS total_pairs
      FROM blocks)
    SELECT b.code, b.n_words, b.n_occurrences, b.candidate_pairs,
           t.v AS vocab_size, t.total_pairs
    FROM blocks b CROSS JOIN tot t
    ORDER BY b.n_words DESC, b.code
    LIMIT 20
    """


@register(
    "soundex_blocking",
    _blocking_sql(),
    tags=("entity-resolution", "phonetic", "blocking", "text"),
)
def q_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking profile of the part-name vocabulary (module
    docstring): from-scratch soundex as one shared translate/replace
    pipeline, per-code word counts and the exact candidate-pair mass."""
    words = (
        read_table(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
    )
    coded = words.select(
        "w", "occ", F.expr(soundex_sql("w", duck=False)).alias("code")
    )
    blocks = coded.groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("occ").cast("bigint").alias("n_occurrences"),
        F.expr("CAST(count(*) * (count(*) - 1) / 2 AS BIGINT)").alias(
            "candidate_pairs"
        ),
    )
    tot = blocks.agg(
        F.sum("n_words").cast("bigint").alias("vocab_size"),
        F.sum("candidate_pairs").cast("bigint").alias("total_pairs"),
    )
    return (
        blocks.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n_words").desc(), "code")
        .limit(20)
    )


def _er_sql() -> str:
    snd = soundex_sql("string_split(nm, ' ')[1]", duck=True)
    return f"""
    WITH names AS (
      SELECT DISTINCT p_name AS nm FROM part),
    sig AS (
      SELECT nm, {snd} AS code FROM names),
    cand AS (
      SELECT a.nm AS name_a, b.nm AS name_b
      FROM sig a JOIN sig b ON a.code = b.code AND a.nm < b.nm),
    verified AS (
      SELECT name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
      FROM cand),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN dist <= 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_survivors
      FROM verified)
    SELECT v.name_a, v.name_b, v.dist, s.n_candidates, s.n_survivors
    FROM verified v CROSS JOIN stats s
    WHERE v.dist <= 4
    ORDER BY v.dist, v.name_a, v.name_b
    LIMIT 20
    """


@register(
    "soundex_er_pairs",
    _er_sql(),
    tags=("entity-resolution", "phonetic", "fuzzy", "scale-twin"),
)
def q_soundex_er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetically-blocked near-duplicate part names: equi-join on the
    FIRST word's soundex code (the name vocabulary is bounded, so each
    block is O(1) in corpus rows -- bucketed, never all-pairs),
    levenshtein <= 4 verifier, top-20 survivors with the candidate
    accounting."""
    names = (
        read_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("nm"))
        .distinct()
    )
    first = "split(nm, ' ')[0]"
    sig = names.select(
        "nm", F.expr(soundex_sql(first, duck=False)).alias("code")
    ).localCheckpoint(eager=True)
    a = sig.select(F.col("nm").alias("name_a"), F.col("code"))
    b = sig.select(F.col("nm").alias("name_b"), F.col("code"))
    cand = a.join(b, "code").where(F.col("name_a") < F.col("name_b"))
    verified = cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    ).localCheckpoint(eager=True)
    stats = verified.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("dist") <= 4, 1).otherwise(0))
        .cast("bigint")
        .alias("n_survivors"),
    )
    return (
        verified.where(F.col("dist") <= 4)
        .crossJoin(F.broadcast(stats))
        .orderBy("dist", "name_a", "name_b")
        .limit(20)
    )
