"""Extension batch 136 (round 6): classical readability indices over
the documents corpus -- ARI + Coleman-Liau + LIX (character/word/
sentence arithmetic), Flesch reading ease + Flesch-Kincaid grade
(vowel-group syllable heuristic), and SMOG (polysyllabic-word count
via the token explode). Readability is a standard training-data
quality-scoring axis (pair with text_quality / lm_quality_score /
quality_classifier_score); these are the classic public formulas.

Testdata note: the synthetic documents carry no sentence punctuation,
so the [.!?]+ sentence splitter falls back to 1 sentence per document
(greatest(count, 1)); on punctuated corpora the same expressions count
real sentence breaks. Syllables use the canonical [aeiouy]+ vowel-group
heuristic -- the identical RE2/Java-compatible pattern on both engines.

Scale notes (the 100 TB story):
- All three are map-side regex counts folded into ONE grouped
  aggregation per source (exact integer sums: chars, words, long
  words, vowel groups, sentence breaks) -- no shuffle beyond the
  |sources| cells; the final index formulas are double expressions
  over identical integers (round 6, signed-zero normalized).
- smog_polysyllable is the only token-explode pass (per-word syllable
  counts cannot fold corpus-wide) and aggregates straight back to the
  source cell -- explode -> partial agg, no wide row ever persists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact integer readability counts (map-side)."""
    docs = read_table(spark, sf_dir, "documents")
    # pure regex counts, no higher-order lambdas (CodegenFallback --
    # CLAUDE.md perf note): letters = text minus non-letters, long
    # words = runs of 7+ letters.
    return docs.select(
        "source",
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .cast("bigint")
        .alias("n_words"),
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
        .cast("bigint")
        .alias("n_letters"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{7,}', 0)"))
        .cast("bigint")
        .alias("n_long_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("bigint"),
            F.lit(1).cast("bigint"),
        ).alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(text, '[aeiouy]+', 0)"))
        .cast("bigint")
        .alias("n_vowel_groups"),
    )


_COUNTS_SQL = """
    counts AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
               AS n_letters,
             CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT)
               AS n_long_words,
             greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      CAST(1 AS BIGINT)) AS n_sentences,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
               AS n_vowel_groups
      FROM documents)
"""


@register(
    "readability_indices",
    f"""
    WITH {_COUNTS_SQL},
    agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS w,
             CAST(sum(n_letters) AS BIGINT) AS c,
             CAST(sum(n_long_words) AS BIGINT) AS lw,
             CAST(sum(n_sentences) AS BIGINT) AS s
      FROM counts GROUP BY source)
    SELECT source, n_docs, w AS n_words,
           round(4.71 * (CAST(c AS DOUBLE) / w)
                 + 0.5 * (CAST(w AS DOUBLE) / s) - 21.43, 6) + 0.0 AS ari,
           round(0.0588 * (100.0 * c / w)
                 - 0.296 * (100.0 * s / w) - 15.8, 6) + 0.0 AS coleman_liau,
           round(CAST(w AS DOUBLE) / s + 100.0 * lw / w, 6) AS lix
    FROM agg
    ORDER BY source
    """,
    tags=("text", "quality", "readability"),
)
def q_readability_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus readability: ARI = 4.71*(chars/words) +
    0.5*(words/sentences) - 21.43, Coleman-Liau = 0.0588*L - 0.296*S
    - 15.8 (L = letters per 100 words, S = sentences per 100 words),
    LIX = words/sentences + 100*longwords/words (long = >6 chars).
    Corpus-level ratios of exact integer sums, so both engines divide
    identical BIGINTs; indices can go negative on terse text -- the
    +0.0 normalizes signed zero."""
    counts = _doc_counts(spark, sf_dir)
    agg = counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("w"),
        F.sum("n_letters").cast("bigint").alias("c"),
        F.sum("n_long_words").cast("bigint").alias("lw"),
        F.sum("n_sentences").cast("bigint").alias("s"),
    )
    wd = F.col("w").cast("double")
    cd = F.col("c").cast("double")
    sd = F.col("s").cast("double")
    lwd = F.col("lw").cast("double")
    return agg.select(
        "source",
        "n_docs",
        F.col("w").alias("n_words"),
        (F.round(4.71 * (cd / wd) + 0.5 * (wd / sd) - 21.43, 6) + F.lit(0.0)).alias(
            "ari"
        ),
        (
            F.round(0.0588 * (100.0 * cd / wd) - 0.296 * (100.0 * sd / wd) - 15.8, 6)
            + F.lit(0.0)
        ).alias("coleman_liau"),
        F.round(wd / sd + 100.0 * lwd / wd, 6).alias("lix"),
    ).orderBy("source")


@register(
    "flesch_reading_ease",
    f"""
    WITH {_COUNTS_SQL},
    agg AS (
      SELECT source,
             CAST(sum(n_words) AS BIGINT) AS w,
             CAST(sum(n_sentences) AS BIGINT) AS s,
             CAST(sum(n_vowel_groups) AS BIGINT) AS sy
      FROM counts GROUP BY source)
    SELECT source, w AS n_words, sy AS n_syllables,
           round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                 - 84.6 * (CAST(sy AS DOUBLE) / w), 6) + 0.0 AS flesch_ease,
           round(0.39 * (CAST(w AS DOUBLE) / s)
                 + 11.8 * (CAST(sy AS DOUBLE) / w) - 15.59, 6) + 0.0
             AS fk_grade
    FROM agg
    ORDER BY source
    """,
    tags=("text", "quality", "readability"),
)
def q_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words) and the Flesch-Kincaid grade level, per
    source. Syllables are [aeiouy]+ vowel groups (the standard
    heuristic; word boundaries break groups, so the corpus-wide regex
    count equals the per-word sum without an explode). Exact integer
    sums, one double formula, signed-zero normalized."""
    counts = _doc_counts(spark, sf_dir)
    agg = counts.groupBy("source").agg(
        F.sum("n_words").cast("bigint").alias("w"),
        F.sum("n_sentences").cast("bigint").alias("s"),
        F.sum("n_vowel_groups").cast("bigint").alias("sy"),
    )
    wd = F.col("w").cast("double")
    sd = F.col("s").cast("double")
    syd = F.col("sy").cast("double")
    return agg.select(
        "source",
        F.col("w").alias("n_words"),
        F.col("sy").alias("n_syllables"),
        (F.round(206.835 - 1.015 * (wd / sd) - 84.6 * (syd / wd), 6) + F.lit(0.0)).alias(
            "flesch_ease"
        ),
        (F.round(0.39 * (wd / sd) + 11.8 * (syd / wd) - 15.59, 6) + F.lit(0.0)).alias(
            "fk_grade"
        ),
    ).orderBy("source")


@register(
    "smog_polysyllable",
    """
    WITH words AS (
      SELECT source,
             greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                      CAST(1 AS BIGINT)) AS n_sentences,
             unnest(regexp_extract_all(text, '[a-z]+')) AS w
      FROM documents),
    flagged AS (
      SELECT source, n_sentences,
             CASE WHEN len(regexp_extract_all(w, '[aeiouy]+')) >= 3
                  THEN 1 ELSE 0 END AS poly
      FROM words),
    agg AS (
      SELECT source,
             CAST(sum(poly) AS BIGINT) AS n_poly,
             CAST(count(*) AS BIGINT) AS n_words
      FROM flagged GROUP BY source),
    sents AS (
      SELECT source, CAST(sum(greatest(CAST(len(regexp_extract_all(
               text, '[.!?]+')) AS BIGINT), CAST(1 AS BIGINT))) AS BIGINT) AS s
      FROM documents GROUP BY source)
    SELECT a.source, a.n_poly, a.n_words,
           round(CAST(a.n_poly AS DOUBLE) / a.n_words, 6) AS poly_ratio,
           round(1.0430 * sqrt(CAST(a.n_poly AS DOUBLE) * 30.0 / se.s)
                 + 3.1291, 6) AS smog_grade
    FROM agg a JOIN sents se ON a.source = se.source
    ORDER BY a.source
    """,
    tags=("text", "quality", "readability"),
)
def q_smog_polysyllable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMOG grade per source: 1.0430*sqrt(polysyllables * 30/sentences)
    + 3.1291, polysyllabic = word with >= 3 vowel groups. This is the
    one readability metric that genuinely needs per-WORD syllable
    counts, so it takes the token-explode path (explode -> conditional
    count -> straight back to the source cell); the sentence totals
    come from a second map-side aggregation joined on the |sources|
    dimension."""
    docs = read_table(spark, sf_dir, "documents")
    sent = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    words = docs.select(
        "source",
        F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("w"),
    )
    flagged = words.select(
        "source",
        F.when(
            F.size(F.expr("regexp_extract_all(w, '[aeiouy]+', 0)")) >= 3, 1
        )
        .otherwise(0)
        .alias("poly"),
    )
    agg = flagged.groupBy("source").agg(
        F.sum("poly").cast("bigint").alias("n_poly"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
    sents = docs.select("source", sent.alias("ns")).groupBy("source").agg(
        F.sum("ns").cast("bigint").alias("s")
    )
    j = agg.join(sents, "source")
    return j.select(
        "source",
        "n_poly",
        "n_words",
        F.round(F.col("n_poly").cast("double") / F.col("n_words"), 6).alias(
            "poly_ratio"
        ),
        F.round(
            1.0430
            * F.sqrt(F.col("n_poly").cast("double") * 30.0 / F.col("s"))
            + 3.1291,
            6,
        ).alias("smog_grade"),
    ).orderBy("source")
