"""Extension batch 130 (round 6): training-mixture design -- quality-
temperature source weights (the DoReMi-lite mixing knob) and
boilerplate stripping yield at source granularity.

Scale notes (the 100 TB story):
- mixture_temperature_weights: per-source mean quality (e6-integer
  distinct-token ratios) -> w(s) proportional to q^(1/tau) at three
  temperatures; each power e9-rounds to an integer so the normalized
  weights are ratios of exact sums. One groupBy + a 1-row total
  broadcast; the schedule itself is queries_pipeline.mixture_schedule.
- boilerplate_strip_stats: 10-token chunk frequencies (ONE exchange on
  the chunk text, the line_dedup shape) -> drop chunks present in
  > 5% of docs -> per-source retained-token fraction and emptied-doc
  count. The strip POLICY's yield report, not just the dup measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_TAUS = (0.5, 1.0, 2.0)
_CHUNK = 10
_BOILER_DOC_FRAC = 0.05


@register(
    "mixture_temperature_weights",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             CAST(round(1000000.0
                  * len(list_distinct(string_split(text, ' ')))
                  / len(string_split(text, ' ')), 0) AS BIGINT) AS q_e6
      FROM documents),
    per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(q_e6) // count(*) AS BIGINT) AS q_mean_e6
      FROM q GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM per),
    pows AS (
      SELECT p.source, p.n_docs, p.q_mean_e6, t.tau,
             CAST(round(1000000000.0
                  * power(p.q_mean_e6 / 1000000.0, 1.0 / t.tau), 0)
                  AS BIGINT) AS pw_e9
      FROM per p CROSS JOIN (SELECT unnest(ARRAY{list(_TAUS)}) AS tau) t),
    norm AS (
      SELECT source, n_docs, tau, pw_e9,
             CAST(sum(pw_e9) OVER (PARTITION BY tau) AS BIGINT) AS tot_e9
      FROM pows)
    SELECT n.source, round(n.tau, 1) AS tau,
           round(CAST(n.pw_e9 AS DOUBLE) / n.tot_e9, 6) AS weight,
           round((CAST(n.pw_e9 AS DOUBLE) / n.tot_e9)
                 * t.n / n.n_docs, 6) AS oversample_factor
    FROM norm n CROSS JOIN tot t
    """,
    tags=("llm", "mixture", "training-data"),
)
def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-temperature mixture weights: per source, mean
    distinct-token-ratio quality q (e6 integer), then
    w_tau(s) = q^(1/tau) / sum over sources at tau in {{0.5, 1, 2}} --
    tau < 1 sharpens toward high-quality sources, tau > 1 flattens
    toward uniform. oversample_factor = w * N / n_s is the repeat rate
    the dataloader must apply. The weight-DESIGN half of the mixture
    pipeline (mixture_schedule consumes such weights)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q = docs.select(
        "source",
        F.round(
            F.lit(1000000.0)
            * F.size(F.array_distinct(toks))
            / F.size(toks),
            0,
        )
        .cast("bigint")
        .alias("q_e6"),
    )
    per = q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("CAST(sum(q_e6) DIV count(*) AS BIGINT)").alias("q_mean_e6"),
    )
    tot = per.agg(F.sum("n_docs").cast("bigint").alias("n"))
    taus = spark.createDataFrame([(t,) for t in _TAUS], "tau double")
    pows = per.crossJoin(F.broadcast(taus)).select(
        "source",
        "n_docs",
        "tau",
        F.round(
            F.lit(1000000000.0)
            * F.pow(F.col("q_mean_e6") / 1000000.0, 1.0 / F.col("tau")),
            0,
        )
        .cast("bigint")
        .alias("pw_e9"),
    )
    w = Window.partitionBy("tau")
    norm = pows.withColumn(
        "tot_e9", F.sum("pw_e9").over(w).cast("bigint")
    )
    return norm.crossJoin(F.broadcast(tot)).select(
        "source",
        F.round("tau", 1).alias("tau"),
        F.round(F.col("pw_e9").cast("double") / F.col("tot_e9"), 6).alias(
            "weight"
        ),
        F.round(
            (F.col("pw_e9").cast("double") / F.col("tot_e9"))
            * F.col("n")
            / F.col("n_docs"),
            6,
        ).alias("oversample_factor"),
    )


@register(
    "boilerplate_strip_stats",
    f"""
    WITH toks AS (
      SELECT t.doc_id, t.source, i.i AS pos, t.tk[i.i] AS tok,
             len(t.tk) AS n_tok
      FROM (SELECT doc_id, source, string_split(text, ' ') AS tk
            FROM documents) t,
           (SELECT unnest(range(1, 401)) AS i) i
      WHERE i.i <= len(t.tk)),
    chunks AS (
      SELECT doc_id, source, (pos - 1) // {_CHUNK} AS cidx,
             string_agg(tok, ' ' ORDER BY pos) AS chunk,
             CAST(count(*) AS BIGINT) AS c_toks
      FROM toks GROUP BY doc_id, source, (pos - 1) // {_CHUNK}),
    freq AS (
      SELECT chunk, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      FROM chunks GROUP BY chunk),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    flagged AS (
      SELECT c.doc_id, c.source, c.c_toks,
             CASE WHEN f.nd > {_BOILER_DOC_FRAC} * nn.n_docs
                  THEN 1 ELSE 0 END AS is_boiler
      FROM chunks c JOIN freq f ON f.chunk = c.chunk CROSS JOIN nn),
    per_doc AS (
      SELECT doc_id, source,
             CAST(sum(c_toks) AS BIGINT) AS toks_all,
             CAST(sum(CASE WHEN is_boiler = 0 THEN c_toks ELSE 0 END)
                  AS BIGINT) AS toks_kept
      FROM flagged GROUP BY doc_id, source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks_all) AS BIGINT) AS tokens_in,
           CAST(sum(toks_kept) AS BIGINT) AS tokens_kept,
           CAST((1000000 * sum(toks_kept)) // sum(toks_all) AS BIGINT)
             AS kept_ppm,
           CAST(sum(CASE WHEN toks_kept = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_emptied
    FROM per_doc GROUP BY source
    """,
    tags=("llm", "corpus-hygiene", "boilerplate"),
)
def q_boilerplate_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate stripping yield: 10-token chunks present in > 5% of
    documents are dropped (navigation/footer-shaped repetition); per
    source, the retained-token ppm and how many documents the policy
    EMPTIES entirely -- the two numbers that decide whether a strip
    threshold is safe to ship. One exchange keyed on the chunk text
    (line_dedup shape) + the doc/source roll-ups."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    )
    chunks = (
        toks.groupBy(
            "doc_id",
            "source",
            (F.col("pos0") / _CHUNK).cast("int").alias("cidx"),
        )
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos0", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("chunk"),
            F.count(F.lit(1)).cast("bigint").alias("c_toks"),
        )
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").cast("bigint").alias("nd")
    )
    nn = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    flagged = (
        chunks.join(freq, "chunk")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "source",
            "c_toks",
            F.when(
                F.col("nd") > _BOILER_DOC_FRAC * F.col("n_docs"), 1
            )
            .otherwise(0)
            .alias("is_boiler"),
        )
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.sum("c_toks").cast("bigint").alias("toks_all"),
        F.sum(F.when(F.col("is_boiler") == 0, F.col("c_toks")).otherwise(0))
        .cast("bigint")
        .alias("toks_kept"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks_all").cast("bigint").alias("tokens_in"),
        F.sum("toks_kept").cast("bigint").alias("tokens_kept"),
        F.expr(
            "CAST((1000000 * sum(toks_kept)) DIV sum(toks_all) AS BIGINT)"
        ).alias("kept_ppm"),
        F.sum(F.when(F.col("toks_kept") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("docs_emptied"),
    )
