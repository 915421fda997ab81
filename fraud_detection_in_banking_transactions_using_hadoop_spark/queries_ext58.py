"""Extension batch 58: McNemar's test for paired classifiers.

Scale notes:
- mcnemar_test is THE way to compare two classifiers evaluated on the
  SAME documents (independent-sample tests are wrong there): the
  marker-based lang_id heuristic vs the majority-class baseline,
  scored per doc, reduced to the discordant-pair counts b (heuristic
  right, baseline wrong) and c (reverse). The continuity-corrected
  statistic (|b-c|-1)^2/(b+c) closes over two exact integers. One
  map-side scoring pass + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "mcnemar_test",
    """
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    scored AS (
      SELECT lang,
             CASE WHEN len(list_filter(toks, x -> x IN ('the', 'a', 'fast')))
                       >= len(list_filter(toks, x -> x IN ('data', 'row')))
                   AND len(list_filter(toks, x -> x IN ('the', 'a', 'fast')))
                       >= len(list_filter(toks, x -> x IN ('table', 'join')))
                  THEN 'en'
                  WHEN len(list_filter(toks, x -> x IN ('data', 'row')))
                       >= len(list_filter(toks, x -> x IN ('table', 'join')))
                  THEN 'es' ELSE 'zh' END AS p_heur
      FROM t),
    maj AS (
      SELECT lang AS m FROM t GROUP BY lang ORDER BY count(*) DESC, lang
      LIMIT 1
    ),
    pairs AS (
      SELECT CASE WHEN p_heur = lang THEN 1 ELSE 0 END AS h_right,
             CASE WHEN (SELECT m FROM maj) = lang THEN 1 ELSE 0 END AS b_right
      FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h_right = 1 AND b_right = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS b_discordant,
           CAST(sum(CASE WHEN h_right = 0 AND b_right = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS c_discordant,
           CASE WHEN sum(CASE WHEN h_right <> b_right THEN 1 ELSE 0 END) = 0
                THEN NULL
                ELSE round(
                  (abs(CAST(sum(CASE WHEN h_right = 1 AND b_right = 0
                            THEN 1 ELSE 0 END)
                       - sum(CASE WHEN h_right = 0 AND b_right = 1
                             THEN 1 ELSE 0 END) AS DOUBLE)) - 1)
                  * (abs(CAST(sum(CASE WHEN h_right = 1 AND b_right = 0
                              THEN 1 ELSE 0 END)
                         - sum(CASE WHEN h_right = 0 AND b_right = 1
                               THEN 1 ELSE 0 END) AS DOUBLE)) - 1)
                  / sum(CASE WHEN h_right <> b_right THEN 1 ELSE 0 END), 6)
           END AS chi2
    FROM pairs
    """,
    tags=("stats", "paired", "eval"),
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuity-corrected McNemar chi2 = (|b-c|-1)^2/(b+c) over the
    discordant pairs between the marker heuristic and the
    majority-class baseline scored on the SAME docs -- exact integer
    counts, one closing double, NULL when the classifiers never
    disagree."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    h_en = F.size(F.filter(toks, lambda t: t.isin("the", "a", "fast")))
    h_es = F.size(F.filter(toks, lambda t: t.isin("data", "row")))
    h_zh = F.size(F.filter(toks, lambda t: t.isin("table", "join")))
    scored = docs.select(
        "lang",
        F.when((h_en >= h_es) & (h_en >= h_zh), "en")
        .when(h_es >= h_zh, "es")
        .otherwise("zh")
        .alias("p_heur"),
    )
    maj = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("m"))
    )
    pairs = scored.crossJoin(F.broadcast(maj)).select(
        F.when(F.col("p_heur") == F.col("lang"), 1).otherwise(0).alias("h_right"),
        F.when(F.col("m") == F.col("lang"), 1).otherwise(0).alias("b_right"),
    )
    b = F.sum(
        F.when((F.col("h_right") == 1) & (F.col("b_right") == 0), 1).otherwise(0)
    ).cast("bigint")
    c = F.sum(
        F.when((F.col("h_right") == 0) & (F.col("b_right") == 1), 1).otherwise(0)
    ).cast("bigint")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        b.alias("b_discordant"),
        c.alias("c_discordant"),
    )
    disc = F.col("b_discordant") + F.col("c_discordant")
    diff = F.abs(
        F.col("b_discordant").cast("double") - F.col("c_discordant")
    )
    return agg.select(
        "n_docs",
        "b_discordant",
        "c_discordant",
        F.when(disc == 0, F.lit(None).cast("double"))
        .otherwise(F.round((diff - 1) * (diff - 1) / disc, 6))
        .alias("chi2"),
    )
