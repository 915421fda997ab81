"""Extension batch 37: integer-exact NDCG@10, classifier F1 scores,
and multi-step Markov transition probabilities.

Scale notes (the 100 TB story per query):
- ndcg_at_k is ranking evaluation without a single float: the
  popularity ranking is a constant 10-row broadcast (train-period top
  parts), log2 position discounts are PYTHON-precomputed e9 literals
  (no cross-engine log parity at all), per-user DCG/IDCG are exact
  integer dot products, and the mean NDCG is an exact ppm. The only
  per-user window (ideal ordering) is partitioned.
- f1_scores_langid closes the classifier-eval loop: per-class
  TP/FP/FN from the confusion cells, precision/recall in ppm, and F1
  via its exact rational form 2TP/(2TP+FP+FN) -- no float P/R
  intermediate.
- markov_3step_probs raises the transition matrix to the 3rd power on
  its own |types|^2 summary: each matrix multiply is a tiny equi-join
  with per-term integer scaling ((p*q) DIV 1e9, summed exactly), so
  both engines produce identical 3-step probabilities. The fact table
  is touched once (the shared per-user lead window).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_K = 10
_SPLIT = "1998-07-01"
# log2 discounts as exact integer literals -- identical in both engines
_DISC_E9 = [round(1e9 / math.log2(i + 2)) for i in range(_K)]  # position 1..10
_DISC_SQL = ", ".join(f"({i + 1}, {d})" for i, d in enumerate(_DISC_E9))


@register(
    "ndcg_at_k",
    f"""
    WITH r AS (
      SELECT o.o_custkey AS u, l.l_partkey AS i,
             CAST(l.l_quantity AS BIGINT) AS q, o.o_orderdate AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    pop AS (
      SELECT i, row_number() OVER (ORDER BY sum(q) DESC, i) AS pos
      FROM r WHERE d < DATE '{_SPLIT}' GROUP BY i
      ORDER BY sum(q) DESC, i LIMIT {_K}
    ),
    disc AS (SELECT * FROM (VALUES {_DISC_SQL}) AS t(pos, w)),
    rel AS (
      SELECT u, i, CAST(sum(q) AS BIGINT) AS rel
      FROM r WHERE d >= DATE '{_SPLIT}' GROUP BY u, i
    ),
    dcg AS (
      SELECT rel.u, CAST(sum(rel.rel * disc.w) AS BIGINT) AS dcg_e9
      FROM rel JOIN pop ON rel.i = pop.i JOIN disc ON disc.pos = pop.pos
      GROUP BY rel.u
    ),
    ideal AS (
      SELECT u, rel, row_number() OVER (PARTITION BY u
               ORDER BY rel DESC, i) AS pos
      FROM rel
    ),
    idcg AS (
      SELECT ideal.u, CAST(sum(ideal.rel * disc.w) AS BIGINT) AS idcg_e9
      FROM ideal JOIN disc ON disc.pos = ideal.pos
      WHERE ideal.pos <= {_K}
      GROUP BY ideal.u
    ),
    per AS (
      SELECT idcg.u,
             CAST((1000000 * coalesce(dcg.dcg_e9, 0)) // idcg.idcg_e9
                  AS BIGINT) AS ndcg_ppm
      FROM idcg LEFT JOIN dcg ON idcg.u = dcg.u
      WHERE idcg.idcg_e9 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(ndcg_ppm) // count(*) AS BIGINT) AS mean_ndcg_ppm,
           CAST(max(ndcg_ppm) AS BIGINT) AS max_ndcg_ppm
    FROM per
    """,
    tags=("ml", "ranking", "eval"),
)
def q_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the train-period popularity ranking against
    eval-period purchase quantities: constant 10-row ranked list +
    Python-literal e9 log2 discounts make DCG/IDCG exact integer dot
    products; per-user NDCG is an exact ppm ratio and the mean is a
    floor division. Users with no eval purchases drop (IDCG = 0)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    r = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("u"),
        F.col("l_partkey").alias("i"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.col("o_orderdate").alias("d"),
    )
    split = F.lit(_SPLIT).cast("date")
    pop = (
        r.where(F.col("d") < split)
        .groupBy("i")
        .agg(F.sum("q").alias("t"))
        .orderBy(F.col("t").desc(), "i")
        .limit(_K)
        .select("i", F.row_number().over(Window.orderBy(F.col("t").desc(), "i")).alias("pos"))
    )
    disc = spark.createDataFrame(
        [(i + 1, d) for i, d in enumerate(_DISC_E9)], "pos int, w long"
    )
    rel = (
        r.where(F.col("d") >= split)
        .groupBy("u", "i")
        .agg(F.sum("q").cast("bigint").alias("rel"))
    )
    dcg = (
        rel.join(F.broadcast(pop), "i")
        .join(F.broadcast(disc), "pos")
        .groupBy("u")
        .agg(F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("dcg_e9"))
    )
    ideal = rel.select(
        "u",
        "rel",
        F.row_number()
        .over(Window.partitionBy("u").orderBy(F.col("rel").desc(), "i"))
        .alias("pos"),
    )
    idcg = (
        ideal.where(F.col("pos") <= _K)
        .join(F.broadcast(disc), "pos")
        .groupBy("u")
        .agg(F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("idcg_e9"))
    )
    per = (
        idcg.join(dcg, "u", "left")
        .where(F.col("idcg_e9") > 0)
        .select(
            F.expr(
                "CAST((1000000 * coalesce(dcg_e9, 0)) DIV idcg_e9 AS BIGINT)"
            ).alias("ndcg_ppm")
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("CAST(sum(ndcg_ppm) DIV count(*) AS BIGINT)").alias("mean_ndcg_ppm"),
        F.max("ndcg_ppm").cast("bigint").alias("max_ndcg_ppm"),
    )


# ---------------------------------------------------------------------------
# Per-class precision/recall/F1 of the lang_id heuristic.
# ---------------------------------------------------------------------------
@register(
    "f1_scores_langid",
    """
    WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(toks, x -> x IN ('the', 'a', 'fast')))
                       >= len(list_filter(toks, x -> x IN ('data', 'row')))
                   AND len(list_filter(toks, x -> x IN ('the', 'a', 'fast')))
                       >= len(list_filter(toks, x -> x IN ('table', 'join')))
                  THEN 'en'
                  WHEN len(list_filter(toks, x -> x IN ('data', 'row')))
                       >= len(list_filter(toks, x -> x IN ('table', 'join')))
                  THEN 'es' ELSE 'zh' END AS p
      FROM t),
    classes AS (SELECT DISTINCT lang AS c FROM pred),
    stats AS (
      SELECT c.c,
             CAST((SELECT count(*) FROM pred WHERE lang = c.c AND p = c.c)
                  AS BIGINT) AS tp,
             CAST((SELECT count(*) FROM pred WHERE lang <> c.c AND p = c.c)
                  AS BIGINT) AS fp,
             CAST((SELECT count(*) FROM pred WHERE lang = c.c AND p <> c.c)
                  AS BIGINT) AS fn
      FROM classes c)
    SELECT c AS lang, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST((1000000 * tp) // (tp + fp) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST((1000000 * tp) // (tp + fn) AS BIGINT)
           END AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE CAST((2000000 * tp) // (2 * tp + fp + fn) AS BIGINT)
           END AS f1_ppm
    FROM stats
    """,
    tags=("text", "eval", "f1"),
)
def q_f1_scores_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class P/R/F1 of the lang_id heuristic in exact ppm: F1 uses
    its rational identity 2TP/(2TP+FP+FN), so there is no float P/R
    intermediate at all. Classes with no predictions get NULL
    precision (guarded identically in both engines)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    h_en = F.size(F.filter(toks, lambda t: t.isin("the", "a", "fast")))
    h_es = F.size(F.filter(toks, lambda t: t.isin("data", "row")))
    h_zh = F.size(F.filter(toks, lambda t: t.isin("table", "join")))
    pred = docs.select(
        "lang",
        F.when((h_en >= h_es) & (h_en >= h_zh), "en")
        .when(h_es >= h_zh, "es")
        .otherwise("zh")
        .alias("p"),
    )
    stats = pred.groupBy("lang").agg(
        F.sum(F.when(F.col("p") == F.col("lang"), 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(F.col("p") != F.col("lang"), 1).otherwise(0)).cast("bigint").alias("fn"),
    )
    fp = pred.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n_pred"))
    out = (
        stats.join(fp, stats.lang == fp.p, "left")
        .select(
            "lang",
            "tp",
            (F.coalesce(F.col("n_pred"), F.lit(0)) - F.col("tp")).cast("bigint").alias("fp"),
            "fn",
        )
    )
    return out.select(
        "lang",
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("CAST((1000000 * tp) DIV (tp + fp) AS BIGINT)"))
        .alias("precision_ppm"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("CAST((1000000 * tp) DIV (tp + fn) AS BIGINT)"))
        .alias("recall_ppm"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("CAST((2000000 * tp) DIV (2 * tp + fp + fn) AS BIGINT)"))
        .alias("f1_ppm"),
    )


# ---------------------------------------------------------------------------
# 3-step Markov transition probabilities via integer matrix powers.
# ---------------------------------------------------------------------------
@register(
    "markov_3step_probs",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    p1 AS (
      SELECT cur AS a, nxt AS b,
             CAST((1000000000 * count(*))
                  // sum(count(*)) OVER (PARTITION BY cur) AS BIGINT) AS p
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    p2 AS (
      SELECT x.a, y.b, CAST(sum((x.p * y.p) // 1000000000) AS BIGINT) AS p
      FROM p1 x JOIN p1 y ON x.b = y.a GROUP BY x.a, y.b),
    p3 AS (
      SELECT x.a, y.b, CAST(sum((x.p * y.p) // 1000000000) AS BIGINT) AS p
      FROM p2 x JOIN p1 y ON x.b = y.a GROUP BY x.a, y.b)
    SELECT a AS from_state, b AS to_state, p AS p3_e9 FROM p3
    """,
    tags=("sequence", "markov", "matrix"),
)
def q_markov_3step_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P^3 on the transition summary: row-normalized e9 probabilities
    (integer division), then two matrix multiplies as tiny equi-joins
    with per-term (p*q) DIV 1e9 scaling summed exactly -- identical
    integers in both engines. Where the user lands three clicks from
    now, per starting state."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    p1 = cnt.select(
        F.col("cur").alias("a"),
        F.col("nxt").alias("b"),
        F.expr(
            "CAST((1000000000 * c) DIV sum(c) OVER (PARTITION BY cur) AS BIGINT)"
        ).alias("p"),
    )

    def matmul(x: DataFrame, y: DataFrame) -> DataFrame:
        xx = x.select(F.col("a"), F.col("b").alias("m"), F.col("p").alias("px"))
        yy = y.select(F.col("a").alias("m"), F.col("b"), F.col("p").alias("py"))
        return (
            xx.join(yy, "m")
            .groupBy("a", "b")
            .agg(
                F.sum(F.expr("(px * py) DIV 1000000000")).cast("bigint").alias("p")
            )
        )

    p3 = matmul(matmul(p1, p1), p1)
    return p3.select(
        F.col("a").alias("from_state"), F.col("b").alias("to_state"), F.col("p").alias("p3_e9")
    )
