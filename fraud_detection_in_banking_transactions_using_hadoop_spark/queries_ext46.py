"""Extension batch 46: Cohen's kappa agreement and the Youden-J
optimal threshold.

Scale notes (the 100 TB story per query):
- cohens_kappa measures chance-corrected agreement between the
  lang_id heuristic and the labeled truth: observed and expected
  agreement are exact rationals from the confusion margins (one
  groupBy to <=9 cells), kappa = (po - pe)/(1 - pe) in one closing
  double. The agreement statistic annotator-QA pipelines report
  beside F1.
- youden_j_threshold picks the operating point a deployed classifier
  runs at: every distinct score is a candidate threshold, TP/FP
  cumulative counts come from ONE pass over the distinct-value spine,
  J = TPR - FPR is an exact e9 integer per candidate, and the argmax
  is an ordered limit -- the ROC-curve scan as a spine walk, no
  per-threshold rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Cohen's kappa of the lang_id heuristic vs the labels.
# ---------------------------------------------------------------------------
@register(
    "cohens_kappa",
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
    cells AS (SELECT lang, p, CAST(count(*) AS BIGINT) AS c FROM pred
              GROUP BY lang, p),
    -- expected agreement couples each class's row margin with the SAME
    -- class's column margin (full outer join covers classes missing on
    -- one side)
    marg AS (
      SELECT CAST(sum(rt * ct) AS HUGEINT) AS pe_num2, CAST(max(n) AS BIGINT) AS n2
      FROM (
        SELECT coalesce(r.lang, c.p) AS cls,
               CAST(coalesce(r.rt, 0) AS HUGEINT) AS rt,
               CAST(coalesce(c.ct, 0) AS HUGEINT) AS ct,
               (SELECT sum(c) FROM cells) AS n
        FROM (SELECT lang, sum(c) AS rt FROM cells GROUP BY lang) r
        FULL OUTER JOIN (SELECT p, sum(c) AS ct FROM cells GROUP BY p) c
          ON r.lang = c.p
      )
    )
    SELECT a.n,
           a.agree,
           round(CAST(a.agree AS DOUBLE) / a.n, 6) AS po,
           round(CAST(m.pe_num2 AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n), 6)
             AS pe,
           round((CAST(a.agree AS DOUBLE) / a.n
                  - CAST(m.pe_num2 AS DOUBLE) / (CAST(a.n AS DOUBLE) * a.n))
                 / (1 - CAST(m.pe_num2 AS DOUBLE)
                        / (CAST(a.n AS DOUBLE) * a.n)), 6) AS kappa
    FROM (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN lang = p THEN c ELSE 0 END) AS BIGINT)
                   AS agree
          FROM cells) a CROSS JOIN marg m
    """,
    tags=("stats", "agreement", "eval"),
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kappa = (po - pe)/(1 - pe) with po = diagonal share and
    pe = sum over classes of (row margin * column margin)/n^2 -- all
    margins exact integers from the <=9-cell confusion table (full
    outer join covers classes missing on one side). One closing
    double expression, identical order both engines."""
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
    cells = pred.groupBy("lang", "p").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("lang") == F.col("p"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    r = cells.groupBy("lang").agg(F.sum("c").cast(_DEC).alias("rt"))
    ccol = cells.groupBy("p").agg(F.sum("c").cast(_DEC).alias("ct"))
    marg = (
        r.join(ccol, r.lang == ccol.p, "full_outer")
        .select(
            F.coalesce(F.col("rt"), F.lit(0).cast(_DEC)).alias("rt"),
            F.coalesce(F.col("ct"), F.lit(0).cast(_DEC)).alias("ct"),
        )
        .agg(F.sum(F.col("rt") * F.col("ct")).cast(_DEC).alias("pe_num2"))
    )
    nd = F.col("n").cast("double")
    po = F.col("agree").cast("double") / nd
    pe = F.col("pe_num2").cast("double") / (nd * nd)
    return a.crossJoin(F.broadcast(marg)).select(
        "n",
        "agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Youden-J optimal threshold on the event-value score.
# ---------------------------------------------------------------------------
@register(
    "youden_j_threshold",
    """
    WITH scored AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS k
      FROM scored GROUP BY v
    ),
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS pos,
                   CAST(sum(c - k) AS BIGINT) AS neg FROM spine),
    cum AS (
      SELECT v,
             t.pos - coalesce(sum(k) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tp,
             t.neg - coalesce(sum(c - k) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fp,
             t.pos, t.neg
      FROM spine CROSS JOIN tot t
    ),
    scored2 AS (
      SELECT v AS threshold_cents,
             CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             CAST((1000000000 * tp) // pos
                  - (1000000000 * fp) // neg AS BIGINT) AS j_e9
      FROM cum WHERE pos > 0 AND neg > 0
    )
    SELECT threshold_cents, tp, fp, j_e9
    FROM scored2 ORDER BY j_e9 DESC, threshold_cents LIMIT 1
    """,
    tags=("ml", "roc", "threshold"),
)
def q_youden_j_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision threshold 'predict purchase when value >= t':
    TP/FP at every distinct score from one cumulative spine pass,
    J = TPR - FPR as an exact e9 integer (floor divisions by the
    class totals), argmax via an ordered limit with the threshold as
    tiebreak. The ROC scan as a spine walk."""
    ev = read_table(spark, sf_dir, "events")
    scored = ev.select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    spine = scored.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("k"),
    )
    tot = spine.agg(
        F.sum("k").cast("bigint").alias("pos"),
        F.sum(F.col("c") - F.col("k")).cast("bigint").alias("neg"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = spine.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.col("pos") - F.coalesce(F.sum("k").over(wv), F.lit(0))).alias("tp"),
        (
            F.col("neg")
            - F.coalesce(F.sum(F.col("c") - F.col("k")).over(wv), F.lit(0))
        ).alias("fp"),
        "pos",
        "neg",
    )
    scored2 = cum.where((F.col("pos") > 0) & (F.col("neg") > 0)).select(
        F.col("v").alias("threshold_cents"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.expr(
            "CAST((1000000000 * tp) DIV pos - (1000000000 * fp) DIV neg AS BIGINT)"
        ).alias("j_e9"),
    )
    return scored2.orderBy(F.col("j_e9").desc(), "threshold_cents").limit(1)
