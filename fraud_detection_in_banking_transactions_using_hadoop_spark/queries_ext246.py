"""Extension batch 246 (round 11): data-curation + risk-backtest
completions.

- dsir_importance_weights: Data Selection via Importance Resampling
  (the 2023 pretraining-curation method) in its unigram bag form: the
  importance weight of a document is sum_w n_w(d) * [ln p_target(w) -
  ln p_source(w)] under Laplace-smoothed bag models fit on a target
  domain (embedding label < 2, joined 1:1 on doc_id == vec_id) vs the
  rest. The vocabulary is structurally tiny (31 types), so each ln
  runs ONCE per (word, side) on an exact rational and is e9-quantized
  (the ext236 cell discipline); per-doc weights are exact integer
  dot products and the top-20 selection is TakeOrdered -- the
  100 TB resampling pass is one broadcast-dictionary scan.

- christoffersen_var_backtest: completes the VaR backtest pair next
  to Kupiec (unconditional coverage, r6): the conditional-coverage
  test adds the INDEPENDENCE component -- exceedances of the train-
  window p05 revenue threshold form a 0/1 sequence whose transition
  counts n00/n01/n10/n11 give LR_ind = 2[lnL1 - lnL0] under the
  Markov vs pooled-binomial models; LR_cc = LR_uc + LR_ind. All
  counts exact; each ln runs once per cell on an exact rational
  (0 ln 0 = 0 convention in shared CASE text); e9 outputs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "dsir_importance_weights",
    """
    WITH dom AS (
      SELECT d.doc_id, d.text,
             CASE WHEN e.label < 2 THEN 1 ELSE 0 END AS is_target
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
    toks AS (
      SELECT doc_id, is_target, unnest(string_split(text, ' ')) AS w
      FROM dom),
    wc AS (
      SELECT doc_id, is_target, w, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2, 3),
    vocab AS (
      SELECT w,
             CAST(sum(CASE WHEN is_target = 1 THEN c ELSE 0 END) AS BIGINT)
               AS tw,
             CAST(sum(CASE WHEN is_target = 0 THEN c ELSE 0 END) AS BIGINT)
               AS sw
      FROM wc GROUP BY w),
    tots AS (
      SELECT CAST(sum(tw) AS BIGINT) AS tt, CAST(sum(sw) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS v
      FROM vocab),
    lw AS (
      SELECT w,
             CAST(floor(1e9 * (ln((CAST(tw AS DOUBLE) + 1) / (t.tt + t.v))
                               - ln((CAST(sw AS DOUBLE) + 1) / (t.ss + t.v)))
                  + 0.5) AS BIGINT) AS lr_e9
      FROM vocab CROSS JOIN tots t),
    dw AS (
      SELECT wc.doc_id, wc.is_target,
             CAST(sum(wc.c) AS BIGINT) AS n_tokens,
             CAST(sum(wc.c * lw.lr_e9) AS BIGINT) AS weight_e9
      FROM wc JOIN lw ON lw.w = wc.w
      GROUP BY wc.doc_id, wc.is_target)
    SELECT doc_id, is_target, n_tokens, weight_e9
    FROM dw
    ORDER BY weight_e9 DESC, doc_id
    LIMIT 20
    """,
    tags=("llm", "data-curation", "importance-sampling", "exact-arith"),
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by DSIR importance weight toward the
    label<2 target domain (module docstring): broadcast word table,
    exact integer dot products, TakeOrdered selection."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    dom = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "text",
        F.when(F.col("label") < 2, 1).otherwise(0).alias("is_target"),
    )
    wc = (
        dom.select(
            "doc_id", "is_target", F.explode(F.split("text", " ")).alias("w")
        )
        .groupBy("doc_id", "is_target", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    vocab = wc.groupBy("w").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("tw"),
        F.sum(F.when(F.col("is_target") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sw"),
    )
    tots = vocab.agg(
        F.sum("tw").cast("bigint").alias("tt"),
        F.sum("sw").cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lw = vocab.crossJoin(F.broadcast(tots)).select(
        "w",
        F.expr(
            "CAST(floor(1e9 * (ln((CAST(tw AS DOUBLE) + 1) / (tt + v))"
            " - ln((CAST(sw AS DOUBLE) + 1) / (ss + v))) + 0.5) AS BIGINT)"
        ).alias("lr_e9"),
    )
    dw = (
        wc.join(F.broadcast(lw), "w")
        .groupBy("doc_id", "is_target")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("c * lr_e9")).cast("bigint").alias("weight_e9"),
        )
    )
    return dw.orderBy(F.desc("weight_e9"), "doc_id").limit(20)


@register(
    "christoffersen_var_backtest",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents,
             row_number() OVER (ORDER BY o_orderdate) AS rn
      FROM orders GROUP BY o_orderdate),
    thr AS (
      SELECT CAST(quantile_disc(cents, 0.05) AS BIGINT) AS q
      FROM daily WHERE rn <= 20),
    ex AS (
      SELECT rn, CASE WHEN cents <= t.q THEN 1 ELSE 0 END AS x
      FROM daily CROSS JOIN thr t WHERE rn > 20),
    tr AS (
      SELECT x AS cur, lead(x) OVER (ORDER BY rn) AS nxt FROM ex),
    cnt AS (
      SELECT CAST(sum(CASE WHEN cur = 0 AND nxt = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00,
             CAST(sum(CASE WHEN cur = 0 AND nxt = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(sum(CASE WHEN cur = 1 AND nxt = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(sum(CASE WHEN cur = 1 AND nxt = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11
      FROM tr WHERE nxt IS NOT NULL),
    lr AS (
      SELECT n00, n01, n10, n11,
             n00 + n01 + n10 + n11 AS n,
             n01 + n11 AS ones
      FROM cnt)
    SELECT n00, n01, n10, n11,
           -- LR_ind = 2 [ sum n_ab ln(n_ab / n_a.) - (n.0 ln pi0bar
           --  + n.1 ln pi1bar) ] with 0 ln 0 = 0, e9-quantized terms
           CAST(
             2 * (
               CASE WHEN n00 = 0 THEN 0 ELSE
                 CAST(floor(1e9 * n00 * ln(CAST(n00 AS DOUBLE)
                   / (n00 + n01)) + 0.5) AS BIGINT) END
             + CASE WHEN n01 = 0 THEN 0 ELSE
                 CAST(floor(1e9 * n01 * ln(CAST(n01 AS DOUBLE)
                   / (n00 + n01)) + 0.5) AS BIGINT) END
             + CASE WHEN n10 = 0 THEN 0 ELSE
                 CAST(floor(1e9 * n10 * ln(CAST(n10 AS DOUBLE)
                   / (n10 + n11)) + 0.5) AS BIGINT) END
             + CASE WHEN n11 = 0 THEN 0 ELSE
                 CAST(floor(1e9 * n11 * ln(CAST(n11 AS DOUBLE)
                   / (n10 + n11)) + 0.5) AS BIGINT) END
             - CASE WHEN n - ones = 0 THEN 0 ELSE
                 CAST(floor(1e9 * (n - ones) * ln(CAST(n - ones AS DOUBLE)
                   / n) + 0.5) AS BIGINT) END
             - CASE WHEN ones = 0 THEN 0 ELSE
                 CAST(floor(1e9 * ones * ln(CAST(ones AS DOUBLE) / n) + 0.5)
                 AS BIGINT) END
             ) AS BIGINT) AS lr_ind_e9
    FROM lr
    """,
    tags=("risk", "var-backtest", "exact-arith"),
)
def q_christoffersen_var_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Christoffersen independence component of the VaR conditional-
    coverage backtest (module docstring): exceedance transitions of
    the train-window p05 threshold, per-cell e9 ln terms."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).select("*", F.row_number().over(Window.orderBy("d")).alias("rn"))
    thr = daily.where("rn <= 20").agg(
        F.expr(
            "CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)"
            " AS BIGINT)"
        ).alias("q")
    )
    ex = daily.where("rn > 20").crossJoin(F.broadcast(thr)).select(
        "rn", F.when(F.col("cents") <= F.col("q"), 1).otherwise(0).alias("x")
    )
    tr = ex.select(
        F.col("x").alias("cur"),
        F.lead("x").over(Window.orderBy("rn")).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    cnt = tr.agg(
        *[
            F.sum(
                F.when((F.col("cur") == a) & (F.col("nxt") == b), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"n{a}{b}")
            for a in (0, 1)
            for b in (0, 1)
        ]
    )
    term = (
        "CASE WHEN {c} = 0 THEN 0 ELSE"
        " CAST(floor(1e9 * {c} * ln(CAST({c} AS DOUBLE) / ({d})) + 0.5)"
        " AS BIGINT) END"
    )
    return cnt.selectExpr(
        "n00",
        "n01",
        "n10",
        "n11",
        "CAST(2 * ("
        + term.format(c="n00", d="n00 + n01")
        + " + "
        + term.format(c="n01", d="n00 + n01")
        + " + "
        + term.format(c="n10", d="n10 + n11")
        + " + "
        + term.format(c="n11", d="n10 + n11")
        + " - "
        + term.format(c="(n00 + n10)", d="n00 + n01 + n10 + n11")
        + " - "
        + term.format(c="(n01 + n11)", d="n00 + n01 + n10 + n11")
        + ") AS BIGINT) AS lr_ind_e9",
    )
