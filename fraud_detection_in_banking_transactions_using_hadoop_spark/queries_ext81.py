"""Extension batch 81: closed-form ML on exact moments -- 2-feature
ridge regression, a multinomial naive-Bayes language classifier,
2-D Mahalanobis outliers, and partial correlation + VIF.

grouped_ols_trends (ext16) fits 1-feature lines; this batch is the
multivariate step every feature-engineering pipeline hits next. The
engine discipline holds: model "fitting" is nothing but aggregate
moments (XtX, Xty as exact integers via the n-scaled central form
n*sum(ab) - sum(a)*sum(b)), so training distributes as map-side
partial aggregation and the 2x2 solve is constant driver-free math in
the plan itself. Naive Bayes log-scores are e9-scaled integers before
any cross-token sum (the float-sum-order rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_RIDGE_SHRINK = "0.01"  # lambda_j = 0.01 * S_jj (standardized-scale penalty)

# Shared exact-moment CTE: per-order features x1 = line count,
# x2 = total quantity, y = order total cents.
_FEAT_SQL = """
    feat AS (
      SELECT o.o_orderkey AS ok,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x2,
             CAST(round(max(o.o_totalprice) * 100, 0) AS BIGINT) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS sx1,
             CAST(sum(x2) AS HUGEINT) AS sx2,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM feat),
    cmom AS (
      SELECT n,
             CAST(sx1 AS DOUBLE) / n AS m1,
             CAST(sx2 AS DOUBLE) / n AS m2,
             CAST(sy AS DOUBLE) / n AS my,
             CAST(n * s11 - sx1 * sx1 AS DOUBLE) AS c11,
             CAST(n * s12 - sx1 * sx2 AS DOUBLE) AS c12,
             CAST(n * s22 - sx2 * sx2 AS DOUBLE) AS c22,
             CAST(n * s1y - sx1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - sx2 * sy AS DOUBLE) AS c2y,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy
      FROM mom)
"""


def _feat_cmom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row twin of the cmom CTE: exact n-scaled central moments of
    (line count, total quantity, order cents)."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    feat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderkey").alias("ok"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x2"),
            F.round(F.max("o_totalprice") * 100, 0).cast("bigint").alias("y"),
        )
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = feat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast(_DEC).alias("sx1"),
        F.sum("x2").cast(_DEC).alias("sx2"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(d("x1") * d("x1")).cast(_DEC).alias("s11"),
        F.sum(d("x1") * d("x2")).cast(_DEC).alias("s12"),
        F.sum(d("x2") * d("x2")).cast(_DEC).alias("s22"),
        F.sum(d("x1") * d("y")).cast(_DEC).alias("s1y"),
        F.sum(d("x2") * d("y")).cast(_DEC).alias("s2y"),
        F.sum(d("y") * d("y")).cast(_DEC).alias("syy"),
    )
    nd = F.col("n").cast(_DEC)
    return mom.select(
        "n",
        (F.col("sx1").cast("double") / F.col("n")).alias("m1"),
        (F.col("sx2").cast("double") / F.col("n")).alias("m2"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (nd * F.col("s11") - F.col("sx1") * F.col("sx1")).cast("double").alias("c11"),
        (nd * F.col("s12") - F.col("sx1") * F.col("sx2")).cast("double").alias("c12"),
        (nd * F.col("s22") - F.col("sx2") * F.col("sx2")).cast("double").alias("c22"),
        (nd * F.col("s1y") - F.col("sx1") * F.col("sy")).cast("double").alias("c1y"),
        (nd * F.col("s2y") - F.col("sx2") * F.col("sy")).cast("double").alias("c2y"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
    )


# ---------------------------------------------------------------------------
# Ridge regression (2 features, closed form).
# ---------------------------------------------------------------------------
@register(
    "ridge_regression_2d",
    f"""
    WITH {_FEAT_SQL},
    fit AS (
      SELECT n, m1, m2, my, c1y, c2y, cyy,
             (c11 * (1.0 + {_RIDGE_SHRINK}) * (c22 * (1.0 + {_RIDGE_SHRINK}))
              - c12 * c12) AS det,
             (c22 * (1.0 + {_RIDGE_SHRINK}) * c1y - c12 * c2y) AS b1n,
             (c11 * (1.0 + {_RIDGE_SHRINK}) * c2y - c12 * c1y) AS b2n
      FROM cmom)
    SELECT n AS n_orders,
           round(b1n / det / 100.0, 4) + 0.0 AS beta_per_line_dollars,
           round(b2n / det / 100.0, 4) + 0.0 AS beta_per_unit_dollars,
           round((my - b1n / det * m1 - b2n / det * m2) / 100.0, 2) + 0.0
             AS intercept_dollars,
           round((b1n / det * c1y + b2n / det * c2y) / cyy, 6)
             AS variance_explained
    FROM fit
    """,
    tags=("ml", "regression", "exact-arith"),
)
def q_ridge_regression_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge fit of order total on (line count, total
    quantity): beta = (XtX + Lambda)^-1 Xty on n-scaled EXACT central
    moments, with the standardized-scale penalty lambda_j = 0.01 c_jj
    (so shrinkage is unit-free: each diagonal inflates by 1%). The
    2x2 inverse is literal algebra in the plan -- model training IS
    an aggregation, the 100 TB shape every distributed GLM reduces
    to. variance_explained = beta . c_xy / c_yy."""
    cmom = _feat_cmom(spark, sf_dir)
    lam = 1.0 + float(_RIDGE_SHRINK)
    det = (
        F.col("c11") * lam * (F.col("c22") * lam) - F.col("c12") * F.col("c12")
    )
    b1n = F.col("c22") * lam * F.col("c1y") - F.col("c12") * F.col("c2y")
    b2n = F.col("c11") * lam * F.col("c2y") - F.col("c12") * F.col("c1y")
    fit = cmom.select(
        "n", "m1", "m2", "my", "c1y", "c2y", "cyy",
        det.alias("det"), b1n.alias("b1n"), b2n.alias("b2n"),
    )
    b1 = F.col("b1n") / F.col("det")
    b2 = F.col("b2n") / F.col("det")
    return fit.select(
        F.col("n").alias("n_orders"),
        (F.round(b1 / 100.0, 4) + 0.0).alias("beta_per_line_dollars"),
        (F.round(b2 / 100.0, 4) + 0.0).alias("beta_per_unit_dollars"),
        (
            F.round(
                (F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")) / 100.0, 2
            )
            + 0.0
        ).alias("intercept_dollars"),
        F.round((b1 * F.col("c1y") + b2 * F.col("c2y")) / F.col("cyy"), 6).alias(
            "variance_explained"
        ),
    )


# ---------------------------------------------------------------------------
# Multinomial naive Bayes language ID (train = eval corpus).
# ---------------------------------------------------------------------------
@register(
    "naive_bayes_langid",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    cls AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS ntok FROM toks GROUP BY lang),
    vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM toks),
    wc AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM toks
      GROUP BY lang, tok),
    model AS (
      SELECT w.lang, w.tok,
             CAST(floor(1e9 * ln((CAST(w.c AS DOUBLE) + 1.0)
                                 / (CAST(cl.ntok AS DOUBLE) + cl_v.v)) + 0.5)
                  AS BIGINT) AS lp_e9
      FROM wc w
      JOIN cls cl ON cl.lang = w.lang
      CROSS JOIN vocab cl_v),
    grid AS (
      SELECT t.doc_id, t.lang AS true_lang, m.lang AS cand, m.lp_e9
      FROM toks t JOIN model m ON m.tok = t.tok),
    scores AS (
      SELECT doc_id, true_lang, cand,
             CAST(sum(lp_e9) AS HUGEINT) AS score_e9,
             CAST(count(*) AS BIGINT) AS n_scored
      FROM grid GROUP BY doc_id, true_lang, cand),
    pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_e9 DESC, cand) AS rk
      FROM scores)
    SELECT true_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN pred_lang = true_lang THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS accuracy
    FROM pred WHERE rk = 1
    GROUP BY true_lang ORDER BY true_lang
    """,
    tags=("ml", "classifier", "text"),
)
def q_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes over document tokens (add-one
    smoothing, uniform class prior), resubstitution-scored per true
    language: the 'model' is just two grouped counts; every token's
    log-likelihood floors to an e9 integer BEFORE the per-doc sum, so
    the doc score is an exact integer and the argmax (row_number with
    the language tiebreak) is engine-stable. Tokens unseen in a class
    simply don't join for that class -- identical treatment both
    engines. Complements lang_id (heuristic) and langid_confusion
    (its error matrix) with an actually-trained classifier."""
    docs = read_table(spark, sf_dir, "documents")
    # pin: the token explosion feeds FOUR consumers (class totals,
    # vocab, word counts, the scoring grid) -- materialize it once
    # instead of four re-explodes
    toks = (
        docs
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("tok"))
        .localCheckpoint(eager=True)
    )
    cls = toks.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("ntok"))
    vocab = toks.agg(F.countDistinct("tok").cast("bigint").alias("v"))
    wc = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    model = (
        wc.join(F.broadcast(cls), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            F.floor(
                F.lit(1e9)
                * F.log(
                    (F.col("c").cast("double") + 1.0)
                    / (F.col("ntok").cast("double") + F.col("v"))
                )
                + 0.5
            )
            .cast("bigint")
            .alias("lp_e9"),
        )
    )
    grid = toks.join(
        model.withColumnRenamed("lang", "cand"), "tok"
    ).select("doc_id", F.col("lang").alias("true_lang"), "cand", "lp_e9")
    scores = grid.groupBy("doc_id", "true_lang", "cand").agg(
        F.sum(F.col("lp_e9").cast(_DEC)).cast(_DEC).alias("score_e9")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score_e9").desc(), "cand")
    pred = scores.select(
        "doc_id", "true_lang", F.col("cand").alias("pred_lang"),
        F.row_number().over(w).alias("rk"),
    ).where(F.col("rk") == 1)
    return (
        pred.groupBy("true_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum(
                    F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
        .orderBy("true_lang")
    )


# ---------------------------------------------------------------------------
# Mahalanobis 2-D outlier orders.
# ---------------------------------------------------------------------------
@register(
    "mahalanobis_outliers_2d",
    f"""
    WITH {_FEAT_SQL},
    scored AS (
      SELECT f.ok, f.x1, f.x2, f.y, c.n,
             (c.c22 * (CAST(f.x1 AS DOUBLE) - c.m1) * (CAST(f.x1 AS DOUBLE) - c.m1)
              - 2.0 * c.c12 * (CAST(f.x1 AS DOUBLE) - c.m1)
                * (CAST(f.x2 AS DOUBLE) - c.m2)
              + c.c11 * (CAST(f.x2 AS DOUBLE) - c.m2)
                * (CAST(f.x2 AS DOUBLE) - c.m2))
             * c.n * c.n / (c.c11 * c.c22 - c.c12 * c.c12) AS d2
      FROM feat f CROSS JOIN cmom c)
    SELECT CAST(ok AS BIGINT) AS orderkey,
           x1 AS n_lines, x2 AS total_qty,
           round(y / 100.0, 2) AS total_dollars,
           round(d2, 4) AS mahalanobis_sq
    FROM scored ORDER BY d2 DESC, ok LIMIT 5
    """,
    tags=("ml", "outlier", "exact-arith"),
)
def q_mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 outlier orders in the (line count, total quantity) plane
    by squared Mahalanobis distance: d^2 = (x-mu)' Sigma^-1 (x-mu)
    via the 2x2 closed form over the broadcast exact central moments
    (the n^2 factor converts the n-scaled c_ij to covariance scale). Catches
    the 'many lines but tiny quantity' shape that neither marginal
    z-score flags -- the whole point of correlation-aware outliers."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    feat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderkey").alias("ok"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x1"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x2"),
            F.round(F.max("o_totalprice") * 100, 0).cast("bigint").alias("y"),
        )
    )
    cmom = _feat_cmom(spark, sf_dir)
    dx1 = F.col("x1").cast("double") - F.col("m1")
    dx2 = F.col("x2").cast("double") - F.col("m2")
    d2 = (
        (
            F.col("c22") * dx1 * dx1
            - 2.0 * F.col("c12") * dx1 * dx2
            + F.col("c11") * dx2 * dx2
        )
        * F.col("n")
        * F.col("n")
        / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12"))
    )
    scored = feat.crossJoin(F.broadcast(cmom)).select(
        "ok", "x1", "x2", "y", d2.alias("d2")
    )
    return (
        scored.orderBy(F.col("d2").desc(), "ok")
        .limit(5)
        .select(
            F.col("ok").cast("bigint").alias("orderkey"),
            F.col("x1").alias("n_lines"),
            F.col("x2").alias("total_qty"),
            F.round(F.col("y") / 100.0, 2).alias("total_dollars"),
            F.round("d2", 4).alias("mahalanobis_sq"),
        )
    )


# ---------------------------------------------------------------------------
# Partial correlation and VIF of the 2-feature design.
# ---------------------------------------------------------------------------
@register(
    "partial_correlation_vif",
    f"""
    WITH {_FEAT_SQL},
    r AS (
      SELECT n,
             c12 / sqrt(c11 * c22) AS r12,
             c1y / sqrt(c11 * cyy) AS r1y,
             c2y / sqrt(c22 * cyy) AS r2y
      FROM cmom)
    SELECT n AS n_orders,
           round(r12, 6) + 0.0 AS r_lines_qty,
           round(r1y, 6) + 0.0 AS r_lines_total,
           round(r2y, 6) + 0.0 AS r_qty_total,
           round((r1y - r12 * r2y)
                 / sqrt((1.0 - r12 * r12) * (1.0 - r2y * r2y)), 6) + 0.0
             AS partial_r_lines_total_given_qty,
           round(1.0 / (1.0 - r12 * r12), 4) AS vif
    FROM r
    """,
    tags=("ml", "diagnostics", "exact-arith"),
)
def q_partial_correlation_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation r(x1,y | x2) = (r1y - r12 r2y) /
    sqrt((1-r12^2)(1-r2y^2)) and the variance inflation factor
    1/(1-r12^2) for the 2-feature design: does line count predict
    order total BEYOND what quantity already explains, and how
    collinear are the two regressors? Pure ratios of the same exact
    n-scaled central moments as ridge_regression_2d -- the
    multicollinearity screen you run before trusting its betas."""
    cmom = _feat_cmom(spark, sf_dir)
    r = cmom.select(
        "n",
        (F.col("c12") / F.sqrt(F.col("c11") * F.col("c22"))).alias("r12"),
        (F.col("c1y") / F.sqrt(F.col("c11") * F.col("cyy"))).alias("r1y"),
        (F.col("c2y") / F.sqrt(F.col("c22") * F.col("cyy"))).alias("r2y"),
    )
    return r.select(
        F.col("n").alias("n_orders"),
        (F.round("r12", 6) + 0.0).alias("r_lines_qty"),
        (F.round("r1y", 6) + 0.0).alias("r_lines_total"),
        (F.round("r2y", 6) + 0.0).alias("r_qty_total"),
        (
            F.round(
                (F.col("r1y") - F.col("r12") * F.col("r2y"))
                / F.sqrt(
                    (1.0 - F.col("r12") * F.col("r12"))
                    * (1.0 - F.col("r2y") * F.col("r2y"))
                ),
                6,
            )
            + 0.0
        ).alias("partial_r_lines_total_given_qty"),
        F.round(1.0 / (1.0 - F.col("r12") * F.col("r12")), 4).alias("vif"),
    )
