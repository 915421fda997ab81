"""Extension batch 92: DeLong AUC confidence interval, the Murphy
decomposition of the Brier score, and the Hosmer-Lemeshow test.

roc_auc_score gives a POINT estimate; ece_reliability bins one model.
This batch completes model evaluation statistics:

- auc_delong_ci: the DeLong structural-components variance -- per-
  positive and per-negative placement values are exact integers when
  DOUBLED (2*below + ties on the score spine), so AUC, both
  component variances, and the 95% CI close over exact integer sums.
  No bootstrap, no pair enumeration.
- brier_decomposition: Brier = reliability - resolution +
  uncertainty (Murphy). The forecaster is the per-weekday train
  share p_hat = k/n (a rational), so every test-side term is an
  exact cross-multiplied integer ratio, e9-floored per weekday
  before the 7-term sums.
- hosmer_lemeshow: the classic grouped calibration chi-square
  sum (O - n p)^2 / (n p (1 - p)) over the same weekday bins --
  significant means the probability model misfits even if AUC looks
  fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TEST_DAYS = 91


# ---------------------------------------------------------------------------
# DeLong CI for the purchase-vs-value AUC.
# ---------------------------------------------------------------------------
@register(
    "auc_delong_ci",
    """
    WITH arms AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(y) AS BIGINT) AS c1
      FROM arms GROUP BY v),
    pre AS (
      SELECT v, c, c1, c - c1 AS c0,
             coalesce(sum(c1) OVER w, 0) AS b1,
             coalesce(sum(c - c1) OVER w, 0) AS b0
      FROM spine
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING)),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c - c1) AS BIGINT) AS n0
      FROM spine),
    plc AS (
      SELECT p.c1, p.c0,
             CAST(2 * p.b0 + p.c0 AS BIGINT) AS p10,
             CAST(2 * (t.n1 - p.b1 - p.c1) + p.c1 AS BIGINT) AS p01,
             t.n1, t.n0
      FROM pre p CROSS JOIN tot t),
    sums AS (
      SELECT max(n1) AS n1, max(n0) AS n0,
             CAST(sum(CAST(c1 AS HUGEINT) * p10) AS HUGEINT) AS s10,
             CAST(sum(CAST(c1 AS HUGEINT) * p10 * p10) AS HUGEINT) AS q10,
             CAST(sum(CAST(c0 AS HUGEINT) * p01) AS HUGEINT) AS s01,
             CAST(sum(CAST(c0 AS HUGEINT) * p01 * p01) AS HUGEINT) AS q01
      FROM plc),
    c AS (
      SELECT n1, n0,
             CAST(s10 AS DOUBLE) / (2.0 * n0) / n1 AS auc,
             (CAST(n1 AS DOUBLE) * q10 - CAST(s10 AS DOUBLE) * s10)
               / (CAST(n1 AS DOUBLE) * (n1 - 1))
               / (4.0 * CAST(n0 AS DOUBLE) * n0) / n1 AS v10,
             (CAST(n0 AS DOUBLE) * q01 - CAST(s01 AS DOUBLE) * s01)
               / (CAST(n0 AS DOUBLE) * (n0 - 1))
               / (4.0 * CAST(n1 AS DOUBLE) * n1) / n0 AS v01
      FROM sums)
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           round(auc, 6) AS auc,
           round(sqrt(v10 + v01), 6) AS delong_se,
           round(auc - 1.96 * sqrt(v10 + v01), 6) AS ci_low,
           round(auc + 1.96 * sqrt(v10 + v01), 6) AS ci_high
    FROM c
    """,
    tags=("ml", "metric", "exact-arith"),
)
def q_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong variance for the purchase-vs-value AUC: each positive's
    DOUBLED placement 2*(negatives below) + (ties) and each
    negative's mirror are exact spine integers, so AUC = mean
    placement and the two structural-component variances S10/n1 +
    S01/n0 are exact integer algebra until the final doubles. The CI
    roc_auc_score can't give without bootstrapping -- in one pass."""
    ev = read_table(spark, sf_dir, "events")
    arms = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    spine = arms.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("c1"),
    )
    pre = with_global_rank(
        spine.withColumn("c0", F.col("c") - F.col("c1")),
        "v",
        [F.col("v")],
        prefix_sum={"cc1": "c1", "cc0": "c0"},
        bucket_bits=12,  # event-value cents: small domain (r13)
    ).select(
        "c1",
        "c0",
        (F.col("cc1") - F.col("c1")).alias("b1"),
        (F.col("cc0") - F.col("c0")).alias("b0"),
    )
    tot = spine.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("bigint").alias("n0"),
    )
    plc = pre.crossJoin(F.broadcast(tot)).select(
        "c1",
        "c0",
        (2 * F.col("b0") + F.col("c0")).cast("bigint").alias("p10"),
        (2 * (F.col("n1") - F.col("b1") - F.col("c1")) + F.col("c1"))
        .cast("bigint")
        .alias("p01"),
        "n1",
        "n0",
    )
    sums = plc.agg(
        F.max("n1").alias("n1"),
        F.max("n0").alias("n0"),
        F.sum(F.col("c1").cast(_DEC) * F.col("p10").cast(_DEC)).cast(_DEC).alias("s10"),
        F.sum(
            F.col("c1").cast(_DEC) * F.col("p10").cast(_DEC) * F.col("p10").cast(_DEC)
        )
        .cast(_DEC)
        .alias("q10"),
        F.sum(F.col("c0").cast(_DEC) * F.col("p01").cast(_DEC)).cast(_DEC).alias("s01"),
        F.sum(
            F.col("c0").cast(_DEC) * F.col("p01").cast(_DEC) * F.col("p01").cast(_DEC)
        )
        .cast(_DEC)
        .alias("q01"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    auc = F.col("s10").cast("double") / (2.0 * F.col("n0")) / F.col("n1")
    v10 = (
        (n1d * F.col("q10").cast("double") - F.col("s10").cast("double") * F.col("s10"))
        / (n1d * (F.col("n1") - 1))
        / (4.0 * n0d * F.col("n0"))
        / F.col("n1")
    )
    v01 = (
        (n0d * F.col("q01").cast("double") - F.col("s01").cast("double") * F.col("s01"))
        / (n0d * (F.col("n0") - 1))
        / (4.0 * n1d * F.col("n1"))
        / F.col("n0")
    )
    c = sums.select("n1", "n0", auc.alias("auc"), v10.alias("v10"), v01.alias("v01"))
    se = F.sqrt(F.col("v10") + F.col("v01"))
    return c.select(
        F.col("n1").cast("bigint").alias("n_pos"),
        F.col("n0").cast("bigint").alias("n_neg"),
        F.round("auc", 6).alias("auc"),
        F.round(se, 6).alias("delong_se"),
        F.round(F.col("auc") - 1.96 * se, 6).alias("ci_low"),
        F.round(F.col("auc") + 1.96 * se, 6).alias("ci_high"),
    )


_DOW_MODEL_SQL = f"""
    d AS (
      SELECT o_orderdate AS dt, dayofweek(o_orderdate) % 7 AS dow,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders),
    cutoff AS (
      SELECT max(dt) - INTERVAL {_TEST_DAYS} DAY AS co FROM d),
    train AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS k
      FROM d WHERE dt <= (SELECT co FROM cutoff) GROUP BY dow),
    test AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS nt,
             CAST(sum(y) AS BIGINT) AS kt
      FROM d WHERE dt > (SELECT co FROM cutoff) GROUP BY dow),
    j AS (
      SELECT t.dow, t.nt, t.kt, r.n, r.k
      FROM test t JOIN train r ON t.dow = r.dow)
"""


def _dow_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = orders.select(
        F.col("o_orderdate").alias("dt"),
        (F.dayofweek("o_orderdate") % 7).alias("dow"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    cutoff = d.agg(F.date_sub(F.max("dt"), _TEST_DAYS).alias("co"))
    dc = d.crossJoin(F.broadcast(cutoff))
    train = dc.where(F.col("dt") <= F.col("co")).groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("k"),
    )
    test = dc.where(F.col("dt") > F.col("co")).groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("nt"),
        F.sum("y").cast("bigint").alias("kt"),
    )
    return test.join(train, "dow").select("dow", "nt", "kt", "n", "k")


# ---------------------------------------------------------------------------
# Brier score with the Murphy decomposition.
# ---------------------------------------------------------------------------
@register(
    "brier_decomposition",
    f"""
    WITH {_DOW_MODEL_SQL},
    tot AS (
      SELECT CAST(sum(nt) AS BIGINT) AS ntot, CAST(sum(kt) AS BIGINT) AS ktot
      FROM j),
    terms AS (
      SELECT
        CAST(sum(CAST(floor(1e9 * ((CAST(nt AS DOUBLE) * k * k
                 - 2.0 * CAST(k AS DOUBLE) * n * kt
                 + CAST(kt AS DOUBLE) * n * n)
                 / (CAST(n AS DOUBLE) * n)) + 0.5) AS BIGINT)) AS HUGEINT)
          AS brier_num_e9,
        CAST(sum(CAST(floor(1e9 * (CAST(nt AS DOUBLE)
                 * (CAST(k AS DOUBLE) / n - CAST(kt AS DOUBLE) / nt)
                 * (CAST(k AS DOUBLE) / n - CAST(kt AS DOUBLE) / nt)) + 0.5)
                 AS BIGINT)) AS HUGEINT) AS rel_e9,
        CAST(sum(CAST(floor(1e9 * (CAST(nt AS DOUBLE)
                 * (CAST(kt AS DOUBLE) / nt
                    - CAST((SELECT ktot FROM tot) AS DOUBLE)
                      / (SELECT ntot FROM tot))
                 * (CAST(kt AS DOUBLE) / nt
                    - CAST((SELECT ktot FROM tot) AS DOUBLE)
                      / (SELECT ntot FROM tot))) + 0.5) AS BIGINT)) AS HUGEINT)
          AS res_e9
      FROM j)
    SELECT t.ntot AS n_test,
           round(CAST(tm.brier_num_e9 AS DOUBLE) / 1e9 / t.ntot, 6) AS brier,
           round(CAST(tm.rel_e9 AS DOUBLE) / 1e9 / t.ntot, 6) AS reliability,
           round(CAST(tm.res_e9 AS DOUBLE) / 1e9 / t.ntot, 6) AS resolution,
           round(CAST(t.ktot AS DOUBLE) / t.ntot
                 * (1.0 - CAST(t.ktot AS DOUBLE) / t.ntot), 6) AS uncertainty
    FROM terms tm CROSS JOIN tot t
    """,
    tags=("ml", "proper-scoring", "exact-arith"),
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the per-weekday URGENT-share forecaster on the
    91-day test window, Murphy-decomposed: Brier = reliability
    (calibration gap) - resolution (sharpness) + uncertainty (base
    rate). Each weekday's contribution is a rational in exact
    integers (sum (p-y)^2 = (nt k^2 - 2 k n kt + kt n^2)/n^2),
    e9-floored before the 7-term sums. Tells you WHY a Brier score is
    bad -- miscalibration or no signal."""
    j = _dow_model(spark, sf_dir)
    tot = j.agg(
        F.sum("nt").cast("bigint").alias("ntot"),
        F.sum("kt").cast("bigint").alias("ktot"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    ntd = F.col("nt").cast("double")
    brier_term = (
        ntd * F.col("k") * F.col("k")
        - 2.0 * F.col("k").cast("double") * F.col("n") * F.col("kt")
        + F.col("kt").cast("double") * F.col("n") * F.col("n")
    ) / (F.col("n").cast("double") * F.col("n"))
    phat = F.col("k").cast("double") / F.col("n")
    obar = F.col("kt").cast("double") / F.col("nt")
    gbar = F.col("ktot").cast("double") / F.col("ntot")
    rel_term = ntd * (phat - obar) * (phat - obar)
    res_term = ntd * (obar - gbar) * (obar - gbar)
    terms = jt.agg(
        F.sum(F.floor(F.lit(1e9) * brier_term + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("brier_num_e9"),
        F.sum(F.floor(F.lit(1e9) * rel_term + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("rel_e9"),
        F.sum(F.floor(F.lit(1e9) * res_term + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("res_e9"),
    )
    out = terms.crossJoin(F.broadcast(tot))
    gb = F.col("ktot").cast("double") / F.col("ntot")
    return out.select(
        F.col("ntot").alias("n_test"),
        F.round(F.col("brier_num_e9").cast("double") / 1e9 / F.col("ntot"), 6).alias(
            "brier"
        ),
        F.round(F.col("rel_e9").cast("double") / 1e9 / F.col("ntot"), 6).alias(
            "reliability"
        ),
        F.round(F.col("res_e9").cast("double") / 1e9 / F.col("ntot"), 6).alias(
            "resolution"
        ),
        F.round(gb * (1.0 - gb), 6).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# Hosmer-Lemeshow calibration chi-square on the weekday bins.
# ---------------------------------------------------------------------------
@register(
    "hosmer_lemeshow",
    f"""
    WITH {_DOW_MODEL_SQL},
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(CAST(floor(1e9 *
               ((CAST(kt AS DOUBLE) * n - CAST(nt AS DOUBLE) * k)
                * (CAST(kt AS DOUBLE) * n - CAST(nt AS DOUBLE) * k)
                / (CAST(nt AS DOUBLE) * k * (n - k))) + 0.5) AS BIGINT))
               AS HUGEINT) AS hl_e9
      FROM j WHERE k > 0 AND k < n)
    SELECT CAST(g AS INTEGER) AS n_bins,
           round(CAST(hl_e9 AS DOUBLE) / 1e9, 4) AS hl_stat,
           CAST(g - 2 AS INTEGER) AS dof
    FROM terms
    """,
    tags=("ml", "calibration", "exact-arith"),
)
def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow chi-square of the weekday forecaster on the
    test window: sum (O - n p)^2 / (n p (1-p)) with p = k/n from
    train -- the cross-multiplied form (kt n - nt k)^2 / (nt k (n-k))
    keeps every bin's term an exact integer ratio, e9-floored before
    the sum. dof = bins - 2 by the standard convention. The grouped
    misfit test that complements brier_decomposition's reliability
    term with an actual significance scale."""
    j = _dow_model(spark, sf_dir)
    term = (
        (F.col("kt").cast("double") * F.col("n") - F.col("nt").cast("double") * F.col("k"))
        * (F.col("kt").cast("double") * F.col("n") - F.col("nt").cast("double") * F.col("k"))
        / (F.col("nt").cast("double") * F.col("k") * (F.col("n") - F.col("k")))
    )
    terms = j.where((F.col("k") > 0) & (F.col("k") < F.col("n"))).agg(
        F.count(F.lit(1)).cast("bigint").alias("g"),
        F.sum(F.floor(F.lit(1e9) * term + 0.5).cast("bigint")).cast(_DEC).alias(
            "hl_e9"
        ),
    )
    return terms.select(
        F.col("g").cast("int").alias("n_bins"),
        F.round(F.col("hl_e9").cast("double") / 1e9, 4).alias("hl_stat"),
        (F.col("g") - 2).cast("int").alias("dof"),
    )
