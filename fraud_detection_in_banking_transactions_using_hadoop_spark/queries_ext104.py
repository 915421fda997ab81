"""Extension batch 104: equalized-odds fairness gaps, the
cost-optimal decision threshold, and importance-weight effective
sample size under covariate shift.

- equalized_odds_gap: disparate_impact_audit (ext103) checked
  OUTCOMES; equalized odds checks the ERROR RATES of a classifier
  across groups -- TPR and FPR gaps of the value-over-median rule
  between the two user cohorts, every rate an exact integer ratio.
- optimal_threshold_cost: youden_j maximizes a clinical tradeoff;
  production systems minimize EXPECTED COST. With FP cost 1 and FN
  cost 5, the per-threshold cost FP + 5 FN is an exact integer on
  the score spine's prefix counts, so the argmin threshold is
  engine-exact -- no ROC eyeballing.
- importance_weight_ess: reweighting train to match test under
  covariate shift costs effective sample size: with decile-bin
  density-ratio weights the Kish ESS collapses to the closed form
  T^2 / sum(t_b^2 / n_b) -- exact integers until one division. An
  ESS ratio far below 1 says the shift is too large to reweight
  away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_FN_COST = 5
_EV_TEST_DAYS = 7  # events span ~30 days


# ---------------------------------------------------------------------------
# Equalized-odds gaps of the value-over-median purchase classifier.
# ---------------------------------------------------------------------------
@register(
    "equalized_odds_gap",
    """
    WITH ev AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events),
    spine AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY v),
    ranked AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    med AS (
      SELECT min(v) AS m FROM ranked
      WHERE 2 * cc >= (SELECT CAST(sum(c) AS BIGINT) FROM spine)),
    cells AS (
      SELECT grp,
             CAST(sum(CASE WHEN y = 1 AND v > (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN y = 1 AND v <= (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN y = 0 AND v > (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y = 0 AND v <= (SELECT m FROM med)
                           THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM ev GROUP BY grp),
    g0 AS (SELECT * FROM cells WHERE grp = 0),
    g1 AS (SELECT * FROM cells WHERE grp = 1)
    SELECT round(CAST(g0.tp AS DOUBLE) / (g0.tp + g0.fn), 6) AS tpr_group0,
           round(CAST(g1.tp AS DOUBLE) / (g1.tp + g1.fn), 6) AS tpr_group1,
           round(CAST(g1.tp AS DOUBLE) / (g1.tp + g1.fn)
                 - CAST(g0.tp AS DOUBLE) / (g0.tp + g0.fn), 6) + 0.0
             AS tpr_gap,
           round(CAST(g0.fp AS DOUBLE) / (g0.fp + g0.tn), 6) AS fpr_group0,
           round(CAST(g1.fp AS DOUBLE) / (g1.fp + g1.tn), 6) AS fpr_group1,
           round(CAST(g1.fp AS DOUBLE) / (g1.fp + g1.tn)
                 - CAST(g0.fp AS DOUBLE) / (g0.fp + g0.tn), 6) + 0.0
             AS fpr_gap
    FROM g0 CROSS JOIN g1
    """,
    tags=("fairness", "classifier", "exact-arith"),
)
def q_equalized_odds_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalized odds for the value-over-median purchase rule across
    the two user-parity cohorts: TPR and FPR per group from exact
    integer confusion cells (median = exact spine order statistic),
    and the gaps that the fairness definition demands be ~0. A big
    TPR gap with equal outcomes is exactly the failure
    disparate-impact checks miss."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    spine = ev.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"})
    ntot = spine.agg(F.sum("c").cast("bigint").alias("nn"))
    med = (
        ranked.crossJoin(F.broadcast(ntot))
        .where(2 * F.col("cc") >= F.col("nn"))
        .agg(F.min("v").alias("m"))
    )
    cells = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(F.when((F.col("y") == 1) & (F.col("v") > F.col("m")), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when((F.col("y") == 1) & (F.col("v") <= F.col("m")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
            F.sum(F.when((F.col("y") == 0) & (F.col("v") > F.col("m")), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when((F.col("y") == 0) & (F.col("v") <= F.col("m")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tn"),
        )
    )
    g0 = cells.where(F.col("grp") == 0).alias("g0")
    g1 = cells.where(F.col("grp") == 1).alias("g1")
    j = g0.crossJoin(F.broadcast(g1))
    tpr0 = F.col("g0.tp").cast("double") / (F.col("g0.tp") + F.col("g0.fn"))
    tpr1 = F.col("g1.tp").cast("double") / (F.col("g1.tp") + F.col("g1.fn"))
    fpr0 = F.col("g0.fp").cast("double") / (F.col("g0.fp") + F.col("g0.tn"))
    fpr1 = F.col("g1.fp").cast("double") / (F.col("g1.fp") + F.col("g1.tn"))
    return j.select(
        F.round(tpr0, 6).alias("tpr_group0"),
        F.round(tpr1, 6).alias("tpr_group1"),
        (F.round(tpr1 - tpr0, 6) + 0.0).alias("tpr_gap"),
        F.round(fpr0, 6).alias("fpr_group0"),
        F.round(fpr1, 6).alias("fpr_group1"),
        (F.round(fpr1 - fpr0, 6) + 0.0).alias("fpr_gap"),
    )


# ---------------------------------------------------------------------------
# Cost-optimal decision threshold on the score spine.
# ---------------------------------------------------------------------------
@register(
    "optimal_threshold_cost",
    f"""
    WITH ev AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(y) AS BIGINT) AS c1
      FROM ev GROUP BY v),
    pre AS (
      SELECT v,
             coalesce(sum(c1) OVER w, 0) AS pos_below,
             coalesce(sum(c - c1) OVER w, 0) AS neg_below
      FROM spine
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING)),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS p, CAST(sum(c - c1) AS BIGINT) AS ng
      FROM spine),
    costs AS (
      SELECT p.v,
             CAST(t.ng - p.neg_below AS BIGINT) AS fp,
             CAST(p.pos_below AS BIGINT) AS fn,
             CAST((t.ng - p.neg_below) + {_FN_COST} * p.pos_below AS BIGINT)
               AS cost
      FROM pre p CROSS JOIN tot t)
    SELECT round(v / 100.0, 2) AS threshold_dollars,
           fp AS n_false_pos, fn AS n_false_neg,
           cost AS total_cost,
           (SELECT CAST({_FN_COST} * p AS BIGINT) FROM tot)
             AS predict_none_cost,
           round(CAST(cost AS DOUBLE)
                 / (SELECT {_FN_COST} * p FROM tot), 4) AS cost_ratio
    FROM costs ORDER BY cost, v LIMIT 1
    """,
    tags=("ml", "decision-theory", "exact-arith"),
)
def q_optimal_threshold_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-minimizing threshold for 'predict purchase iff value >= t'
    with FN cost {_FN_COST}x the FP cost: at every spine value the
    cost FP + {_FN_COST} FN is an exact integer from prefix counts
    (predict-positive at v includes v itself), so the argmin with the
    value tiebreak is engine-exact. cost_ratio benchmarks against the
    do-nothing policy -- the number a deployment decision actually
    turns on."""
    ev = read_table(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    spine = ev.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("c1"),
    )
    pre = with_global_rank(
        spine.withColumn("c0", F.col("c") - F.col("c1")),
        "v",
        [F.col("v")],
        prefix_sum={"cp": "c1", "cn": "c0"},
    ).select(
        "v",
        (F.col("cp") - F.col("c1")).alias("pos_below"),
        (F.col("cn") - F.col("c0")).alias("neg_below"),
    )
    tot = spine.agg(
        F.sum("c1").cast("bigint").alias("p"),
        F.sum(F.col("c") - F.col("c1")).cast("bigint").alias("ng"),
    )
    costs = pre.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.col("ng") - F.col("neg_below")).cast("bigint").alias("fp"),
        F.col("pos_below").cast("bigint").alias("fn"),
        ((F.col("ng") - F.col("neg_below")) + _FN_COST * F.col("pos_below"))
        .cast("bigint")
        .alias("cost"),
        (_FN_COST * F.col("p")).cast("bigint").alias("predict_none_cost"),
    )
    return (
        costs.orderBy("cost", "v")
        .limit(1)
        .select(
            F.round(F.col("v") / 100.0, 2).alias("threshold_dollars"),
            F.col("fp").alias("n_false_pos"),
            F.col("fn").alias("n_false_neg"),
            F.col("cost").alias("total_cost"),
            "predict_none_cost",
            F.round(
                F.col("cost").cast("double") / F.col("predict_none_cost"), 4
            ).alias("cost_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Importance-weight ESS under the train/test covariate shift.
# ---------------------------------------------------------------------------
@register(
    "importance_weight_ess",
    f"""
    WITH ev AS (
      SELECT ts, CAST(round(value * 100, 0) AS BIGINT) AS v FROM events),
    cutoff AS (SELECT max(ts) - INTERVAL {_EV_TEST_DAYS} DAY AS co FROM ev),
    sp AS (
      SELECT v, ts > (SELECT co FROM cutoff) AS is_test,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ev GROUP BY v, ts > (SELECT co FROM cutoff)),
    edges AS (
      SELECT tile, CAST(max(v) AS BIGINT) AS edge
      FROM (
        SELECT v, ntile(10) OVER (ORDER BY v, rn) AS tile
        FROM (
          SELECT v, row_number() OVER (ORDER BY v) AS rn
          FROM ev, cutoff WHERE ts <= co) y) x
      WHERE tile < 10 GROUP BY tile),
    binned AS (
      SELECT s.v, s.is_test, s.cnt,
             (SELECT CAST(count(*) AS BIGINT) FROM edges e
              WHERE s.v > e.edge) AS bin
      FROM sp s),
    per AS (
      SELECT bin,
             CAST(sum(CASE WHEN is_test THEN 0 ELSE cnt END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN is_test THEN cnt ELSE 0 END) AS BIGINT) AS tb
      FROM binned GROUP BY bin),
    tot AS (
      SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(tb) AS BIGINT) AS t
      FROM per),
    ess AS (
      SELECT CAST(sum((1000000 * tb * tb) // nb) AS HUGEINT) AS s_e6,
             max(CAST(tb AS DOUBLE) / nb) AS rmax
      FROM per WHERE nb > 0)
    SELECT t.n AS n_train, t.t AS n_test,
           round(CAST(t.t AS DOUBLE) * t.t
                 / (CAST(e.s_e6 AS DOUBLE) / 1e6), 2) AS ess,
           round(CAST(t.t AS DOUBLE) * t.t
                 / (CAST(e.s_e6 AS DOUBLE) / 1e6) / t.n, 4) AS ess_ratio,
           round(e.rmax * t.n / t.t, 4) AS max_weight
    FROM tot t CROSS JOIN ess e
    """,
    tags=("drift", "reweighting", "exact-arith"),
)
def q_importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of density-ratio reweighting the
    PRE-cutoff events to match the last-7-day distribution: bins are
    the train value deciles (edges = exact order statistics), weights
    w_b = (t_b/T)/(n_b/N), and the ESS closes to the exact form
    T^2 / sum(t_b^2/n_b) (e6-scaled floor divisions per bin).
    ess_ratio = ESS/N(train) (<= 1 by Cauchy-Schwarz); near 1 = benign
    shift, far below 1 = the reweighted 'sample' is an illusion. max_weight flags the dominating bin."""
    ev = read_table(spark, sf_dir, "events").select(
        "ts", F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    )
    cutoff = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {_EV_TEST_DAYS} DAYS")).alias("co")
    )
    marked = ev.crossJoin(F.broadcast(cutoff)).select(
        "v", (F.col("ts") > F.col("co")).alias("is_test")
    )
    sp = marked.groupBy("v", "is_test").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tr_rows = marked.where(~F.col("is_test")).select("v")
    ntr = tr_rows.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    ranked = (
        with_global_rank(
            tr_rows.withColumn("one", F.lit(1)), "v", [F.col("v")]
        )
        .crossJoin(F.broadcast(ntr))
        .select(
            "v",
            ntile_from_rank(F.col("global_rank"), F.col("nn"), 10)
            .cast("bigint")
            .alias("tile"),
        )
    )
    edges = (
        ranked.where(F.col("tile") < 10)
        .groupBy("tile")
        .agg(F.max("v").cast("bigint").alias("edge"))
    )
    binned = (
        sp.crossJoin(F.broadcast(edges.select("edge")))
        .groupBy("v", "is_test", "cnt")
        .agg(
            F.sum(F.when(F.col("v") > F.col("edge"), 1).otherwise(0))
            .cast("bigint")
            .alias("bin")
        )
    )
    per = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_test"), 0).otherwise(F.col("cnt")))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(F.col("is_test"), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("tb"),
    )
    tot = per.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.sum("tb").cast("bigint").alias("t"),
    )
    ess = per.where(F.col("nb") > 0).agg(
        F.sum(F.expr("(1000000 * tb * tb) DIV nb")).cast(_DEC).alias("s_e6"),
        F.max(F.col("tb").cast("double") / F.col("nb")).alias("rmax"),
    )
    out = tot.crossJoin(F.broadcast(ess))
    td = F.col("t").cast("double")
    essv = td * F.col("t") / (F.col("s_e6").cast("double") / 1e6)
    return out.select(
        F.col("n").alias("n_train"),
        F.col("t").alias("n_test"),
        F.round(essv, 2).alias("ess"),
        F.round(essv / F.col("n"), 4).alias("ess_ratio"),
        F.round(F.col("rmax") * F.col("n") / F.col("t"), 4).alias("max_weight"),
    )
