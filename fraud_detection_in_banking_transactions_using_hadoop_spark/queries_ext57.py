"""Extension batch 57: average precision (PR-AUC) and the
review-capacity capture curve.

Scale notes (the 100 TB story per query):
- average_precision is the imbalanced-class companion to ROC AUC (the
  fraud base rate makes ROC look flattering; PR does not): one
  cumulative pass over the distinct-score spine gives TP/FP at every
  threshold, each recall-increment * precision term rounds to an e9
  integer, and AP is their exact sum. Same spine walk as
  roc_auc/youden -- the whole PR curve costs one groupBy.
- review_capacity_capture answers the fraud-ops staffing question:
  if analysts can review the top k% of transactions by score, what
  fraction of actual positives do they catch? Capacity rank bounds
  come from n alone; captured counts are spine cumulative lookups
  with exact boundary clipping (the trimmed-mean trick) -- no per-row
  ranks, exact ppm capture rates at 1/5/10% budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Average precision over the event-value score.
# ---------------------------------------------------------------------------
@register(
    "average_precision",
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
    tot AS (SELECT CAST(sum(k) AS BIGINT) AS pos FROM spine),
    cum AS (
      SELECT v, k,
             sum(k) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(c) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge
      FROM spine
    ),
    terms AS (
      SELECT CAST(round(1000000000.0 * k
               * (CAST(tp AS DOUBLE) / n_ge), 0) AS BIGINT) AS t_e9
      FROM cum CROSS JOIN tot WHERE k > 0 AND pos > 0
    )
    SELECT (SELECT pos FROM tot) AS n_positives,
           CAST(sum(t_e9) AS BIGINT) AS ap_num_e9,
           CAST(sum(t_e9) // (SELECT pos FROM tot) AS BIGINT) AS ap_e9
    FROM terms
    """,
    tags=("ml", "pr-auc", "eval"),
)
def q_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP = (1/P) * sum over thresholds of (new positives at t) *
    precision(>= t): one desc cumulative pass over the distinct-score
    spine (ties contribute at their shared precision -- the standard
    tie treatment), each term an e9 integer before the exact sum.
    ap_e9/1e9 is the PR-AUC."""
    ev = read_table(spark, sf_dir, "events")
    scored = ev.select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    spine = scored.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("k"),
    )
    tot = spine.agg(F.sum("k").cast("bigint").alias("pos"))
    wd = Window.orderBy(F.col("v").desc()).rowsBetween(Window.unboundedPreceding, 0)
    cum = spine.select(
        "v",
        "k",
        F.sum("k").over(wd).alias("tp"),
        F.sum("c").over(wd).alias("n_ge"),
    )
    term = F.round(
        F.lit(1000000000.0)
        * F.col("k")
        * (F.col("tp").cast("double") / F.col("n_ge")),
        0,
    ).cast("bigint")
    return (
        cum.crossJoin(F.broadcast(tot))
        .where((F.col("k") > 0) & (F.col("pos") > 0))
        .agg(
            F.max("pos").alias("n_positives"),
            F.sum(term).cast("bigint").alias("ap_num_e9"),
            F.expr(
                "CAST(sum(CAST(round(1000000000.0 * k * (CAST(tp AS DOUBLE) / n_ge), 0)"
                " AS BIGINT)) DIV max(pos) AS BIGINT)"
            ).alias("ap_e9"),
        )
        .select(F.col("n_positives").cast("bigint").alias("n_positives"), "ap_num_e9", "ap_e9")
    )


# ---------------------------------------------------------------------------
# Review-capacity capture curve at 1/5/10% budgets.
# ---------------------------------------------------------------------------
_BUDGETS_PCT = (1, 5, 10)


@register(
    "review_capacity_capture",
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
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS pos FROM spine),
    cum AS (
      SELECT v, c, k,
             sum(c) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
             coalesce(sum(c) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
             sum(k) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ktp,
             coalesce(sum(k) OVER (ORDER BY v DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS klo
      FROM spine
    ),
    budgets AS (SELECT * FROM (VALUES (1), (5), (10)) AS t(pct)),
    capture AS (
      -- captured positives at budget: full spine rows above the cut
      -- plus the clipped proportional share of the boundary row
      -- (deterministic integer floor on the boundary fraction)
      SELECT b.pct, t.n, t.pos,
             CAST((b.pct * t.n) // 100 AS BIGINT) AS budget_rows,
             CAST(sum(CASE
               WHEN cum.hi <= (b.pct * t.n) // 100 THEN cum.k
               WHEN cum.lo >= (b.pct * t.n) // 100 THEN 0
               ELSE (cum.k * ((b.pct * t.n) // 100 - cum.lo)) // cum.c
             END) AS BIGINT) AS captured
      FROM cum CROSS JOIN tot t CROSS JOIN budgets b
      GROUP BY b.pct, t.n, t.pos
    )
    SELECT pct AS budget_pct, budget_rows, captured,
           CASE WHEN pos = 0 THEN NULL
                ELSE CAST((1000000 * captured) // pos AS BIGINT)
           END AS capture_ppm
    FROM capture
    ORDER BY pct
    """,
    tags=("fraud", "ops", "capture"),
)
def q_review_capacity_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of positives caught when reviewing the top 1/5/10% of
    events by score: budget rank bounds from n alone, captured counts
    from desc spine cumulative sums with deterministic proportional
    clipping on the boundary value (ties share the budget pro-rata,
    integer floor). Exact ppm capture rates -- the staffing curve."""
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
        F.sum("c").cast("bigint").alias("n"), F.sum("k").cast("bigint").alias("pos")
    )
    wd = Window.orderBy(F.col("v").desc())
    cum = spine.select(
        "v",
        "c",
        "k",
        F.sum("c").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("hi"),
        F.coalesce(
            F.sum("c").over(wd.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("lo"),
    )
    budgets = spark.createDataFrame([(p,) for p in _BUDGETS_PCT], "pct int")
    j = cum.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(budgets))
    cut = F.expr("(pct * n) DIV 100")
    contrib = (
        F.when(F.col("hi") <= cut, F.col("k"))
        .when(F.col("lo") >= cut, F.lit(0))
        .otherwise(F.expr("(k * ((pct * n) DIV 100 - lo)) DIV c"))
    )
    capture = j.groupBy("pct", "n", "pos").agg(
        F.max(cut).cast("bigint").alias("budget_rows"),
        F.sum(contrib).cast("bigint").alias("captured"),
    )
    return (
        capture.select(
            F.col("pct").alias("budget_pct"),
            "budget_rows",
            "captured",
            F.when(F.col("pos") == 0, F.lit(None).cast("bigint"))
            .otherwise(F.expr("CAST((1000000 * captured) DIV pos AS BIGINT)"))
            .alias("capture_ppm"),
        )
        .orderBy("budget_pct")
    )
