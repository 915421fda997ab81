"""Extension batch 151 (round 6): funnel edit distance (how many
insert/delete/substitute steps each user's journey is from the
canonical signup->view->click->purchase path -- pattern_match counts
motifs, this measures whole-path deviation with both engines' native
levenshtein), fractional-knapsack budget selection (greedy-by-ratio =
the LP optimum for the fractional relaxation, run entirely on
operators/rank prefix sums -- the assortment/capacity allocation
primitive), and 2-regressor dominance analysis (Shapley decomposition
of R^2 between order count and customer reach -- which driver
'explains' daily revenue once you stop letting them free-ride on each
other).

Cross-engine discipline:
- levenshtein is the standard DP metric in both engines (integer).
- knapsack ordering uses the exact integer ratio key value*1e6 DIV
  weight (ties -> partkey), so both engines pick the identical greedy
  prefix; only the boundary item's fractional take is a double.
- dominance: all five correlation inputs come from exact integer
  moment sums; the subset-R^2 algebra is the same closed 2x2 form on
  both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_FUNNEL = "svcp"  # signup -> view -> click -> purchase


@register(
    "funnel_edit_distance",
    f"""
    WITH seq AS (
      SELECT user_id,
             substr(string_agg(substr(event_type, 1, 1), ''
                    ORDER BY epoch_us(ts), event_id), 1, 20) AS s
      FROM events GROUP BY user_id),
    d AS (
      SELECT user_id, levenshtein(s, '{_FUNNEL}') AS dist,
             length(s) AS path_len
      FROM seq)
    SELECT CAST(dist AS BIGINT) AS edit_distance,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(CAST(path_len AS DOUBLE)), 6) AS avg_path_len
    FROM d GROUP BY dist ORDER BY dist
    """,
    tags=("funnel", "sequence", "text"),
)
def q_funnel_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of Levenshtein distances between each user's
    first-20-event path string (initials of event types in exact
    (ts, event_id) order) and the canonical '{_FUNNEL}' funnel. The
    histogram separates on-script users (small distances dominated by
    extra views) from never-converting wanderers; edit distance sees
    ORDER violations (purchase before signup) that motif counting
    can't. Integer DP metric native to both engines."""
    ev = read_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.substring(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("us"),
                                F.col("event_id"),
                                F.substring("event_type", 1, 1).alias("c"),
                            )
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ),
            1,
            20,
        ).alias("s")
    )
    d = seq.select(
        F.levenshtein("s", F.lit(_FUNNEL)).alias("dist"),
        F.length("s").alias("path_len"),
    )
    return (
        d.groupBy(F.col("dist").cast("bigint").alias("edit_distance"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg(F.col("path_len").cast("double")), 6).alias(
                "avg_path_len"
            ),
        )
        .orderBy("edit_distance")
    )


@register(
    "knapsack_budget_selection",
    """
    WITH items AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                  AS BIGINT)) AS BIGINT) AS value_cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS weight
      FROM lineitem GROUP BY l_partkey),
    keyed AS (
      SELECT pk, value_cents, weight,
             CAST(value_cents * 1000000 // weight AS BIGINT) AS ratio_e6
      FROM items),
    tot AS (
      SELECT CAST(sum(weight) // 10 AS BIGINT) AS budget FROM keyed),
    ranked AS (
      SELECT pk, value_cents, weight, ratio_e6,
             sum(weight) OVER (ORDER BY ratio_e6 DESC, pk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(value_cents) OVER (ORDER BY ratio_e6 DESC, pk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
      FROM keyed),
    full_take AS (
      SELECT CAST(count(*) AS BIGINT) AS n_full,
             CAST(coalesce(max(cumw), 0) AS BIGINT) AS w_full,
             CAST(coalesce(max(cumv), 0) AS BIGINT) AS v_full
      FROM ranked CROSS JOIN tot WHERE cumw <= budget),
    boundary AS (
      SELECT min(ratio_e6) AS r_b
      FROM (SELECT ratio_e6, cumw FROM ranked CROSS JOIN tot
            WHERE cumw > budget ORDER BY cumw LIMIT 1))
    SELECT t.budget AS weight_budget,
           f.n_full AS n_items_full,
           round(f.v_full / 100.0, 2) AS greedy_value_dollars,
           round((f.v_full
                  + coalesce((t.budget - f.w_full) * b.r_b, 0) / 1000000.0)
                 / 100.0, 2) AS lp_bound_dollars
    FROM full_take f CROSS JOIN tot t CROSS JOIN boundary b
    """,
    tags=("ops", "optimization", "rank"),
)
def q_knapsack_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional knapsack over parts: value = discounted revenue,
    weight = units shipped, budget = 10% of total units. Greedy by the
    exact integer ratio key value*1e6 DIV weight (partkey tiebreak)
    IS optimal for the fractional relaxation, so greedy_value is the
    integral take and lp_bound adds the boundary item's fractional
    sliver -- the gap bounds how much any clever integral selection
    could still gain. Prefix weights/values ride the rank operator's
    exact prefix sums; no global sort of items ever materializes a
    per-row rank."""
    li = read_table(spark, sf_dir, "lineitem")
    items = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("value_cents"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("weight"),
    )
    keyed = items.select(
        "pk",
        "value_cents",
        "weight",
        F.expr("CAST(value_cents * 1000000L DIV weight AS BIGINT)").alias(
            "ratio_e6"
        ),
    )
    tot = keyed.agg(
        F.expr("CAST(sum(weight) DIV 10 AS BIGINT)").alias("budget")
    )
    ranked = with_global_rank(
        keyed,
        "ratio_e6",
        [F.desc("ratio_e6"), F.col("pk").asc()],
        ascending=False,
        rank_col="rk",
        prefix_sum={"cumw": "weight", "cumv": "value_cents"},
    )
    rb = ranked.crossJoin(F.broadcast(tot))
    full_take = rb.where(F.col("cumw") <= F.col("budget")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.coalesce(F.max("cumw"), F.lit(0)).cast("bigint").alias("w_full"),
        F.coalesce(F.max("cumv"), F.lit(0)).cast("bigint").alias("v_full"),
    )
    boundary = (
        rb.where(F.col("cumw") > F.col("budget"))
        .orderBy("cumw")
        .limit(1)
        .select(F.col("ratio_e6").alias("r_b"))
        .agg(F.min("r_b").alias("r_b"))
    )
    return (
        full_take.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(boundary))
        .select(
            F.col("budget").alias("weight_budget"),
            F.col("n_full").alias("n_items_full"),
            F.round(F.col("v_full") / 100.0, 2).alias("greedy_value_dollars"),
            F.round(
                (
                    F.col("v_full")
                    + F.coalesce(
                        (F.col("budget") - F.col("w_full")) * F.col("r_b"),
                        F.lit(0),
                    )
                    / 1000000.0
                )
                / 100.0,
                2,
            ).alias("lp_bound_dollars"),
        )
    )


@register(
    "dominance_analysis_2var",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS x2,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      FROM daily),
    corr AS (
      SELECT
        CAST(n * s1y - s1 * sy AS DOUBLE)
          / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)) AS r1,
        CAST(n * s2y - s2 * sy AS DOUBLE)
          / sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)
                 * CAST(n * syy - sy * sy AS DOUBLE)) AS r2,
        CAST(n * s12 - s1 * s2 AS DOUBLE)
          / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                 * CAST(n * s22 - s2 * s2 AS DOUBLE)) AS r12
      FROM mom)
    SELECT round(r1 * r1, 6) AS r2_count_only,
           round(r2 * r2, 6) AS r2_customers_only,
           round((r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12)
                 / (1.0 - r12 * r12), 6) AS r2_full,
           round((r1 * r1
                  + ((r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12)
                     / (1.0 - r12 * r12) - r2 * r2)) / 2.0, 6) + 0.0
             AS shapley_count,
           round((r2 * r2
                  + ((r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12)
                     / (1.0 - r12 * r12) - r1 * r1)) / 2.0, 6) + 0.0
             AS shapley_customers
    FROM corr
    """,
    tags=("stats", "regression", "attribution"),
)
def q_dominance_analysis_2var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley decomposition of daily-revenue R^2 between order count
    and distinct customers: phi_i = (R^2_i alone + marginal given the
    other) / 2 -- the two shares sum EXACTLY to the full-model R^2
    (r1^2 + r2^2 - 2 r1 r2 r12)/(1 - r12^2), unlike raw squared
    correlations which double-count the shared variance. All three
    correlations from exact integer moment sums."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x1"),
        F.countDistinct("o_custkey").cast("bigint").alias("x2"),
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("y"),
    )
    x1 = F.col("x1").cast(_DEC)
    x2 = F.col("x2").cast(_DEC)
    y = F.col("y").cast(_DEC)
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(x1).cast(_DEC).alias("s1"),
        F.sum(x2).cast(_DEC).alias("s2"),
        F.sum(y).cast(_DEC).alias("sy"),
        F.sum(x1 * F.col("x1")).cast(_DEC).alias("s11"),
        F.sum(x2 * F.col("x2")).cast(_DEC).alias("s22"),
        F.sum(y * F.col("y")).cast(_DEC).alias("syy"),
        F.sum(x1 * F.col("x2")).cast(_DEC).alias("s12"),
        F.sum(x1 * F.col("y")).cast(_DEC).alias("s1y"),
        F.sum(x2 * F.col("y")).cast(_DEC).alias("s2y"),
    )

    def corr(sxy, sx, sy_, sxx, syy_):
        return (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy_)).cast(
            "double"
        ) / F.sqrt(
            (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
            * (F.col("n") * F.col(syy_) - F.col(sy_) * F.col(sy_)).cast(
                "double"
            )
        )

    c = mom.select(
        corr("s1y", "s1", "sy", "s11", "syy").alias("r1"),
        corr("s2y", "s2", "sy", "s22", "syy").alias("r2"),
        corr("s12", "s1", "s2", "s11", "s22").alias("r12"),
    )
    r1, r2, r12 = F.col("r1"), F.col("r2"), F.col("r12")
    full = (r1 * r1 + r2 * r2 - 2.0 * r1 * r2 * r12) / (1.0 - r12 * r12)
    return c.select(
        F.round(r1 * r1, 6).alias("r2_count_only"),
        F.round(r2 * r2, 6).alias("r2_customers_only"),
        F.round(full, 6).alias("r2_full"),
        (F.round((r1 * r1 + (full - r2 * r2)) / 2.0, 6) + F.lit(0.0)).alias(
            "shapley_count"
        ),
        (F.round((r2 * r2 + (full - r1 * r1)) / 2.0, 6) + F.lit(0.0)).alias(
            "shapley_customers"
        ),
    )
