"""Extension batch 17: nonparametric two-sample inference and
concentration measures -- Mann-Whitney U via the exact rank spine,
Cramer's V effect size, and Herfindahl-Hirschman indexes.

Scale notes:
- Mann-Whitney reuses the distinct-value spine trick proven in
  spearman_corr: grouped counts per (value, arm), cumulative counts
  below each value, and DOUBLED average ranks so tied ranks stay exact
  integers. The U statistic and its tie-corrected normal
  approximation close in one expression of those integers.
- Cramer's V rides the chi-square cell machinery with e8-integer term
  accumulation (same family as mutual_information).
- HHI is sum of squared revenue shares: exact HUGEINT cents products
  over the per-part (and per-nation) aggregates; one division at the
  end. The 10000x convention (percent-squared points) is applied in
  the same closing expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Mann-Whitney U: are URGENT order totals stochastically larger than
# LOW ones? Exact doubled ranks from the value spine.
# ---------------------------------------------------------------------------
@register(
    "mann_whitney_u",
    """
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM arms GROUP BY v
    ),
    ranked AS (
      SELECT v, c, c1,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM spine
    ),
    agg AS (
      SELECT CAST(sum(CAST(c1 AS HUGEINT) * (2 * below + c + 1)) AS HUGEINT)
               AS r1_x2,
             CAST(sum(CAST(c1 AS HUGEINT)) AS HUGEINT) AS n1,
             CAST(sum(CAST(c - c1 AS HUGEINT)) AS HUGEINT) AS n0,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS tie_term
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n0 AS BIGINT) AS n_low,
           CAST((r1_x2 - 2 * ((n1 * (n1 + 1)) // 2)) // 2 AS BIGINT) AS u_stat,
           round((CAST(r1_x2 AS DOUBLE) / 2.0
                  - CAST((n1 * (n1 + 1)) // 2 AS DOUBLE)
                  - CAST(n1 * n0 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 * n0 AS DOUBLE) / 12.0
                        * (CAST(n1 + n0 + 1 AS DOUBLE)
                           - CAST(tie_term AS DOUBLE)
                             / CAST((n1 + n0) * (n1 + n0 - 1) AS DOUBLE))), 6)
             AS z_score
    FROM agg
    """,
    tags=("stats", "nonparametric", "exact-arith"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test without materializing per-row ranks: grouped
    counts per distinct value form the spine, the DOUBLED average rank
    of a value with `below` predecessors and multiplicity c is the
    exact integer 2*below + c + 1, and U plus the tie-corrected normal
    z close over HUGEINT sums. Ties cost nothing extra -- they ARE the
    spine. (Same machinery as spearman_corr's average ranks.)

    Scale: o_totalprice is an order-level SUM, so its distinct-cent
    spine is ~O(rows) (measured: 15.0k/150k distinct at sf0.01/0.1) --
    the cumulative count runs on operators/rank.with_global_rank's
    two-level plan, never a single-task global window."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = arms.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
    )
    ranked = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc": "c"}
    ).select("c", "c1", (F.col("cc") - F.col("c")).alias("below"))
    agg = ranked.agg(
        F.sum(
            F.col("c1").cast(_DEC) * (2 * F.col("below") + F.col("c") + 1).cast(_DEC)
        )
        .cast(_DEC)
        .alias("r1_x2"),
        F.sum(F.col("c1").cast(_DEC)).cast(_DEC).alias("n1"),
        F.sum((F.col("c") - F.col("c1")).cast(_DEC)).cast(_DEC).alias("n0"),
        F.sum(
            F.col("c").cast(_DEC) * F.col("c").cast(_DEC) * F.col("c").cast(_DEC)
            - F.col("c").cast(_DEC)
        )
        .cast(_DEC)
        .alias("tie_term"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    n = n1d + n0d
    u = F.col("r1_x2").cast("double") / 2.0 - n1d * (n1d + 1) / 2.0
    mean_u = n1d * n0d / 2.0
    var_u = (
        n1d * n0d / 12.0
        * ((n + 1) - F.col("tie_term").cast("double") / (n * (n - 1)))
    )
    # u_stat in EXACT decimal arithmetic (double floor would diverge
    # from the oracle's HUGEINT floor division once r1_x2 > 2^53):
    # U = (r1_x2 - n1*(n1+1)) / 2, non-negative, so floor == div
    u_exact = F.col("r1_x2") - F.col("n1") * (F.col("n1") + F.lit(1).cast(_DEC))
    return agg.select(
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n0").cast("bigint").alias("n_low"),
        F.floor(u_exact / 2).cast("bigint").alias("u_stat"),
        F.round((u - mean_u) / F.sqrt(var_u), 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Cramer's V: normalized association strength for the returnflag x
# linestatus table.
# ---------------------------------------------------------------------------
@register(
    "cramers_v",
    """
    WITH cells AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             CAST(count(*) AS BIGINT) AS obs
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    margins AS (
      SELECT rf, ls, obs,
             sum(obs) OVER (PARTITION BY rf) AS row_n,
             sum(obs) OVER (PARTITION BY ls) AS col_n,
             sum(obs) OVER () AS n
      FROM cells
    ),
    terms AS (
      SELECT n,
             CAST(round(pow(obs - CAST(row_n AS DOUBLE) * col_n / n, 2)
                        / (CAST(row_n AS DOUBLE) * col_n / n) * 1e8, 0) AS BIGINT)
               AS chi2_e8,
             (SELECT count(DISTINCT rf) FROM cells) AS r,
             (SELECT count(DISTINCT ls) FROM cells) AS c
      FROM margins
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(CAST(sum(chi2_e8) AS DOUBLE) / 1e8, 6) AS chi2,
           round(sqrt(CAST(sum(chi2_e8) AS DOUBLE) / 1e8
                      / (max(n) * least(max(r) - 1, max(c) - 1))), 6) AS cramers_v
    FROM terms
    """,
    tags=("stats", "effect-size", "exact-arith"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association strength on [0,1]: V = sqrt(chi2 / (n * min(r-1,
    c-1))). The chi-square terms accumulate as e8 integers (the
    mutual_information discipline) and the category cardinalities come
    from the same tiny cell table."""
    li = read_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    margins = cells.select(
        "rf",
        "ls",
        "obs",
        F.sum("obs").over(Window.partitionBy("rf")).alias("row_n"),
        F.sum("obs").over(Window.partitionBy("ls")).alias("col_n"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    terms = margins.select(
        "n",
        F.round(F.pow(F.col("obs") - expected, F.lit(2)) / expected * 1e8, 0)
        .cast("bigint")
        .alias("chi2_e8"),
        F.size(F.collect_set("rf").over(Window.partitionBy())).alias("r"),
        F.size(F.collect_set("ls").over(Window.partitionBy())).alias("c"),
    )
    chi2 = F.sum("chi2_e8").cast("double") / 1e8
    return terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (F.max("n") * F.least(F.max("r") - 1, F.max("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration: overall part-level HHI plus the
# per-nation supplier-market variant.
# ---------------------------------------------------------------------------
@register(
    "herfindahl_index",
    """
    WITH rev AS (
      SELECT l_partkey AS unit,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS HUGEINT)
               AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(cents) AS t, count(*) AS k FROM rev)
    SELECT 'parts_overall' AS market, CAST(k AS BIGINT) AS n_units,
           round(CAST((SELECT sum(cents * cents) FROM rev) AS DOUBLE)
                 / CAST(t * t AS DOUBLE) * 10000, 6) AS hhi,
           round(10000.0 / k, 6) AS hhi_if_uniform
    FROM tot
    UNION ALL
    SELECT 'suppliers_overall', CAST(count(*) AS BIGINT),
           round(CAST(sum(cents * cents) AS DOUBLE)
                 / CAST(sum(cents) * sum(cents) AS DOUBLE) * 10000, 6),
           round(10000.0 / count(*), 6)
    FROM (
      SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS HUGEINT)
               AS cents
      FROM lineitem GROUP BY l_suppkey
    )
    """,
    tags=("concentration", "hhi", "exact-arith"),
)
def q_herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market concentration: HHI = 10000 * sum(share^2), computed as
    sum(cents^2) / total^2 over exact HUGEINT products so no per-share
    float division ever accumulates -- one closing expression per
    market. The uniform-market floor 10000/k comes along as the
    reference point. Two unioned 1-row summaries (part market and
    supplier market)."""
    li = read_table(spark, sf_dir, "lineitem")

    def market(key, name):
        rev = li.groupBy(key).agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast(_DEC)
            .alias("cents")
        )
        return rev.agg(
            F.lit(name).alias("market"),
            F.count(F.lit(1)).cast("bigint").alias("n_units"),
            F.round(
                F.sum(F.col("cents") * F.col("cents")).cast("double")
                / (F.sum("cents").cast(_DEC) * F.sum("cents").cast(_DEC)).cast("double")
                * 10000,
                6,
            ).alias("hhi"),
            F.round(10000.0 / F.count(F.lit(1)), 6).alias("hhi_if_uniform"),
        )

    return market("l_partkey", "parts_overall").unionByName(
        market("l_suppkey", "suppliers_overall")
    )
