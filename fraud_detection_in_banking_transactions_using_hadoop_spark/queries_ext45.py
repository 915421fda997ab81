"""Extension batch 45: the Wilcoxon signed-rank test and a spend
quartile mobility matrix.

Scale notes (the 100 TB story per query):
- wilcoxon_signed_rank completes the paired-test ladder (sign test
  ignores magnitudes; Wilcoxon ranks them): year-over-year daily
  revenue differences on the calendar-bounded spine, average ranks of
  |diff| DOUBLED to stay integer (the mann_whitney trick), W+ and the
  tie-corrected normal approximation closing over exact sums.
- quartile_mobility_matrix is the economist's mobility table: each
  customer's spend quartile in 1996 vs 1997 (per-year distinct-spend
  spine cumulative counts -- ties share a quartile, no data-grain
  global window), transition counts and row shares in exact ppm. The
  diagonal mass IS the "stickiness of wealth" statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank on YoY daily revenue differences.
# ---------------------------------------------------------------------------
@register(
    "wilcoxon_signed_rank",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    diffs AS (
      SELECT abs(nxt - c) AS a, CASE WHEN nxt > c THEN 1 ELSE 0 END AS pos
      FROM (SELECT c, lead(c, 364) OVER (ORDER BY d) AS nxt FROM days)
      WHERE nxt IS NOT NULL AND nxt <> c
    ),
    spine AS (
      SELECT a, CAST(count(*) AS HUGEINT) AS cnt,
             CAST(sum(pos) AS HUGEINT) AS cpos
      FROM diffs GROUP BY a
    ),
    ranked AS (
      SELECT cnt, cpos,
             coalesce(sum(cnt) OVER (ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM spine
    ),
    agg AS (
      SELECT CAST(sum(cpos * (2 * below + cnt + 1)) AS HUGEINT) AS wp_x2,
             CAST(sum(cnt) AS HUGEINT) AS n,
             CAST(sum(cnt * cnt * cnt - cnt) AS HUGEINT) AS tie_term
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(wp_x2 // 2 AS BIGINT) AS w_plus,
           round((CAST(wp_x2 AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - CAST(tie_term AS DOUBLE) / 48), 6) AS z_score
    FROM agg
    """,
    tags=("stats", "nonparametric", "paired"),
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W+ = sum of |diff| average ranks over positive differences
    (zero diffs dropped, the standard treatment): the DOUBLED average
    rank of a spine value with `below` predecessors and multiplicity
    cnt is the exact integer 2*below + cnt + 1 (mann_whitney
    machinery), so W+ and the tie-corrected variance close over exact
    sums with one float z."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d")
    diffs = (
        days.select("c", F.lead("c", 364).over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("c")))
        .select(
            F.abs(F.col("nxt") - F.col("c")).alias("a"),
            F.when(F.col("nxt") > F.col("c"), 1).otherwise(0).alias("pos"),
        )
    )
    spine = diffs.groupBy("a").agg(
        F.count(F.lit(1)).cast(_DEC).alias("cnt"),
        F.sum("pos").cast(_DEC).alias("cpos"),
    )
    wv = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, -1)
    ranked = spine.select(
        "cnt", "cpos", F.coalesce(F.sum("cnt").over(wv), F.lit(0)).cast(_DEC).alias("below")
    )
    agg = ranked.agg(
        F.sum(F.col("cpos") * (2 * F.col("below") + F.col("cnt") + 1))
        .cast(_DEC)
        .alias("wp_x2"),
        F.sum("cnt").cast(_DEC).alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast(_DEC)
        .alias("tie_term"),
    )
    nd = F.col("n").cast("double")
    z = (F.col("wp_x2").cast("double") / 2 - nd * (nd + 1) / 4) / F.sqrt(
        nd * (nd + 1) * (2 * nd + 1) / 24 - F.col("tie_term").cast("double") / 48
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.expr("CAST(wp_x2 DIV 2 AS BIGINT)").alias("w_plus"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Spend quartile mobility matrix: 1996 quartile vs 1997 quartile.
# ---------------------------------------------------------------------------
def _year_quartiles_sql(year: int, alias: str) -> str:
    return f"""
    {alias}_spend AS (
      SELECT o_custkey AS ck, CAST(sum({_CENTS}) AS BIGINT) AS sp
      FROM orders
      WHERE o_orderdate >= DATE '{year}-01-01'
        AND o_orderdate < DATE '{year + 1}-01-01'
      GROUP BY o_custkey
    ),
    {alias}_spine AS (
      SELECT sp, CAST(count(*) AS BIGINT) AS c FROM {alias}_spend GROUP BY sp
    ),
    {alias}_cum AS (
      SELECT sp, sum(c) OVER (ORDER BY sp
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER () AS n
      FROM {alias}_spine
    ),
    {alias}_q AS (
      SELECT s.ck,
             CASE WHEN 4 * cu.cc <= cu.n THEN 1
                  WHEN 4 * cu.cc <= 2 * cu.n THEN 2
                  WHEN 4 * cu.cc <= 3 * cu.n THEN 3 ELSE 4 END AS q
      FROM {alias}_spend s JOIN {alias}_cum cu ON s.sp = cu.sp
    )"""


@register(
    "quartile_mobility_matrix",
    f"""
    WITH {_year_quartiles_sql(1996, "a")},
    {_year_quartiles_sql(1997, "b")}
    SELECT a.q AS q_1996, b.q AS q_1997,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST((1000000 * count(*))
                // sum(count(*)) OVER (PARTITION BY a.q) AS BIGINT)
             AS row_share_ppm
    FROM a_q a JOIN b_q b ON a.ck = b.ck
    GROUP BY a.q, b.q
    """,
    tags=("econ", "mobility", "quartile"),
)
def q_quartile_mobility_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1996 and 1997, bucketed into spend
    quartiles per year via the distinct-spend spine (cumulative counts
    vs 4*cc <= k*n thresholds -- ties share a quartile), then the 4x4
    transition matrix with exact ppm row shares. Diagonal mass =
    spend-rank persistence.

    Scale: the distinct-spend spine is O(active customers) per year, so
    its cumulative count runs on operators/rank.with_global_rank
    (two-level plan: B-row bucket offsets + per-bucket windows) instead
    of a single-task global window; the year total is a 1-row broadcast
    scalar."""
    orders = read_table(spark, sf_dir, "orders")

    def year_q(year: int) -> DataFrame:
        spend = (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("date"))
            )
            .groupBy(F.col("o_custkey").alias("ck"))
            .agg(F.sum(F.expr(_CENTS)).cast("bigint").alias("sp"))
        )
        spine = spend.groupBy("sp").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        total = spine.agg(F.sum("c").cast("bigint").alias("n"))
        cum = (
            with_global_rank(spine, "sp", [F.col("sp")], prefix_sum={"cc": "c"})
            .drop("global_rank", "c")
            .crossJoin(F.broadcast(total))
        )
        return spend.join(cum, "sp").select(
            "ck",
            F.when(4 * F.col("cc") <= F.col("n"), 1)
            .when(4 * F.col("cc") <= 2 * F.col("n"), 2)
            .when(4 * F.col("cc") <= 3 * F.col("n"), 3)
            .otherwise(4)
            .alias("q"),
        )

    a = year_q(1996).withColumnRenamed("q", "q_1996")
    b = year_q(1997).withColumnRenamed("q", "q_1997")
    cells = a.join(b, "ck").groupBy("q_1996", "q_1997").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    wrow = Window.partitionBy("q_1996")
    return cells.select(
        "q_1996",
        "q_1997",
        "n_customers",
        F.expr(
            "CAST((1000000 * n_customers)"
            " DIV sum(n_customers) OVER (PARTITION BY q_1996) AS BIGINT)"
        ).alias("row_share_ppm"),
    )
