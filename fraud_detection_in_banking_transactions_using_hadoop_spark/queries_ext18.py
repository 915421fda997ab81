"""Extension batch 18: the Wald-Wolfowitz runs test -- is the daily
revenue series random around its median, or does it trend/cluster?

Scale notes: the median comes from the interpolated-quantile parity,
the above/below signs are row-local, the run count is one lag
comparison over the |days| series, and the expectation/variance of
the run count close in a single expression of the exact (n_above,
n_below) integers. One global-order window; nothing accumulates in
floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "runs_test_randomness",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS x
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    med AS (SELECT quantile_cont(x, 0.5) AS m FROM daily),
    signs AS (
      SELECT d, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
      FROM daily WHERE x <> (SELECT m FROM med)
    ),
    runs AS (
      SELECT CAST(sum(CASE WHEN p IS NULL OR s <> p THEN 1 ELSE 0 END) AS BIGINT)
               AS r,
             CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(1 - s) AS BIGINT) AS n0
      FROM (SELECT s, lag(s) OVER (ORDER BY d) AS p FROM signs)
    )
    SELECT r AS n_runs, n1 AS n_above, n0 AS n_below,
           round(1.0 + 2.0 * n1 * n0 / (n1 + n0), 4) AS expected_runs,
           CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
             round((r - (1.0 + 2.0 * n1 * n0 / (n1 + n0)))
                   / sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                          / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))), 6)
           END AS z_score
    FROM runs
    """,
    tags=("stats", "nonparametric", "runs-test"),
)
def q_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue sign sequence
    around its median (median-equal days drop, per convention). The
    run count is a lag-change sum over one ordered window; E[R] and
    Var[R] are closed forms of the exact above/below counts, so the z
    score is one deterministic expression. A strongly negative z means
    fewer runs than chance -- trending/clustered revenue."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    med = daily.agg(F.expr("percentile(x, 0.5)").alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("m"))
        .select("d", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.orderBy("d")
    runs = signs.select("s", F.lag("s").over(w).alias("p")).agg(
        F.sum(F.when(F.col("p").isNull() | (F.col("s") != F.col("p")), 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n0"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    n = n1d + n0d
    e_r = 1.0 + 2.0 * n1d * n0d / n
    var_r = 2.0 * n1d * n0d * (2.0 * n1d * n0d - n1d - n0d) / (n * n * (n - 1.0))
    return runs.select(
        F.col("r").alias("n_runs"),
        F.col("n1").alias("n_above"),
        F.col("n0").alias("n_below"),
        F.round(e_r, 4).alias("expected_runs"),
        # one-sided series (n1 or n0 = 0) => var_r = 0; 0/0 double
        # semantics differ across engines, so propagate NULL explicitly
        F.when(
            (F.col("n1") == 0) | (F.col("n0") == 0), F.lit(None).cast("double")
        )
        .otherwise(F.round((F.col("r") - e_r) / F.sqrt(var_r), 6))
        .alias("z_score"),
    )
