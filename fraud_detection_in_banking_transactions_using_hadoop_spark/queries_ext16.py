"""Extension batch 16: two-sample inference, cohort LTV, covariate
balance, grouped model fitting, and tail risk -- all on the
exact-sufficient-statistics discipline.

Scale notes:
- Welch's t-test needs only (n, sum, sumsq) per arm -- DECIMAL(38,0)
  exact; the t statistic and Welch-Satterthwaite df close in one
  double expression of those integers.
- The LTV curve is per-user first-day alignment (one aggregate + a
  broadcast join back), weekly-offset bucketing, and a cumulative
  window over 5 rows; the denominator is ALL users, so the curve is a
  true cohort average, not a survivors-only one.
- Covariate balance (standardized mean difference) reuses the same
  per-arm moment sums for three covariates, unioned 1-row summaries.
- Grouped OLS fits one regression PER NATION in a single groupBy --
  the many-models-at-once shape (GROUP BY fit) that map-side partials
  make free at scale.
- Expected shortfall thresholds at the interpolated p95 (1-row
  broadcast, whitelisted) and averages the tail via exact cent sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test: URGENT vs LOW priority order totals.
# ---------------------------------------------------------------------------
@register(
    "welch_t_test",
    """
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    stats AS (
      SELECT arm, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
      FROM arms GROUP BY arm
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 1 THEN s1 END) AS s1_1,
             max(CASE WHEN arm = 1 THEN s2 END) AS s2_1,
             max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 0 THEN s1 END) AS s1_0,
             max(CASE WHEN arm = 0 THEN s2 END) AS s2_0
      FROM stats
    )
    SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n0 AS BIGINT) AS n_low,
           round(CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 4) AS mean_urgent,
           round(CAST(s1_0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0, 4) AS mean_low,
           round((CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s1_0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt(CAST(n1 * s2_1 - s1_1 * s1_1 AS DOUBLE)
                        / CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        / CAST(n1 - 1 AS DOUBLE)
                        + CAST(n0 * s2_0 - s1_0 * s1_0 AS DOUBLE)
                          / CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                          / CAST(n0 - 1 AS DOUBLE)), 6) AS t_stat,
           round(pow(CAST(n1 * s2_1 - s1_1 * s1_1 AS DOUBLE)
                     / CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) / CAST(n1 - 1 AS DOUBLE)
                     + CAST(n0 * s2_0 - s1_0 * s1_0 AS DOUBLE)
                       / CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       / CAST(n0 - 1 AS DOUBLE), 2)
                 / (pow(CAST(n1 * s2_1 - s1_1 * s1_1 AS DOUBLE)
                        / CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        / CAST(n1 - 1 AS DOUBLE), 2) / CAST(n1 - 1 AS DOUBLE)
                    + pow(CAST(n0 * s2_0 - s1_0 * s1_0 AS DOUBLE)
                          / CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                          / CAST(n0 - 1 AS DOUBLE), 2) / CAST(n0 - 1 AS DOUBLE)),
                 4) AS welch_df
    FROM wide
    """,
    tags=("stats", "t-test", "exact-arith"),
)
def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t on exact sufficient statistics: per-arm (n, sum,
    sum-of-squares) as DECIMAL(38,0), then the t statistic and the
    Welch-Satterthwaite degrees of freedom close in single double
    expressions. Sample variance appears as (n*s2 - s1^2)/(n^2 (n-1))
    -- exact integers until the final divisions."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    stats = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("cents").cast(_DEC)).cast(_DEC).alias("s1"),
        F.sum(F.col("cents").cast(_DEC) * F.col("cents")).cast(_DEC).alias("s2"),
    )

    def pick(arm, col):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = stats.agg(
        pick(1, "n").alias("n1"), pick(1, "s1").alias("s1_1"), pick(1, "s2").alias("s2_1"),
        pick(0, "n").alias("n0"), pick(0, "s1").alias("s1_0"), pick(0, "s2").alias("s2_0"),
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    # u = sample_variance / n  (the per-arm SE^2 contribution):
    # var = (n*s2 - s1^2) / (n(n-1)), so u = (n*s2 - s1^2) / (n^2 (n-1))
    u1 = (F.col("n1") * F.col("s2_1") - F.col("s1_1") * F.col("s1_1")).cast("double") / n1 / n1 / (n1 - 1)
    u0 = (F.col("n0") * F.col("s2_0") - F.col("s1_0") * F.col("s1_0")).cast("double") / n0 / n0 / (n0 - 1)
    m1 = F.col("s1_1").cast("double") / n1
    m0 = F.col("s1_0").cast("double") / n0
    se2 = u1 + u0
    return wide.select(
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n0").cast("bigint").alias("n_low"),
        F.round(m1 / 100.0, 4).alias("mean_urgent"),
        F.round(m0 / 100.0, 4).alias("mean_low"),
        F.round((m1 - m0) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (F.pow(u1, F.lit(2)) / (n1 - 1) + F.pow(u0, F.lit(2)) / (n0 - 1)),
            4,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: average cumulative purchase value per user by weeks
# since first event (denominator = all users).
# ---------------------------------------------------------------------------
@register(
    "ltv_curve",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT e.user_id,
             CAST(date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS BIGINT) AS wk,
             CAST(round(e.value * 100, 0) AS BIGINT) AS cents
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    weekly AS (
      SELECT wk, CAST(sum(cents) AS BIGINT) AS cents FROM spend GROUP BY wk
    ),
    users AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM firsts)
    SELECT CAST(wk AS INTEGER) AS week,
           round(CAST(sum(cents) OVER (ORDER BY wk) AS DOUBLE)
                 / (SELECT n_users FROM users) / 100.0, 6) AS cum_ltv_per_user
    FROM weekly
    """,
    tags=("analytics", "ltv", "cohort"),
)
def q_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: cumulative purchase dollars per user as a
    function of weeks since that user's first event, averaged over ALL
    users (the broadcast first-day join aligns cohorts; the
    denominator never shrinks, so the curve reads as true expected
    LTV). Weekly integer cent sums + one cumulative window over
    |weeks| rows + a 1-row user-count broadcast."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(firsts), "user_id")
        .select(
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7)
            .cast("bigint")
            .alias("wk"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    weekly = spend.groupBy("wk").agg(F.sum("cents").cast("bigint").alias("cents"))
    n_users = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    wc = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        weekly.crossJoin(F.broadcast(n_users))
        .select(
            F.col("wk").cast("integer").alias("week"),
            F.round(
                F.sum("cents").over(wc).cast("double") / F.col("n_users") / 100.0, 6
            ).alias("cum_ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Covariate balance: standardized mean difference of three pre-period
# covariates between experiment arms.
# ---------------------------------------------------------------------------
@register(
    "covariate_balance_smd",
    """
    WITH users AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
             CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS views,
             CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS clicks,
             CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS errors
      FROM events GROUP BY user_id
    ),
    melted AS (
      SELECT variant, 'views' AS cov, views AS x FROM users
      UNION ALL SELECT variant, 'clicks', clicks FROM users
      UNION ALL SELECT variant, 'errors', errors FROM users
    ),
    stats AS (
      SELECT cov, variant, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
      FROM melted GROUP BY cov, variant
    ),
    wide AS (
      SELECT cov,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 1 THEN s1 END) AS s1_1,
             max(CASE WHEN variant = 1 THEN s2 END) AS s2_1,
             max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 0 THEN s1 END) AS s1_0,
             max(CASE WHEN variant = 0 THEN s2 END) AS s2_0
      FROM stats GROUP BY cov
    )
    SELECT cov,
           round(CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean_b,
           round(CAST(s1_0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS mean_a,
           round((CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(s1_0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt((CAST(n1 * s2_1 - s1_1 * s1_1 AS DOUBLE)
                         / CAST(n1 AS DOUBLE) / CAST(n1 - 1 AS DOUBLE)
                         + CAST(n0 * s2_0 - s1_0 * s1_0 AS DOUBLE)
                           / CAST(n0 AS DOUBLE) / CAST(n0 - 1 AS DOUBLE)) / 2.0),
                 6) AS smd
    FROM wide
    """,
    tags=("experimentation", "balance", "exact-arith"),
)
def q_covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization health check: the standardized mean difference of
    each pre-period covariate between arms (|SMD| < 0.1 is the usual
    'balanced' bar). The three covariates melt into one (cov, variant)
    aggregate of exact moment sums; SMD closes per covariate in one
    expression. Same machinery as Welch, applied across a covariate
    battery."""
    ev = read_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).cast("bigint").alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).cast("bigint").alias("clicks"),
        F.count(F.when(F.col("event_type") == "error", 1)).cast("bigint").alias("errors"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("integer"))
    melted = None
    for cov in ("views", "clicks", "errors"):
        m = users.select("variant", F.lit(cov).alias("cov"), F.col(cov).alias("x"))
        melted = m if melted is None else melted.unionByName(m)
    stats = melted.groupBy("cov", "variant").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("x").cast(_DEC)).cast(_DEC).alias("s1"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).cast(_DEC).alias("s2"),
    )

    def pick(v, col):
        return F.max(F.when(F.col("variant") == v, F.col(col)))

    wide = stats.groupBy("cov").agg(
        pick(1, "n").alias("n1"), pick(1, "s1").alias("s1_1"), pick(1, "s2").alias("s2_1"),
        pick(0, "n").alias("n0"), pick(0, "s1").alias("s1_0"), pick(0, "s2").alias("s2_0"),
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    m1 = F.col("s1_1").cast("double") / n1
    m0 = F.col("s1_0").cast("double") / n0
    # SAMPLE variances here (not var/n as in the Welch SE terms):
    # var = (n*s2 - s1^2) / (n(n-1))
    v1 = (F.col("n1") * F.col("s2_1") - F.col("s1_1") * F.col("s1_1")).cast("double") / n1 / (n1 - 1)
    v0 = (F.col("n0") * F.col("s2_0") - F.col("s1_0") * F.col("s1_0")).cast("double") / n0 / (n0 - 1)
    return wide.select(
        "cov",
        F.round(m1, 6).alias("mean_b"),
        F.round(m0, 6).alias("mean_a"),
        F.round((m1 - m0) / F.sqrt((v1 + v0) / 2.0), 6).alias("smd"),
    )


# ---------------------------------------------------------------------------
# Grouped OLS: one revenue-vs-time regression per nation in a single
# aggregate pass.
# ---------------------------------------------------------------------------
@register(
    "grouped_ols_trends",
    """
    WITH pts AS (
      SELECT n.n_name AS nation,
             CAST(date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))
                  AS HUGEINT) AS x,
             CAST(round(o.o_totalprice * 100, 0) AS HUGEINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    s AS (
      SELECT nation, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY nation
    )
    SELECT nation, CAST(n AS BIGINT) AS n_orders,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 8)
             AS slope_dollars_per_day
    FROM s
    """,
    tags=("regression", "grouped-fit", "exact-arith"),
)
def q_grouped_ols_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many models in one pass: per-nation OLS slope of order value
    against time from grouped exact sufficient statistics -- the
    GROUP BY fit pattern (map-side partial moment sums, one tiny
    shuffle, a closing expression per group). 25 regressions cost one
    aggregate."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    pts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast(_DEC)
            .alias("x"),
            F.round(F.col("o_totalprice") * 100, 0).cast(_DEC).alias("y"),
        )
    )
    s = pts.groupBy("nation").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(_DEC).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(_DEC).alias("sxx"),
    )
    return s.select(
        "nation",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / 100.0,
            8,
        ).alias("slope_dollars_per_day"),
    )


# ---------------------------------------------------------------------------
# Expected shortfall: mean of the top-5% tail of order values.
# ---------------------------------------------------------------------------
@register(
    "expected_shortfall",
    """
    WITH thr AS (
      SELECT quantile_cont(o_totalprice, 0.95) AS p95 FROM orders
    ),
    tail AS (
      SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents, t.p95
      FROM orders o CROSS JOIN thr t
      WHERE o.o_totalprice >= t.p95
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tail,
           round(max(p95), 4) AS p95_threshold,
           round(round(sum(cents) / 100.0, 4) / count(*), 6) AS expected_shortfall
    FROM tail
    """,
    tags=("risk", "tail", "A1"),
)
def q_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk (CVaR at 95%): the interpolated p95 threshold rides
    the quantile parity, broadcasts as one row, and the tail mean uses
    the rounded-exact-cent-sum rule. Values exactly at the threshold
    compare the same identical doubles in both engines."""
    orders = read_table(spark, sf_dir, "orders")
    thr = orders.agg(F.expr("percentile(o_totalprice, 0.95)").alias("p95"))
    tail = (
        orders.crossJoin(F.broadcast(thr))
        .where(F.col("o_totalprice") >= F.col("p95"))
        .select(F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"), "p95")
    )
    return tail.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.round(F.max("p95"), 4).alias("p95_threshold"),
        F.round(F.round(F.sum("cents") / 100.0, 4) / F.count(F.lit(1)), 6).alias(
            "expected_shortfall"
        ),
    )
