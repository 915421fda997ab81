"""Extension batch 91: equivalence testing (TOST), a sequential
probability ratio test replay, and CR-k concentration ratios.

- tost_equivalence: the A/B suite (welch_t, ab_test_proportions,
  sequential_ab_looks) tests for a DIFFERENCE; TOST is how you prove
  SAMENESS within a margin -- the two one-sided z's against +-delta
  must both clear the bar. 'Not significant' is not 'equivalent';
  this is the test that actually licenses that claim.
- sprt_replay: Wald's SPRT monitored daily -- the log-likelihood
  ratio walk accumulates EXACT integers (each day contributes
  k*C1 + (n-k)*C2 with the two log constants pre-floored to e9
  integers), so the first boundary crossing is engine-stable. The
  always-valid continuous cousin of sequential_ab_looks' group plan.
- concentration_curve_crk: CR-1/4/8/20 revenue shares plus the
  effective number of customers 1/sum(s^2) -- the concentration
  curve points antitrust and key-account risk reviews quote, read
  off the rank operator's exact prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TOST_DELTA = "0.01"
_SPRT_P0, _SPRT_P1 = "0.19", "0.21"
_SPRT_ALPHA = "0.05"


# ---------------------------------------------------------------------------
# TOST equivalence of URGENT share across the parity split.
# ---------------------------------------------------------------------------
@register(
    "tost_equivalence",
    f"""
    WITH arms AS (
      SELECT o_custkey % 2 AS arm,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS hit
      FROM orders),
    g AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hit) AS BIGINT) AS k
      FROM arms GROUP BY arm),
    c AS (
      SELECT a.n AS n1, a.k AS k1, b.n AS n0, b.k AS k0,
             CAST(a.k AS DOUBLE) / a.n AS p1,
             CAST(b.k AS DOUBLE) / b.n AS p0
      FROM (SELECT * FROM g WHERE arm = 1) a
      CROSS JOIN (SELECT * FROM g WHERE arm = 0) b),
    z AS (
      SELECT n1, n0, p1, p0,
             sqrt(p1 * (1.0 - p1) / n1 + p0 * (1.0 - p0) / n0) AS se
      FROM c)
    SELECT n1 AS n_arm1, n0 AS n_arm0,
           round(p1 - p0, 6) + 0.0 AS diff,
           round((p1 - p0 + {_TOST_DELTA}) / se, 4) + 0.0 AS z_lower,
           round(({_TOST_DELTA} - (p1 - p0)) / se, 4) + 0.0 AS z_upper,
           CASE WHEN (p1 - p0 + {_TOST_DELTA}) / se > 1.645
                 AND ({_TOST_DELTA} - (p1 - p0)) / se > 1.645
                THEN 'equivalent' ELSE 'not-shown' END AS verdict
    FROM z
    """,
    tags=("experiment", "equivalence", "exact-arith"),
)
def q_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two one-sided tests for equivalence of the URGENT-order share
    across the parity split with margin delta = 1pp: both
    z = (diff + delta)/se and z = (delta - diff)/se must exceed
    z(0.95) = 1.645 to conclude the arms are the same WITHIN the
    margin. Counts are exact integers; the unpooled binomial SE is
    the only float step. The pre-experiment A/A gate 'prove the
    split is clean' runs exactly this."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.select(
        (F.col("o_custkey") % 2).alias("arm"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("hit"),
    )
    g = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hit").cast("bigint").alias("k"),
    )
    a = g.where(F.col("arm") == 1).alias("a")
    b = g.where(F.col("arm") == 0).alias("b")
    c = a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n0"),
        (F.col("a.k").cast("double") / F.col("a.n")).alias("p1"),
        (F.col("b.k").cast("double") / F.col("b.n")).alias("p0"),
    )
    se = F.sqrt(
        F.col("p1") * (1.0 - F.col("p1")) / F.col("n1")
        + F.col("p0") * (1.0 - F.col("p0")) / F.col("n0")
    )
    z = c.select("n1", "n0", "p1", "p0", se.alias("se"))
    delta = float(_TOST_DELTA)
    zl = (F.col("p1") - F.col("p0") + delta) / F.col("se")
    zu = (delta - (F.col("p1") - F.col("p0"))) / F.col("se")
    return z.select(
        F.col("n1").alias("n_arm1"),
        F.col("n0").alias("n_arm0"),
        (F.round(F.col("p1") - F.col("p0"), 6) + 0.0).alias("diff"),
        (F.round(zl, 4) + 0.0).alias("z_lower"),
        (F.round(zu, 4) + 0.0).alias("z_upper"),
        F.when((zl > 1.645) & (zu > 1.645), F.lit("equivalent"))
        .otherwise(F.lit("not-shown"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# SPRT replay over the daily URGENT share.
# ---------------------------------------------------------------------------
@register(
    "sprt_replay",
    f"""
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM orders GROUP BY o_orderdate),
    consts AS (
      SELECT CAST(floor(1e9 * ln({_SPRT_P1} / {_SPRT_P0}) + 0.5) AS BIGINT)
               AS c1,
             CAST(floor(1e9 * ln((1.0 - {_SPRT_P1}) / (1.0 - {_SPRT_P0})) + 0.5)
                  AS BIGINT) AS c2,
             CAST(floor(1e9 * ln((1.0 - {_SPRT_ALPHA}) / {_SPRT_ALPHA}) + 0.5)
                  AS BIGINT) AS bnd),
    walk AS (
      SELECT dt,
             sum(k * c.c1 + (n - k) * c.c2) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr_e9,
             c.bnd
      FROM d CROSS JOIN consts c),
    crossed AS (
      SELECT dt, llr_e9, bnd,
             CASE WHEN llr_e9 > bnd THEN 'h1'
                  WHEN llr_e9 < -bnd THEN 'h0' END AS hit
      FROM walk),
    firstx AS (
      SELECT dt, hit FROM crossed WHERE hit IS NOT NULL
      ORDER BY dt LIMIT 1),
    lastw AS (
      SELECT llr_e9 FROM walk ORDER BY dt DESC LIMIT 1),
    n_days AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d)
    SELECT (SELECT nd FROM n_days) AS n_days,
           coalesce((SELECT hit FROM firstx), 'continue') AS decision,
           (SELECT strftime(dt, '%Y-%m-%d') FROM firstx) AS decision_date,
           round((SELECT llr_e9 FROM lastw) / 1e9, 6) AS final_llr
    """,
    tags=("experiment", "sequential", "exact-arith"),
)
def q_sprt_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT replay: is the URGENT share 0.19 (H0) or 0.21 (H1)?
    Each day adds the exact integer k*C1 + (n-k)*C2 where C1 =
    floor(1e9 ln(p1/p0)) and C2 = floor(1e9 ln(q1/q0)) -- the random
    walk and its ln(19/1)-style boundaries live entirely in e9
    integers, so the FIRST crossing day is engine-exact. The
    always-on monitoring rule with guaranteed error rates that naive
    daily peeking destroys."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    p0, p1, alpha = float(_SPRT_P0), float(_SPRT_P1), float(_SPRT_ALPHA)
    import math

    c1 = math.floor(1e9 * math.log(p1 / p0) + 0.5)
    c2 = math.floor(1e9 * math.log((1.0 - p1) / (1.0 - p0)) + 0.5)
    bnd = math.floor(1e9 * math.log((1.0 - alpha) / alpha) + 0.5)
    from pyspark.sql import Window

    w = Window.orderBy("dt").rowsBetween(Window.unboundedPreceding, 0)
    walk = d.select(
        "dt",
        F.sum(F.col("k") * F.lit(c1) + (F.col("n") - F.col("k")) * F.lit(c2))
        .over(w)
        .alias("llr_e9"),
    )
    crossed = walk.select(
        "dt",
        "llr_e9",
        F.when(F.col("llr_e9") > bnd, F.lit("h1"))
        .when(F.col("llr_e9") < -bnd, F.lit("h0"))
        .alias("hit"),
    )
    # min_by aggregation stays lazy AND yields a single NULL row when
    # no boundary is ever crossed (matching the SQL scalar subqueries)
    firstx = crossed.where(F.col("hit").isNotNull()).agg(
        F.min("dt").alias("fdt"),
        F.expr("min_by(hit, dt)").alias("fhit"),
    )
    lastw = walk.orderBy(F.col("dt").desc()).limit(1).select(
        F.round(F.col("llr_e9") / 1e9, 6).alias("final_llr")
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        nd.crossJoin(F.broadcast(lastw))
        .crossJoin(F.broadcast(firstx))
        .select(
            "n_days",
            F.coalesce(F.col("fhit"), F.lit("continue")).alias("decision"),
            F.date_format("fdt", "yyyy-MM-dd").alias("decision_date"),
            "final_llr",
        )
    )


# ---------------------------------------------------------------------------
# CR-k concentration curve over customer revenue.
# ---------------------------------------------------------------------------
@register(
    "concentration_curve_crk",
    """
    WITH spend AS (
      SELECT o_custkey AS ck,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT s,
             CAST(row_number() OVER (ORDER BY s DESC, ck) AS BIGINT) AS r,
             sum(s) OVER (ORDER BY s DESC, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM spend),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS HUGEINT) AS st,
             CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2
      FROM spend)
    SELECT t.n AS n_customers,
           round(CAST((SELECT cum FROM ranked WHERE r = 1) AS DOUBLE)
                 / CAST(t.st AS DOUBLE), 6) AS cr1,
           round(CAST((SELECT cum FROM ranked WHERE r = 4) AS DOUBLE)
                 / CAST(t.st AS DOUBLE), 6) AS cr4,
           round(CAST((SELECT cum FROM ranked WHERE r = 8) AS DOUBLE)
                 / CAST(t.st AS DOUBLE), 6) AS cr8,
           round(CAST((SELECT cum FROM ranked WHERE r = 20) AS DOUBLE)
                 / CAST(t.st AS DOUBLE), 6) AS cr20,
           round(CAST(t.st AS DOUBLE) * t.st / CAST(t.s2 AS DOUBLE), 2)
             AS effective_customers
    FROM tot t
    """,
    tags=("econ", "concentration", "exact-arith"),
)
def q_concentration_curve_crk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR-k concentration points of customer revenue (share of the
    top 1/4/8/20 customers under the deterministic (spend desc,
    custkey) order, exact prefix sums off the rank operator) plus the
    effective number of equal customers S^2 / sum(s^2) -- the inverse
    Herfindahl. CR4 > 40% is the classic oligopoly flag; effective_n
    is what 'we have 1000 customers' really means for risk."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("s")
    )
    ranked = with_global_rank(
        spend,
        "s",
        [F.col("s").desc(), F.col("ck").asc()],
        ascending=False,
        prefix_sum={"cum": "s"},
    ).select(F.col("global_rank").alias("r"), "cum")
    tot = spend.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast(_DEC).alias("st"),
        F.sum(F.col("s").cast(_DEC) * F.col("s").cast(_DEC)).cast(_DEC).alias("s2"),
    )
    cuts = (
        ranked.where(F.col("r").isin(1, 4, 8, 20))
        .groupBy()
        .pivot("r", [1, 4, 8, 20])
        .agg(F.first("cum"))
        .withColumnRenamed("1", "c1")
        .withColumnRenamed("4", "c4")
        .withColumnRenamed("8", "c8")
        .withColumnRenamed("20", "c20")
    )
    std = F.col("st").cast("double")
    return tot.crossJoin(F.broadcast(cuts)).select(
        F.col("n").alias("n_customers"),
        F.round(F.col("c1").cast("double") / std, 6).alias("cr1"),
        F.round(F.col("c4").cast("double") / std, 6).alias("cr4"),
        F.round(F.col("c8").cast("double") / std, 6).alias("cr8"),
        F.round(F.col("c20").cast("double") / std, 6).alias("cr20"),
        F.round(std * F.col("st") / F.col("s2").cast("double"), 2).alias(
            "effective_customers"
        ),
    )
