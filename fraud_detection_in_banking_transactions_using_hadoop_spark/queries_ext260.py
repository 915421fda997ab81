"""Extension batch 260 (round 12): exact Bayesian model comparison and
empirical-Bayes shrinkage -- the two Bayesian-methodology gaps.

- bayes_factor_conversion: the EXACT Beta-Binomial Bayes factor for
  "do two customer segments share one order-fulfillment rate?" --
  marginal likelihoods under Beta(1,1) priors are ratios of Beta
  functions at INTEGER arguments, so ln BF is pure integer algebra
  over quantized log-factorials: L(n) = sum_{k<=n} floor(ln k * 1e12
  + 0.5) (each term identical in both engines, the sum order-free),
  and ln BF_10 = [L(s1)+L(f1)-L(s1+f1+1)] + [L(s2)+L(f2)-L(s2+f2+1)]
  - [L(s)+L(f)-L(s+f+1)]. No float ever crosses an aggregate; the
  Jeffreys evidence bucket is decided by integer thresholds. The
  frequentist two-proportion z tier gets its Bayesian twin.

- empirical_bayes_rates: Beta-Binomial empirical Bayes (Robbins/
  Efron-Morris for rates, the baseball-batting classic): per-customer
  fulfillment rates e9-quantized BEFORE the moment sums (exact
  integers), method-of-moments prior (alpha, beta) from those
  moments, and per-customer posterior-mean shrinkage
  (alpha + s) / (alpha + beta + n). Top-20 largest shrinkage moves --
  exactly the customers whose raw rates are noise. Complements
  james_stein_means (Gaussian) with the conjugate-count version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_SEG = "BUILDING"  # group 1; group 2 = every other segment

# ln BF thresholds (Jeffreys): e12-quantized Python literals, shared
import math

_LN10_E12 = int(math.floor(math.log(10.0) * 1e12 + 0.5))
_LNRT10_E12 = int(math.floor(math.log(math.sqrt(10.0)) * 1e12 + 0.5))

_BF_SQL = f"""
    WITH base AS (
      SELECT CASE WHEN c.c_mktsegment = '{_SEG}' THEN 1 ELSE 2 END AS g,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    counts AS (
      SELECT CAST(sum(CASE WHEN g = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN g = 1 THEN 1 - y ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(sum(CASE WHEN g = 2 THEN y ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN g = 2 THEN 1 - y ELSE 0 END) AS BIGINT)
               AS f2
      FROM base),
    mx AS (SELECT s1 + f1 + s2 + f2 + 1 AS m FROM counts),
    ks AS (
      SELECT unnest(range(1, m + 1)) AS k FROM mx),
    lf AS (
      -- quantized log-factorial evaluated at the six needed integers:
      -- each ln k floors to an e12 integer, sums are order-free
      SELECT
        sum(CASE WHEN k <= c.s1 THEN t ELSE 0 END) AS l_s1,
        sum(CASE WHEN k <= c.f1 THEN t ELSE 0 END) AS l_f1,
        sum(CASE WHEN k <= c.s1 + c.f1 + 1 THEN t ELSE 0 END) AS l_n1,
        sum(CASE WHEN k <= c.s2 THEN t ELSE 0 END) AS l_s2,
        sum(CASE WHEN k <= c.f2 THEN t ELSE 0 END) AS l_f2,
        sum(CASE WHEN k <= c.s2 + c.f2 + 1 THEN t ELSE 0 END) AS l_n2,
        sum(CASE WHEN k <= c.s1 + c.s2 THEN t ELSE 0 END) AS l_s,
        sum(CASE WHEN k <= c.f1 + c.f2 THEN t ELSE 0 END) AS l_f,
        sum(CASE WHEN k <= c.s1 + c.f1 + c.s2 + c.f2 + 1 THEN t
            ELSE 0 END) AS l_n
      FROM (SELECT k,
                   CAST(floor(ln(CAST(k AS DOUBLE)) * 1e12 + 0.5)
                        AS HUGEINT) AS t
            FROM ks) q CROSS JOIN counts c),
    bf AS (
      SELECT c.s1, c.f1, c.s2, c.f2,
             CAST((l.l_s1 + l.l_f1 - l.l_n1)
                  + (l.l_s2 + l.l_f2 - l.l_n2)
                  - (l.l_s + l.l_f - l.l_n) AS HUGEINT) AS ln_bf_e12
      FROM counts c CROSS JOIN lf l)
    SELECT s1 AS successes_1, f1 AS failures_1,
           s2 AS successes_2, f2 AS failures_2,
           CAST((1000000 * s1) // (s1 + f1) AS BIGINT) AS rate1_ppm,
           CAST((1000000 * s2) // (s2 + f2) AS BIGINT) AS rate2_ppm,
           CAST(ln_bf_e12 // 1000000 AS BIGINT) AS ln_bf_e6,
           CASE WHEN ln_bf_e12 > {_LN10_E12} THEN 'strong_h1'
                WHEN ln_bf_e12 > {_LNRT10_E12} THEN 'substantial_h1'
                WHEN ln_bf_e12 > -{_LNRT10_E12} THEN 'inconclusive'
                WHEN ln_bf_e12 > -{_LN10_E12} THEN 'substantial_h0'
                ELSE 'strong_h0' END AS jeffreys_bucket
    FROM bf
    """


@register(
    "bayes_factor_conversion",
    _BF_SQL,
    tags=("bayesian", "abtest", "exact-arith"),
)
def q_bayes_factor_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Beta-Binomial Bayes factor for a two-segment rate
    difference (module docstring): quantized log-factorial integer
    algebra end to end, Jeffreys bucket by integer thresholds."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    base = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.when(F.col("c_mktsegment") == _SEG, 1).otherwise(2).alias("g"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    c = base.agg(
        F.sum(F.when(F.col("g") == 1, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("g") == 1, 1 - F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("g") == 2, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.when(F.col("g") == 2, 1 - F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    ).localCheckpoint(eager=True)
    row = c.collect()[0]
    s1, f1, s2, f2 = (int(row[x]) for x in ("s1", "f1", "s2", "f2"))
    m = s1 + f1 + s2 + f2 + 1
    ks = spark.range(1, m + 1).select(
        F.col("id").alias("k"),
        F.expr(
            "CAST(floor(ln(CAST(id AS DOUBLE)) * 1e12 + 0.5)"
            " AS DECIMAL(38,0))"
        ).alias("t"),
    )

    def lsum(n: int) -> F.Column:
        return (
            F.sum(F.when(F.col("k") <= n, F.col("t")).otherwise(0))
            .cast("decimal(38,0)")
        )

    lf = ks.agg(
        lsum(s1).alias("l_s1"),
        lsum(f1).alias("l_f1"),
        lsum(s1 + f1 + 1).alias("l_n1"),
        lsum(s2).alias("l_s2"),
        lsum(f2).alias("l_f2"),
        lsum(s2 + f2 + 1).alias("l_n2"),
        lsum(s1 + s2).alias("l_s"),
        lsum(f1 + f2).alias("l_f"),
        lsum(s1 + f1 + s2 + f2 + 1).alias("l_n"),
    ).collect()[0]
    ln_bf_e12 = (
        (int(lf["l_s1"]) + int(lf["l_f1"]) - int(lf["l_n1"]))
        + (int(lf["l_s2"]) + int(lf["l_f2"]) - int(lf["l_n2"]))
        - (int(lf["l_s"]) + int(lf["l_f"]) - int(lf["l_n"]))
    )
    if ln_bf_e12 > _LN10_E12:
        bucket = "strong_h1"
    elif ln_bf_e12 > _LNRT10_E12:
        bucket = "substantial_h1"
    elif ln_bf_e12 > -_LNRT10_E12:
        bucket = "inconclusive"
    elif ln_bf_e12 > -_LN10_E12:
        bucket = "substantial_h0"
    else:
        bucket = "strong_h0"
    out = (
        s1,
        f1,
        s2,
        f2,
        (1_000_000 * s1) // (s1 + f1),
        (1_000_000 * s2) // (s2 + f2),
        _int_div_trunc(ln_bf_e12, 1_000_000),
        bucket,
    )
    return spark.createDataFrame(
        [out],
        "successes_1 long, failures_1 long, successes_2 long,"
        " failures_2 long, rate1_ppm long, rate2_ppm long,"
        " ln_bf_e6 long, jeffreys_bucket string",
    )


def _int_div_trunc(a: int, b: int) -> int:
    """DuckDB // on signed integers truncates toward zero (verified in
    the r7 build notes); Python // floors -- align on truncation."""
    q = abs(a) // b
    return q if a >= 0 else -q


_EB_SQL = """
    WITH per AS (
      SELECT o_custkey AS k,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey),
    q AS (
      SELECT k, s, n,
             CAST((1000000000 * s) // n AS BIGINT) AS r_e9
      FROM per),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(CAST(r_e9 AS HUGEINT)) AS HUGEINT) AS sr,
             CAST(sum(CAST(r_e9 AS HUGEINT) * r_e9) AS HUGEINT) AS srr
      FROM q),
    prior AS (
      SELECT nc,
             CAST(sr AS DOUBLE) / 1e9 / CAST(nc AS DOUBLE) AS m,
             CAST(nc * srr - sr * sr AS DOUBLE) / 1e18
               / CAST(nc AS DOUBLE) / CAST(nc AS DOUBLE) AS v
      FROM mom),
    ab AS (
      SELECT nc, m, v,
             CASE WHEN v <= 0.0 OR m * (1.0 - m) / v - 1.0 <= 0.0
                  THEN CAST(1000000 AS DOUBLE)
                  ELSE m * (1.0 - m) / v - 1.0 END AS ab_sum
      FROM prior),
    shrunk AS (
      SELECT q.k, q.s, q.n, q.r_e9,
             CAST(floor((a.m * a.ab_sum + CAST(q.s AS DOUBLE))
                        / (a.ab_sum + CAST(q.n AS DOUBLE)) * 1e9 + 0.5)
                  AS BIGINT) AS post_e9,
             CAST(floor(a.m * a.ab_sum * 1e6 + 0.5) AS BIGINT)
               AS alpha_e6,
             CAST(floor((1.0 - a.m) * a.ab_sum * 1e6 + 0.5) AS BIGINT)
               AS beta_e6
      FROM q CROSS JOIN ab a)
    SELECT k AS custkey, n AS n_orders, s AS n_f,
           CAST(r_e9 // 1000 AS BIGINT) AS raw_ppm,
           CAST(post_e9 // 1000 AS BIGINT) AS shrunk_ppm,
           CAST(abs(r_e9 - post_e9) // 1000 AS BIGINT) AS shift_ppm,
           alpha_e6, beta_e6
    FROM shrunk
    ORDER BY abs(r_e9 - post_e9) // 1000 DESC, k
    LIMIT 20
    """


@register(
    "empirical_bayes_rates",
    _EB_SQL,
    tags=("bayesian", "shrinkage", "exact-arith"),
)
def q_empirical_bayes_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-Binomial empirical-Bayes shrinkage of per-customer
    fulfillment rates (module docstring): e9-quantized rates, exact
    integer moments, MoM prior, posterior means; top-20 largest
    shrinkage moves."""
    per = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    q = per.select(
        "k",
        "s",
        "n",
        F.expr("CAST((1000000000 * s) DIV n AS BIGINT)").alias("r_e9"),
    ).localCheckpoint(eager=True)
    mom = q.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nc"),
        F.sum(F.col("r_e9").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sr"),
        F.sum(F.col("r_e9").cast("decimal(38,0)") * F.col("r_e9"))
        .cast("decimal(38,0)")
        .alias("srr"),
    )
    ab = mom.select(
        "nc",
        (F.col("sr").cast("double") / 1e9 / F.col("nc").cast("double")).alias(
            "m"
        ),
        (
            (F.col("nc") * F.col("srr") - F.col("sr") * F.col("sr")).cast(
                "double"
            )
            / 1e18
            / F.col("nc").cast("double")
            / F.col("nc").cast("double")
        ).alias("v"),
    ).select(
        "m",
        "v",
        F.expr(
            "CASE WHEN v <= 0.0D OR m * (1.0D - m) / v - 1.0D <= 0.0D"
            " THEN CAST(1000000 AS DOUBLE)"
            " ELSE m * (1.0D - m) / v - 1.0D END"
        ).alias("ab_sum"),
    )
    shrunk = q.crossJoin(F.broadcast(ab)).select(
        "k",
        "s",
        "n",
        "r_e9",
        F.expr(
            "CAST(floor((m * ab_sum + CAST(s AS DOUBLE))"
            " / (ab_sum + CAST(n AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"
        ).alias("post_e9"),
        F.expr("CAST(floor(m * ab_sum * 1e6 + 0.5) AS BIGINT)").alias(
            "alpha_e6"
        ),
        F.expr(
            "CAST(floor((1.0D - m) * ab_sum * 1e6 + 0.5) AS BIGINT)"
        ).alias("beta_e6"),
    )
    return (
        shrunk.select(
            F.col("k").alias("custkey"),
            F.col("n").alias("n_orders"),
            F.col("s").alias("n_f"),
            F.expr("CAST(r_e9 DIV 1000 AS BIGINT)").alias("raw_ppm"),
            F.expr("CAST(post_e9 DIV 1000 AS BIGINT)").alias("shrunk_ppm"),
            F.expr("CAST(abs(r_e9 - post_e9) DIV 1000 AS BIGINT)").alias(
                "shift_ppm"
            ),
            "alpha_e6",
            "beta_e6",
        )
        .orderBy(F.col("shift_ppm").desc(), "custkey")
        .limit(20)
    )
