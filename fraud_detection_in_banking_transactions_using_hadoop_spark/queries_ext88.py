"""Extension batch 88: errors-in-both-variables regression (Deming),
the Breslow-Day homogeneity companion to CMH, and indirect
standardization (SMR).

- deming_regression: OLS (grouped_ols_trends) assumes x is noiseless;
  when BOTH axes are measured (daily order count vs daily revenue),
  total least squares is the defensible line. The delta = 1 closed
  form beta = (Syy - Sxx + sqrt((Syy - Sxx)^2 + 4 Sxy^2)) / (2 Sxy)
  runs on exact n-scaled central moments.
- breslow_day_test: cmh_pooled_odds reports ONE pooled odds ratio;
  Breslow-Day asks whether a single ratio is even defensible across
  the 25 nation strata. Each stratum's fitted cell solves the exact
  quadratic under the MH common OR; per-stratum terms are e6-scaled
  integers before the cross-stratum sum.
- indirect_standardization_smr: the epidemiologist's O/E ratio --
  observed discounted-line returns vs expected under per-stratum
  baseline rates -- with the Poisson z = (O - E)/sqrt(E). The
  case-mix-adjusted 'is this segment worse than its mix predicts'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

_CELLS_SQL = """
    base AS (
      SELECT c.c_nationkey AS stratum,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS exposed,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS outcome
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey),
    cells AS (
      SELECT stratum,
             CAST(sum(exposed * outcome) AS BIGINT) AS a,
             CAST(sum(exposed * (1 - outcome)) AS BIGINT) AS b,
             CAST(sum((1 - exposed) * outcome) AS BIGINT) AS c,
             CAST(sum((1 - exposed) * (1 - outcome)) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY stratum)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_discount", "l_returnflag"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .select(
            F.col("c_nationkey").alias("stratum"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("exposed"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("outcome"),
        )
    )
    return base.groupBy("stratum").agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("bigint").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome")).cast("bigint").alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome")))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Deming (total least squares) regression of revenue on order count.
# ---------------------------------------------------------------------------
@register(
    "deming_regression",
    """
    WITH d AS (
      SELECT CAST(count(*) AS BIGINT) AS x,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM d),
    c AS (
      SELECT n,
             CAST(sx AS DOUBLE) / n AS mx,
             CAST(sy AS DOUBLE) / n AS my,
             CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
             CAST(n * syy - sy * sy AS DOUBLE) AS cyy
      FROM mom),
    fit AS (
      SELECT n, mx, my, cxy, cxx,
             (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy))
               / (2.0 * cxy) AS beta
      FROM c)
    SELECT n AS n_days,
           round(beta / 100.0, 4) AS deming_slope_dollars,
           round(cxy / cxx / 100.0, 4) AS ols_slope_dollars,
           round((my - beta * mx) / 100.0, 2) + 0.0 AS intercept_dollars,
           round(beta * cxx / cxy, 6) AS attenuation_factor
    FROM fit
    """,
    tags=("regression", "tls", "exact-arith"),
)
def q_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming (delta = 1 total least squares) fit of daily revenue on
    daily order count: beta = (Cyy - Cxx + sqrt((Cyy - Cxx)^2 +
    4 Cxy^2)) / (2 Cxy) on exact n-scaled central moments -- the line
    that minimizes PERPENDICULAR distance, defensible when both axes
    carry noise. attenuation_factor = beta_deming/beta_ols > 1 shows
    how much OLS understates the slope under x-noise."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y"),
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(dd("x") * dd("x")).cast(_DEC).alias("sxx"),
        F.sum(dd("x") * dd("y")).cast(_DEC).alias("sxy"),
        F.sum(dd("y") * dd("y")).cast(_DEC).alias("syy"),
    )
    nd = F.col("n").cast(_DEC)
    c = mom.select(
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double").alias("cxx"),
        (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double").alias("cxy"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
    )
    beta = (
        F.col("cyy")
        - F.col("cxx")
        + F.sqrt(
            (F.col("cyy") - F.col("cxx")) * (F.col("cyy") - F.col("cxx"))
            + 4.0 * F.col("cxy") * F.col("cxy")
        )
    ) / (2.0 * F.col("cxy"))
    fit = c.select("n", "mx", "my", "cxy", "cxx", beta.alias("beta"))
    return fit.select(
        F.col("n").alias("n_days"),
        F.round(F.col("beta") / 100.0, 4).alias("deming_slope_dollars"),
        F.round(F.col("cxy") / F.col("cxx") / 100.0, 4).alias("ols_slope_dollars"),
        (
            F.round((F.col("my") - F.col("beta") * F.col("mx")) / 100.0, 2) + 0.0
        ).alias("intercept_dollars"),
        F.round(F.col("beta") * F.col("cxx") / F.col("cxy"), 6).alias(
            "attenuation_factor"
        ),
    )


# ---------------------------------------------------------------------------
# Breslow-Day homogeneity of odds ratios across nation strata.
# ---------------------------------------------------------------------------
@register(
    "breslow_day_test",
    f"""
    WITH {_CELLS_SQL},
    ok AS (
      SELECT * FROM cells
      WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0),
    psi AS (
      SELECT CAST(sum(CAST(round(1e9 * CAST(a AS DOUBLE) * d / n, 0) AS BIGINT))
                  AS DOUBLE)
             / CAST(sum(CAST(round(1e9 * CAST(b AS DOUBLE) * c / n, 0)
                             AS BIGINT)) AS DOUBLE) AS w
      FROM ok),
    fitted AS (
      SELECT o.a, o.b, o.c, o.d, o.n, p.w,
             o.a + o.b AS r1, o.a + o.c AS c1,
             (p.w * ((o.a + o.b) + (o.a + o.c))
              + (o.n - (o.a + o.b) - (o.a + o.c))) AS bq,
             (p.w - 1.0) AS aq,
             p.w * (o.a + o.b) * (o.a + o.c) AS cq
      FROM ok o CROSS JOIN psi p),
    sol AS (
      SELECT a, b, c, d, n, r1, c1,
             (bq - sqrt(bq * bq - 4.0 * aq * cq)) / (2.0 * aq) AS atil
      FROM fitted),
    terms AS (
      SELECT CAST(floor(1e6 * ((CAST(a AS DOUBLE) - atil)
                               * (CAST(a AS DOUBLE) - atil)
                               * (1.0 / atil + 1.0 / (r1 - atil)
                                  + 1.0 / (c1 - atil)
                                  + 1.0 / (n - r1 - c1 + atil))) + 0.5)
                  AS BIGINT) AS t_e6
      FROM sol),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(t_e6) AS HUGEINT) AS s
      FROM terms)
    SELECT CAST(k AS INTEGER) AS n_strata,
           round(CAST(s AS DOUBLE) / 1e6, 4) AS bd_stat,
           CAST(k - 1 AS INTEGER) AS dof
    FROM agg
    """,
    tags=("stats", "stratified", "exact-arith"),
)
def q_breslow_day_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breslow-Day: is ONE odds ratio defensible across the 25 nation
    strata of cmh_pooled_odds? Per stratum the fitted exposed-outcome
    cell solves the exact quadratic (psi-1) a^2 - [psi(r1+c1) +
    (N-r1-c1)] a + psi r1 c1 = 0 (minus root) under the MH common OR;
    BD = sum (a - atil)^2 (1/atil + 1/(r1-atil) + 1/(c1-atil) +
    1/(N-r1-c1+atil)), each stratum's term e6-floored before the sum.
    A significant BD means cmh's pooled ratio averages away real
    heterogeneity."""
    cells = _cells(spark, sf_dir)
    ok = cells.where(
        ((F.col("a") + F.col("b")) > 0)
        & ((F.col("c") + F.col("d")) > 0)
        & ((F.col("a") + F.col("c")) > 0)
        & ((F.col("b") + F.col("d")) > 0)
    )
    psi = ok.agg(
        (
            F.sum(
                F.round(
                    F.lit(1e9) * F.col("a").cast("double") * F.col("d") / F.col("n"),
                    0,
                ).cast("bigint")
            ).cast("double")
            / F.sum(
                F.round(
                    F.lit(1e9) * F.col("b").cast("double") * F.col("c") / F.col("n"),
                    0,
                ).cast("bigint")
            ).cast("double")
        ).alias("w")
    )
    r1 = F.col("a") + F.col("b")
    c1 = F.col("a") + F.col("c")
    fitted = ok.crossJoin(F.broadcast(psi)).select(
        "a",
        "b",
        "c",
        "d",
        "n",
        "w",
        r1.alias("r1"),
        c1.alias("c1"),
        (F.col("w") * (r1 + c1) + (F.col("n") - r1 - c1)).alias("bq"),
        (F.col("w") - 1.0).alias("aq"),
        (F.col("w") * r1 * c1).alias("cq"),
    )
    atil = (
        F.col("bq")
        - F.sqrt(F.col("bq") * F.col("bq") - 4.0 * F.col("aq") * F.col("cq"))
    ) / (2.0 * F.col("aq"))
    sol = fitted.select("a", "b", "c", "d", "n", "r1", "c1", atil.alias("atil"))
    term = (
        (F.col("a").cast("double") - F.col("atil"))
        * (F.col("a").cast("double") - F.col("atil"))
        * (
            1.0 / F.col("atil")
            + 1.0 / (F.col("r1") - F.col("atil"))
            + 1.0 / (F.col("c1") - F.col("atil"))
            + 1.0 / (F.col("n") - F.col("r1") - F.col("c1") + F.col("atil"))
        )
    )
    terms = sol.select(
        F.floor(F.lit(1e6) * term + 0.5).cast("bigint").alias("t_e6")
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("t_e6").cast(_DEC).alias("s"),
    )
    return agg.select(
        F.col("k").cast("int").alias("n_strata"),
        F.round(F.col("s").cast("double") / 1e6, 4).alias("bd_stat"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Indirect standardization: SMR of discounted-line returns.
# ---------------------------------------------------------------------------
@register(
    "indirect_standardization_smr",
    f"""
    WITH {_CELLS_SQL},
    rates AS (
      SELECT stratum, a, b, c, d, n,
             CAST(a + c AS BIGINT) AS tot_out,
             CAST(a + b AS BIGINT) AS exp_n
      FROM cells WHERE a + b > 0),
    agg AS (
      SELECT CAST(sum(a) AS BIGINT) AS observed,
             CAST(sum(CAST(round(1e9 * CAST(tot_out AS DOUBLE) * exp_n / n, 0)
                           AS BIGINT)) AS HUGEINT) AS expected_e9,
             CAST(count(*) AS BIGINT) AS k
      FROM rates)
    SELECT CAST(k AS INTEGER) AS n_strata,
           observed,
           round(CAST(expected_e9 AS DOUBLE) / 1e9, 4) AS expected,
           round(CAST(observed AS DOUBLE)
                 / (CAST(expected_e9 AS DOUBLE) / 1e9), 6) AS smr,
           round((CAST(observed AS DOUBLE)
                  - CAST(expected_e9 AS DOUBLE) / 1e9)
                 / sqrt(CAST(expected_e9 AS DOUBLE) / 1e9), 4) + 0.0 AS z_score
    FROM agg
    """,
    tags=("stats", "standardization", "exact-arith"),
)
def q_indirect_standardization_smr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirectly standardized return ratio for discounted lines:
    expected returns = sum over nation strata of (stratum return
    rate) x (discounted lines in stratum), each stratum's expectation
    e9-rounded before the sum; SMR = O/E with the Poisson z =
    (O-E)/sqrt(E). Answers 'do discounted lines return more than
    their NATION MIX predicts' -- the case-mix correction a raw rate
    comparison (odds_ratio_screen) skips."""
    cells = _cells(spark, sf_dir)
    rates = cells.where((F.col("a") + F.col("b")) > 0).select(
        "a",
        "n",
        (F.col("a") + F.col("c")).cast("bigint").alias("tot_out"),
        (F.col("a") + F.col("b")).cast("bigint").alias("exp_n"),
    )
    agg = rates.agg(
        F.sum("a").cast("bigint").alias("observed"),
        F.sum(
            F.round(
                F.lit(1e9) * F.col("tot_out").cast("double") * F.col("exp_n")
                / F.col("n"),
                0,
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("expected_e9"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    e = F.col("expected_e9").cast("double") / 1e9
    return agg.select(
        F.col("k").cast("int").alias("n_strata"),
        "observed",
        F.round(e, 4).alias("expected"),
        F.round(F.col("observed").cast("double") / e, 6).alias("smr"),
        (
            F.round((F.col("observed").cast("double") - e) / F.sqrt(e), 4) + 0.0
        ).alias("z_score"),
    )
