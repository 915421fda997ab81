"""Extension batch 108: the gravity trade model, the MDE accrual
curve, and a zero-inflation score test.

- gravity_trade_model: the most replicated equation in economics --
  ln(flow_cs) = a + b1 ln(mass_c) + b2 ln(mass_s) over the customer-
  nation x supplier-nation revenue matrix. Cell and mass logs floor
  to e9 integers; the 2x2 normal equations close over exact sums, so
  the two elasticities (classically ~1) are engine-exact.
- mde_accrual_curve: 'how long must the test run' as a TABLE -- the
  minimum detectable effect at z(0.025)+z(0.2) as samples accrue
  week by week (cumulative exact counts off the week spine). The
  answer to 'can we stop yet' BEFORE anyone peeks at the metric.
- zero_inflation_score_test: are customer-month order counts MORE
  zero-heavy than Poisson predicts? The van den Broek score test
  compares observed zeros on the full customer x month grid (zeros
  materialized exactly by the grid join) with n e^-lambda.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Gravity model of customer-nation x supplier-nation trade.
# ---------------------------------------------------------------------------
@register(
    "gravity_trade_model",
    """
    WITH flows AS (
      SELECT c.c_nationkey AS cn, s.s_nationkey AS sn,
             CAST(sum(round(l.l_extendedprice * 100, 0)) AS BIGINT) // 100
               AS f
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey),
    cm AS (SELECT cn, CAST(sum(f) AS BIGINT) AS mc FROM flows GROUP BY cn),
    sm AS (SELECT sn, CAST(sum(f) AS BIGINT) AS ms FROM flows GROUP BY sn),
    pts AS (
      SELECT CAST(floor(1e9 * ln(CAST(fl.f AS DOUBLE)) + 0.5) AS BIGINT) AS y,
             CAST(floor(1e9 * ln(CAST(c.mc AS DOUBLE)) + 0.5) AS BIGINT) AS x1,
             CAST(floor(1e9 * ln(CAST(s.ms AS DOUBLE)) + 0.5) AS BIGINT) AS x2
      FROM flows fl JOIN cm c ON fl.cn = c.cn JOIN sm s ON fl.sn = s.sn
      WHERE fl.f > 0),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS HUGEINT) AS s1,
             CAST(sum(x2) AS HUGEINT) AS s2v,
             CAST(sum(y) AS HUGEINT) AS s0,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s10,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s20,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s00
      FROM pts),
    c2 AS (
      SELECT n,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s12 - s1 * s2v AS DOUBLE) AS c12,
             CAST(n * s22 - s2v * s2v AS DOUBLE) AS c22,
             CAST(n * s10 - s1 * s0 AS DOUBLE) AS c10,
             CAST(n * s20 - s2v * s0 AS DOUBLE) AS c20,
             CAST(n * s00 - s0 * s0 AS DOUBLE) AS c00
      FROM mom),
    fit AS (
      SELECT n,
             (c22 * c10 - c12 * c20) / (c11 * c22 - c12 * c12) AS b1,
             (c11 * c20 - c12 * c10) / (c11 * c22 - c12 * c12) AS b2,
             c10, c20, c00
      FROM c2)
    SELECT n AS n_flows,
           round(b1, 4) AS elasticity_customer_mass,
           round(b2, 4) AS elasticity_supplier_mass,
           round((b1 * c10 + b2 * c20) / c00, 6) AS r2
    FROM fit
    """,
    tags=("econ", "gravity", "exact-arith"),
)
def q_gravity_trade_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gravity equation on the 25 x 25 nation trade matrix:
    ln(flow) regressed on ln(customer-nation mass) and ln(supplier-
    nation mass) via the exact 2x2 closed form over e9-integer log
    terms. Elasticities near 1 reproduce the single most robust
    empirical regularity in trade economics -- on a synthetic
    warehouse, in two Spark jobs."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    flows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn"))
        .agg(
            F.expr(
                "CAST(sum(round(l_extendedprice * 100, 0)) AS BIGINT) DIV 100"
            ).alias("f")
        )
    )
    cm = flows.groupBy("cn").agg(F.sum("f").cast("bigint").alias("mc"))
    sm = flows.groupBy("sn").agg(F.sum("f").cast("bigint").alias("ms"))

    def l9(c):
        return F.floor(F.lit(1e9) * F.log(c.cast("double")) + 0.5).cast("bigint")

    pts = (
        flows.where(F.col("f") > 0)
        .join(F.broadcast(cm), "cn")
        .join(F.broadcast(sm), "sn")
        .select(
            l9(F.col("f")).alias("y"),
            l9(F.col("mc")).alias("x1"),
            l9(F.col("ms")).alias("x2"),
        )
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast(_DEC).alias("s1"),
        F.sum("x2").cast(_DEC).alias("s2v"),
        F.sum("y").cast(_DEC).alias("s0"),
        F.sum(dd("x1") * dd("x1")).cast(_DEC).alias("s11"),
        F.sum(dd("x1") * dd("x2")).cast(_DEC).alias("s12"),
        F.sum(dd("x2") * dd("x2")).cast(_DEC).alias("s22"),
        F.sum(dd("x1") * dd("y")).cast(_DEC).alias("s10"),
        F.sum(dd("x2") * dd("y")).cast(_DEC).alias("s20"),
        F.sum(dd("y") * dd("y")).cast(_DEC).alias("s00"),
    )
    nd = F.col("n").cast(_DEC)
    c2 = mom.select(
        "n",
        (nd * F.col("s11") - F.col("s1") * F.col("s1")).cast("double").alias("c11"),
        (nd * F.col("s12") - F.col("s1") * F.col("s2v")).cast("double").alias("c12"),
        (nd * F.col("s22") - F.col("s2v") * F.col("s2v")).cast("double").alias("c22"),
        (nd * F.col("s10") - F.col("s1") * F.col("s0")).cast("double").alias("c10"),
        (nd * F.col("s20") - F.col("s2v") * F.col("s0")).cast("double").alias("c20"),
        (nd * F.col("s00") - F.col("s0") * F.col("s0")).cast("double").alias("c00"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c10") - F.col("c12") * F.col("c20")) / det
    b2 = (F.col("c11") * F.col("c20") - F.col("c12") * F.col("c10")) / det
    fit = c2.select("n", b1.alias("b1"), b2.alias("b2"), "c10", "c20", "c00")
    return fit.select(
        F.col("n").alias("n_flows"),
        F.round("b1", 4).alias("elasticity_customer_mass"),
        F.round("b2", 4).alias("elasticity_supplier_mass"),
        F.round(
            (F.col("b1") * F.col("c10") + F.col("b2") * F.col("c20")) / F.col("c00"),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# MDE accrual curve as samples arrive week by week.
# ---------------------------------------------------------------------------
@register(
    "mde_accrual_curve",
    """
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS w,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM orders
      WHERE date_part('year', o_orderdate) = 1997
      GROUP BY 1),
    cum AS (
      SELECT w,
             sum(n) OVER (ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
             sum(k) OVER (ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck,
             row_number() OVER (ORDER BY w) AS i
      FROM wk)
    SELECT CAST(i AS INTEGER) AS week_no,
           CAST(cn AS BIGINT) AS cum_n,
           round(CAST(ck AS DOUBLE) / cn, 6) AS base_rate,
           round((1.959964 + 0.841621)
                 * sqrt(2.0 * (CAST(ck AS DOUBLE) / cn)
                        * (1.0 - CAST(ck AS DOUBLE) / cn)
                        / (CAST(cn AS DOUBLE) / 2.0)), 6) AS mde_abs
    FROM cum
    WHERE i % 4 = 0 OR i = 1
    ORDER BY week_no
    """,
    tags=("experiment", "power", "exact-arith"),
)
def q_mde_accrual_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minimum detectable effect (80% power, 5% two-sided) on the
    URGENT share as 1997 samples accrue: with cumulative exact counts
    from the week spine, MDE = (z_a + z_b) sqrt(2 p (1-p) / (n/2))
    assuming a 50/50 split of the accrued traffic. Printed every 4th
    week -- the accrual curve that answers 'how long until we could
    see a 1pp effect' before the experiment even starts."""
    orders = read_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    wk = (
        orders.where(F.year("o_orderdate") == 1997)
        .groupBy(F.date_trunc("week", "o_orderdate").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    win = Window.orderBy("w")
    cum = wk.select(
        F.sum("n").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cn"),
        F.sum("k").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("ck"),
        F.row_number().over(win).alias("i"),
    )
    p = F.col("ck").cast("double") / F.col("cn")
    mde = (1.959964 + 0.841621) * F.sqrt(
        2.0 * p * (1.0 - p) / (F.col("cn").cast("double") / 2.0)
    )
    return (
        cum.where((F.col("i") % 4 == 0) | (F.col("i") == 1))
        .select(
            F.col("i").cast("int").alias("week_no"),
            F.col("cn").cast("bigint").alias("cum_n"),
            F.round(p, 6).alias("base_rate"),
            F.round(mde, 6).alias("mde_abs"),
        )
        .orderBy("week_no")
    )


# ---------------------------------------------------------------------------
# Zero-inflation score test on customer-month order counts.
# ---------------------------------------------------------------------------
@register(
    "zero_inflation_score_test",
    """
    WITH months AS (
      SELECT DISTINCT date_trunc('month', o_orderdate) AS m FROM orders
      WHERE date_part('year', o_orderdate) IN (1996, 1997)),
    custs AS (SELECT DISTINCT o_custkey AS ck FROM orders),
    obs AS (
      SELECT o_custkey AS ck, date_trunc('month', o_orderdate) AS m,
             CAST(count(*) AS BIGINT) AS c
      FROM orders WHERE date_part('year', o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2),
    grid AS (
      SELECT cu.ck, mo.m, coalesce(ob.c, 0) AS c
      FROM custs cu CROSS JOIN months mo
      LEFT JOIN obs ob ON ob.ck = cu.ck AND ob.m = mo.m),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(c) AS HUGEINT) AS sc
      FROM grid),
    c2 AS (
      SELECT n, n0,
             CAST(sc AS DOUBLE) / n AS lam,
             CAST(n AS DOUBLE) * exp(-(CAST(sc AS DOUBLE) / n)) AS e0
      FROM s)
    SELECT n AS n_cells, n0 AS observed_zeros,
           round(lam, 4) AS lambda_hat,
           round(e0, 2) AS poisson_expected_zeros,
           round((CAST(n0 AS DOUBLE) - e0) * (CAST(n0 AS DOUBLE) - e0)
                 / (e0 * (1.0 - exp(-lam))
                    - CAST(n AS DOUBLE) * lam * exp(-lam) * exp(-lam)), 4)
             AS score_stat
    FROM c2
    """,
    tags=("count-model", "zero-inflation", "exact-arith"),
)
def q_zero_inflation_score_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Van den Broek score test for excess zeros in customer-month
    order counts (1996-97): the full customer x month grid
    materializes the zeros EXACTLY (cross join of two distinct sets +
    left join), lambda is the exact-ratio mean, and the statistic
    (n0 - n e^-lam)^2 / (n e^-lam (1 - e^-lam) - n lam e^-2lam) is
    chi2(1) under Poisson. A huge value justifies hurdle/ZIP models
    over the plain Poisson poisson_dispersion already screened."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    o97 = orders.where(F.year("o_orderdate").isin(1996, 1997))
    months = o97.select(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    custs = orders.select(F.col("o_custkey").alias("ck")).distinct()
    obs = o97.groupBy(
        F.col("o_custkey").alias("ck"),
        F.date_trunc("month", "o_orderdate").alias("m"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = (
        custs.crossJoin(F.broadcast(months))
        .join(obs, ["ck", "m"], "left")
        .select(F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    s = grid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum("c").cast(_DEC).alias("sc"),
    )
    lam = F.col("sc").cast("double") / F.col("n")
    e0 = F.col("n").cast("double") * F.exp(-lam)
    c2 = s.select("n", "n0", lam.alias("lam"), e0.alias("e0"))
    num = (F.col("n0").cast("double") - F.col("e0")) * (
        F.col("n0").cast("double") - F.col("e0")
    )
    den = F.col("e0") * (1.0 - F.exp(-F.col("lam"))) - F.col("n").cast(
        "double"
    ) * F.col("lam") * F.exp(-F.col("lam")) * F.exp(-F.col("lam"))
    return c2.select(
        F.col("n").alias("n_cells"),
        F.col("n0").alias("observed_zeros"),
        F.round("lam", 4).alias("lambda_hat"),
        F.round("e0", 2).alias("poisson_expected_zeros"),
        F.round(num / den, 4).alias("score_stat"),
    )
