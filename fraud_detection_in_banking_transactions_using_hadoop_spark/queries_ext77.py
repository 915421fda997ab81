"""Extension batch 77: categorical / trend tests that close over pure
aggregates -- Cochran's Q (paired binary across years), the
Cochran-Armitage trend test (ordered proportions), a Poisson
overdispersion check, and Cohen's d / Hedges' g.

None of these need a window or a join beyond 1-row broadcasts: every
statistic is a closed form over exact integer aggregate sums with one
final double step -- the cheapest possible 100 TB shape (map-side
partial aggregation, one scalar combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_CQ_YEARS = (1995, 1996, 1997)


# ---------------------------------------------------------------------------
# Cochran's Q: is customer activity homogeneous across 1995/96/97?
# ---------------------------------------------------------------------------
@register(
    "cochrans_q",
    f"""
    WITH act AS (
      SELECT DISTINCT o_custkey AS ck,
             date_part('year', o_orderdate) AS yr
      FROM orders
      WHERE date_part('year', o_orderdate) IN {_CQ_YEARS}),
    rows_r AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS r FROM act GROUP BY ck),
    cols_c AS (
      SELECT yr, CAST(count(*) AS BIGINT) AS c FROM act GROUP BY yr),
    s AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM rows_r) AS n_subj,
             (SELECT CAST(sum(r) AS HUGEINT) FROM rows_r) AS sr,
             (SELECT CAST(sum(CAST(r AS HUGEINT) * r) AS HUGEINT)
              FROM rows_r) AS sr2,
             (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
              FROM cols_c) AS sc2,
             (SELECT CAST(count(*) AS BIGINT) FROM cols_c) AS k)
    SELECT n_subj,
           CAST(k AS INTEGER) AS k_periods,
           round(CAST((k - 1) * (k * sc2 - sr * sr) AS DOUBLE)
                 / CAST(k * sr - sr2 AS DOUBLE), 4) AS q_stat,
           CAST(k - 1 AS INTEGER) AS dof
    FROM s
    """,
    tags=("stats", "categorical", "exact-arith"),
)
def q_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over the customer x year activity matrix (did
    customer i order in year j?): Q = (k-1)(k * sum C_j^2 - (sum R)^2)
    / (k * sum R - sum R_i^2) -- column totals C_j = active customers
    per year, row totals R_i = active years per customer, ALL exact
    integers, one double division. Subjects with R_i = 0 contribute
    nothing to either side, so restricting to ever-active customers is
    exact, not an approximation."""
    orders = read_table(spark, sf_dir, "orders")
    act = (
        orders.where(F.year("o_orderdate").isin(*_CQ_YEARS))
        .select(F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("yr"))
        .distinct()
    )
    rows_r = act.groupBy("ck").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    cols_c = act.groupBy("yr").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rs = rows_r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subj"),
        F.sum("r").cast(_DEC).alias("sr"),
        F.sum(F.col("r").cast(_DEC) * F.col("r").cast(_DEC)).cast(_DEC).alias("sr2"),
    )
    cs = cols_c.agg(
        F.sum(F.col("c").cast(_DEC) * F.col("c").cast(_DEC)).cast(_DEC).alias("sc2"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    s = rs.crossJoin(F.broadcast(cs))
    kdec = F.col("k").cast(_DEC)
    q = (
        ((kdec - 1) * (kdec * F.col("sc2") - F.col("sr") * F.col("sr"))).cast("double")
        / (kdec * F.col("sr") - F.col("sr2")).cast("double")
    )
    return s.select(
        "n_subj",
        F.col("k").cast("int").alias("k_periods"),
        F.round(q, 4).alias("q_stat"),
        (F.col("k") - 1).cast("int").alias("dof"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage: does the return rate trend with quantity?
# ---------------------------------------------------------------------------
@register(
    "cochran_armitage_trend",
    """
    WITH lv AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS r
      FROM lineitem GROUP BY CAST(l_quantity AS BIGINT)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS levels,
             CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(r) AS HUGEINT) AS rr,
             CAST(sum(CAST(x AS HUGEINT) * r) AS HUGEINT) AS sxr,
             CAST(sum(CAST(x AS HUGEINT) * n) AS HUGEINT) AS sxn,
             CAST(sum(CAST(x AS HUGEINT) * x * n) AS HUGEINT) AS sxxn
      FROM lv)
    SELECT CAST(nn AS BIGINT) AS n_lines,
           CAST(levels AS INTEGER) AS n_levels,
           round(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS pooled_rate,
           round(CAST(nn * sxr - rr * sxn AS DOUBLE)
                 / sqrt(CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE)
                        * CAST(nn * sxxn - sxn * sxn AS DOUBLE)
                        / CAST(nn AS DOUBLE)), 6) + 0.0 AS z_trend
    FROM s
    """,
    tags=("stats", "trend", "exact-arith"),
)
def q_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a linear trend in the return rate
    across the 50 integer quantity levels (scores = quantity): T =
    sum x_i r_i - pbar * sum x_i n_i has the exact-integer form
    (N * sxr - R * sxn)/N with variance pbar qbar (sxxn - sxn^2/N);
    multiplying both through by N gives z from five exact HUGEINT
    sums and one sqrt. The 2xk trend test a chi-square on the full
    table can't see (it ignores the ordering)."""
    li = read_table(spark, sf_dir, "lineitem")
    lv = li.groupBy(F.col("l_quantity").cast("bigint").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("r"),
    )
    xd = F.col("x").cast(_DEC)
    s = lv.agg(
        F.count(F.lit(1)).cast("bigint").alias("levels"),
        F.sum("n").cast(_DEC).alias("nn"),
        F.sum("r").cast(_DEC).alias("rr"),
        F.sum(xd * F.col("r").cast(_DEC)).cast(_DEC).alias("sxr"),
        F.sum(xd * F.col("n").cast(_DEC)).cast(_DEC).alias("sxn"),
        F.sum(xd * xd * F.col("n").cast(_DEC)).cast(_DEC).alias("sxxn"),
    )
    num = (F.col("nn") * F.col("sxr") - F.col("rr") * F.col("sxn")).cast("double")
    var = (
        F.col("rr").cast("double")
        * (F.col("nn") - F.col("rr")).cast("double")
        * (F.col("nn") * F.col("sxxn") - F.col("sxn") * F.col("sxn")).cast("double")
        / F.col("nn").cast("double")
    )
    return s.select(
        F.col("nn").cast("bigint").alias("n_lines"),
        F.col("levels").cast("int").alias("n_levels"),
        F.round(F.col("rr").cast("double") / F.col("nn").cast("double"), 6).alias(
            "pooled_rate"
        ),
        (F.round(num / F.sqrt(var), 6) + 0.0).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# Poisson overdispersion of daily order counts.
# ---------------------------------------------------------------------------
@register(
    "poisson_dispersion",
    """
    WITH d AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS HUGEINT) AS sc,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sc2
      FROM d)
    SELECT n AS n_days,
           round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_per_day,
           round(CAST(n * sc2 - sc * sc AS DOUBLE)
                 / CAST(sc AS DOUBLE), 6)
             AS chi2_stat,
           round(CAST(n * sc2 - sc * sc AS DOUBLE)
                 / CAST(sc AS DOUBLE)
                 / CAST(n - 1 AS DOUBLE), 6) AS dispersion_index,
           CASE WHEN CAST(n * sc2 - sc * sc AS DOUBLE)
                     / CAST(sc AS DOUBLE)
                     / CAST(n - 1 AS DOUBLE) > 1.0
                THEN 'overdispersed' ELSE 'not-overdispersed' END AS verdict
    FROM s
    """,
    tags=("stats", "count-model", "exact-arith"),
)
def q_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the daily order arrival Poisson? The dispersion test
    chi2 = sum (x - xbar)^2 / xbar has the exact-integer closed form
    (n * sum x^2 - (sum x)^2) / (n * sum x); dividing by n-1 gives the
    variance-to-mean dispersion index (1 under Poisson). A verdict
    over 1 means burstier-than-Poisson arrivals -- capacity planning
    (erlang_c_staffing) must then stop assuming M/M/c inputs."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast(_DEC).alias("sc"),
        F.sum(F.col("c").cast(_DEC) * F.col("c").cast(_DEC)).cast(_DEC).alias("sc2"),
    )
    nd = F.col("n").cast(_DEC)
    chi2 = (nd * F.col("sc2") - F.col("sc") * F.col("sc")).cast(
        "double"
    ) / F.col("sc").cast("double")
    di = chi2 / (F.col("n") - 1).cast("double")
    return s.select(
        F.col("n").alias("n_days"),
        F.round(F.col("sc").cast("double") / F.col("n").cast("double"), 4).alias(
            "mean_per_day"
        ),
        F.round(chi2, 6).alias("chi2_stat"),
        F.round(di, 6).alias("dispersion_index"),
        F.when(di > 1.0, F.lit("overdispersed"))
        .otherwise(F.lit("not-overdispersed"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g for URGENT vs LOW order totals.
# ---------------------------------------------------------------------------
@register(
    "cohens_d_effect",
    """
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    s AS (
      SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) ELSE 0 END)
                  AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN arm = 0 THEN CAST(v AS HUGEINT) ELSE 0 END)
                  AS HUGEINT) AS s0,
             CAST(sum(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) * v ELSE 0 END)
                  AS HUGEINT) AS q1,
             CAST(sum(CASE WHEN arm = 0 THEN CAST(v AS HUGEINT) * v ELSE 0 END)
                  AS HUGEINT) AS q0
      FROM arms),
    c AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s0 AS DOUBLE) / n0 AS m0,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1
              + CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
               / CAST(n1 + n0 - 2 AS DOUBLE) AS sp2
      FROM s)
    SELECT n1 AS n_urgent, n0 AS n_low,
           round((m1 - m0) / 100.0, 2) + 0.0 AS mean_diff_dollars,
           round((m1 - m0) / sqrt(sp2), 6) + 0.0 AS cohens_d,
           round((m1 - m0) / sqrt(sp2)
                 * (1.0 - 3.0 / (4.0 * CAST(n1 + n0 - 2 AS DOUBLE) - 1.0)), 6)
             + 0.0 AS hedges_g
    FROM c
    """,
    tags=("stats", "effect-size", "exact-arith"),
)
def q_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d = (m1 - m0)/s_pooled for URGENT vs LOW order totals,
    with the Hedges small-sample correction J = 1 - 3/(4 df - 1): the
    pooled variance closes over exact integer sums and squared sums
    per arm (single conditional-aggregation pass, no join), so the
    only doubles are the two means and one sqrt. Complements
    cliffs_delta: d is the parametric effect size, delta the
    distribution-free one."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    vd = F.col("v").cast(_DEC)
    is1, is0 = F.col("arm") == 1, F.col("arm") == 0
    zero = F.lit(0).cast(_DEC)
    s = arms.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(is1, vd).otherwise(zero)).cast(_DEC).alias("s1"),
        F.sum(F.when(is0, vd).otherwise(zero)).cast(_DEC).alias("s0"),
        F.sum(F.when(is1, vd * vd).otherwise(zero)).cast(_DEC).alias("q1"),
        F.sum(F.when(is0, vd * vd).otherwise(zero)).cast(_DEC).alias("q0"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    sp2 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
        + F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
    ) / (F.col("n1") + F.col("n0") - 2).cast("double")
    c = s.select("n1", "n0", m1.alias("m1"), m0.alias("m0"), sp2.alias("sp2"))
    d = (F.col("m1") - F.col("m0")) / F.sqrt("sp2")
    j = 1.0 - 3.0 / (4.0 * (F.col("n1") + F.col("n0") - 2).cast("double") - 1.0)
    return c.select(
        F.col("n1").alias("n_urgent"),
        F.col("n0").alias("n_low"),
        (F.round((F.col("m1") - F.col("m0")) / 100.0, 2) + 0.0).alias(
            "mean_diff_dollars"
        ),
        (F.round(d, 6) + 0.0).alias("cohens_d"),
        (F.round(d * j, 6) + 0.0).alias("hedges_g"),
    )
