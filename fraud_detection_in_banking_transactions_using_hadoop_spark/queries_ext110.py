"""Extension batch 110: measurement reliability (split-half +
Spearman-Brown, Cronbach's alpha) and orthogonal polynomial
contrasts.

- split_half_reliability: is 'customer spend' a RELIABLE measure or
  noise? Split each customer's orders into odd/even ranks (exact
  per-customer row_number), correlate the halves, and step up with
  Spearman-Brown rho = 2r/(1+r). Low reliability means segment
  labels built on spend are churning on measurement error.
- cronbach_alpha_quarters: the k-item internal consistency classic
  with the four quarters of 1997 as items -- alpha = k/(k-1)
  (1 - sum var_i / var_total), all variances from exact integer
  moments on the customer x quarter grid (zeros included exactly).
- orthogonal_poly_contrasts: the 11 equally-spaced discount levels
  admit EXACT integer orthogonal contrasts (linear -5..5; quadratic
  15,6,-1,-6,-9,-10,...): the contrast of mean net revenue per line
  answers 'is the discount-revenue curve sloped, and is it curved'
  with two t statistics -- no regression fit at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_LIN = (-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5)
_QUAD = (15, 6, -1, -6, -9, -10, -9, -6, -1, 6, 15)


# ---------------------------------------------------------------------------
# Split-half reliability of customer spend.
# ---------------------------------------------------------------------------
@register(
    "split_half_reliability",
    """
    WITH seq AS (
      SELECT o_custkey AS ck,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders),
    halves AS (
      SELECT ck,
             CAST(sum(CASE WHEN rn % 2 = 1 THEN v ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN rn % 2 = 0 THEN v ELSE 0 END) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS m
      FROM seq GROUP BY ck HAVING count(*) >= 2),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS HUGEINT) AS sa,
             CAST(sum(b) AS HUGEINT) AS sb,
             CAST(sum(CAST(a AS HUGEINT) * a) AS HUGEINT) AS saa,
             CAST(sum(CAST(a AS HUGEINT) * b) AS HUGEINT) AS sab,
             CAST(sum(CAST(b AS HUGEINT) * b) AS HUGEINT) AS sbb
      FROM halves),
    r AS (
      SELECT n,
             CAST(n * sab - sa * sb AS DOUBLE)
               / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                      * CAST(n * sbb - sb * sb AS DOUBLE)) AS hr
      FROM mom)
    SELECT n AS n_customers,
           round(hr, 6) + 0.0 AS half_correlation,
           round(2.0 * hr / (1.0 + hr), 6) + 0.0 AS spearman_brown_rho
    FROM r
    """,
    tags=("measurement", "reliability", "exact-arith"),
)
def q_split_half_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half reliability of total customer spend: odd- vs
    even-ranked order halves (deterministic per-customer row_number
    over (date, orderkey)), Pearson r of the halves from exact
    integer moments, stepped up to full-length reliability by
    Spearman-Brown 2r/(1+r). The psychometrics question nobody asks
    of business metrics -- how much of 'spend' is signal."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
        F.row_number().over(w).alias("rn"),
    )
    halves = (
        seq.groupBy("ck")
        .agg(
            F.sum(F.when(F.col("rn") % 2 == 1, F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("rn") % 2 == 0, F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("b"),
            F.count(F.lit(1)).cast("bigint").alias("m"),
        )
        .where(F.col("m") >= 2)
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = halves.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast(_DEC).alias("sa"),
        F.sum("b").cast(_DEC).alias("sb"),
        F.sum(dd("a") * dd("a")).cast(_DEC).alias("saa"),
        F.sum(dd("a") * dd("b")).cast(_DEC).alias("sab"),
        F.sum(dd("b") * dd("b")).cast(_DEC).alias("sbb"),
    )
    nd = F.col("n").cast(_DEC)
    hr = (nd * F.col("sab") - F.col("sa") * F.col("sb")).cast("double") / F.sqrt(
        (nd * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
        * (nd * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    )
    r = mom.select("n", hr.alias("hr"))
    return r.select(
        F.col("n").alias("n_customers"),
        (F.round("hr", 6) + 0.0).alias("half_correlation"),
        (F.round(2.0 * F.col("hr") / (1.0 + F.col("hr")), 6) + 0.0).alias(
            "spearman_brown_rho"
        ),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha over the four 1997 quarters.
# ---------------------------------------------------------------------------
@register(
    "cronbach_alpha_quarters",
    """
    WITH custs AS (SELECT DISTINCT o_custkey AS ck FROM orders),
    obs AS (
      SELECT o_custkey AS ck, date_part('quarter', o_orderdate) AS q,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS s
      FROM orders WHERE date_part('year', o_orderdate) = 1997
      GROUP BY 1, 2),
    grid AS (
      SELECT c.ck, qs.q, coalesce(o.s, 0) AS s
      FROM custs c
      CROSS JOIN (SELECT unnest(range(1, 5)) AS q) qs
      LEFT JOIN obs o ON o.ck = c.ck AND o.q = qs.q),
    item AS (
      SELECT q, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS HUGEINT) AS sv,
             CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS sv2
      FROM grid GROUP BY q),
    ivar AS (
      SELECT CAST(sum(CAST(floor(1e4 * ((CAST(n AS DOUBLE) * sv2
                    - CAST(sv AS DOUBLE) * sv)
                    / (CAST(n AS DOUBLE) * n)) + 0.5) AS BIGINT)) AS HUGEINT)
               AS sum_item_var_e4
      FROM item),
    totrow AS (
      SELECT ck, CAST(sum(s) AS BIGINT) AS t FROM grid GROUP BY ck),
    tvar AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS HUGEINT) AS st,
             CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS st2
      FROM totrow)
    SELECT (SELECT n FROM tvar) AS n_customers,
           round(CAST((SELECT sum_item_var_e4 FROM ivar) AS DOUBLE) / 1e4, 2)
             AS sum_item_variances,
           round((CAST(t.n AS DOUBLE) * t.st2 - CAST(t.st AS DOUBLE) * t.st)
                 / (CAST(t.n AS DOUBLE) * t.n), 2) AS total_variance,
           round(4.0 / 3.0
                 * (1.0 - (CAST((SELECT sum_item_var_e4 FROM ivar) AS DOUBLE)
                           / 1e4)
                    / ((CAST(t.n AS DOUBLE) * t.st2
                        - CAST(t.st AS DOUBLE) * t.st)
                       / (CAST(t.n AS DOUBLE) * t.n))), 6) + 0.0
             AS cronbach_alpha
    FROM tvar t
    """,
    tags=("measurement", "reliability", "exact-arith"),
)
def q_cronbach_alpha_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha with the four 1997 quarters as items on the
    full customer x quarter grid (zeros exact): alpha = k/(k-1)
    (1 - sum var_q / var_total), item variances e4-floored before
    their 4-term sum, the total variance an exact moment ratio. High
    alpha = quarters measure one stable 'spend propensity'; low =
    spend is episodic and annual aggregates hide volatility."""
    orders = read_table(spark, sf_dir, "orders")
    custs = orders.select(F.col("o_custkey").alias("ck")).distinct()
    obs = (
        orders.where(F.year("o_orderdate") == 1997)
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.expr(
                "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
            ).alias("s")
        )
    )
    qs = spark.createDataFrame([(q,) for q in range(1, 5)], "q int")
    grid = (
        custs.crossJoin(F.broadcast(qs))
        .join(obs, ["ck", "q"], "left")
        .select("ck", "q", F.coalesce(F.col("s"), F.lit(0)).alias("s"))
    )
    item = grid.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast(_DEC).alias("sv"),
        F.sum(F.col("s").cast(_DEC) * F.col("s").cast(_DEC)).cast(_DEC).alias("sv2"),
    )
    iv_term = F.floor(
        F.lit(1e4)
        * (
            (
                F.col("n").cast("double") * F.col("sv2").cast("double")
                - F.col("sv").cast("double") * F.col("sv").cast("double")
            )
            / (F.col("n").cast("double") * F.col("n"))
        )
        + 0.5
    ).cast("bigint")
    ivar = item.agg(F.sum(iv_term).cast(_DEC).alias("sum_item_var_e4"))
    totrow = grid.groupBy("ck").agg(F.sum("s").cast("bigint").alias("t"))
    tvar = totrow.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast(_DEC).alias("st"),
        F.sum(F.col("t").cast(_DEC) * F.col("t").cast(_DEC)).cast(_DEC).alias("st2"),
    )
    out = tvar.crossJoin(F.broadcast(ivar))
    nd = F.col("n").cast("double")
    tv = (
        nd * F.col("st2").cast("double")
        - F.col("st").cast("double") * F.col("st").cast("double")
    ) / (nd * F.col("n"))
    siv = F.col("sum_item_var_e4").cast("double") / 1e4
    return out.select(
        F.col("n").alias("n_customers"),
        F.round(siv, 2).alias("sum_item_variances"),
        F.round(tv, 2).alias("total_variance"),
        (F.round(4.0 / 3.0 * (1.0 - siv / tv), 6) + 0.0).alias("cronbach_alpha"),
    )


# ---------------------------------------------------------------------------
# Orthogonal polynomial contrasts over the 11 discount levels.
# ---------------------------------------------------------------------------
@register(
    "orthogonal_poly_contrasts",
    f"""
    WITH lv AS (
      SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS lev,
             CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                  AS BIGINT) // 100 AS net
      FROM lineitem),
    per AS (
      SELECT lev, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(net) AS HUGEINT) AS s,
             CAST(sum(CAST(net AS HUGEINT) * net) AS HUGEINT) AS q
      FROM lv GROUP BY lev),
    coefs AS (
      SELECT unnest(range(0, 11)) AS lev,
             unnest(ARRAY{list(_LIN)}) AS cl,
             unnest(ARRAY{list(_QUAD)}) AS cq),
    terms AS (
      SELECT p.lev, p.n, p.s, p.q, c.cl, c.cq,
             CAST(floor(1e6 * (c.cl * (CAST(p.s AS DOUBLE) / p.n)) + 0.5)
                  AS BIGINT) AS lt_e6,
             CAST(floor(1e6 * (c.cq * (CAST(p.s AS DOUBLE) / p.n)) + 0.5)
                  AS BIGINT) AS qt_e6,
             CAST((p.n * p.q - p.s * p.s) // p.n AS HUGEINT) AS css,
             CAST(floor(1e9 * (CAST(c.cl AS DOUBLE) * c.cl / p.n) + 0.5)
                  AS BIGINT) AS wl_e9,
             CAST(floor(1e9 * (CAST(c.cq AS DOUBLE) * c.cq / p.n) + 0.5)
                  AS BIGINT) AS wq_e9
      FROM per p JOIN coefs c ON p.lev = c.lev),
    agg AS (
      SELECT CAST(sum(n) AS BIGINT) AS ntot,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(lt_e6) AS HUGEINT) AS lc,
             CAST(sum(qt_e6) AS HUGEINT) AS qc,
             CAST(sum(css) AS HUGEINT) AS wss,
             CAST(sum(wl_e9) AS HUGEINT) AS wl,
             CAST(sum(wq_e9) AS HUGEINT) AS wq
      FROM terms)
    SELECT ntot AS n_lines,
           round(CAST(lc AS DOUBLE) / 1e6, 2) + 0.0 AS linear_contrast,
           round(CAST(qc AS DOUBLE) / 1e6, 2) + 0.0 AS quadratic_contrast,
           round(CAST(lc AS DOUBLE) / 1e6
                 / sqrt(CAST(wss AS DOUBLE) / (ntot - k)
                        * CAST(wl AS DOUBLE) / 1e9), 4) + 0.0 AS linear_t,
           round(CAST(qc AS DOUBLE) / 1e6
                 / sqrt(CAST(wss AS DOUBLE) / (ntot - k)
                        * CAST(wq AS DOUBLE) / 1e9), 4) + 0.0 AS quadratic_t
    FROM agg
    """,
    tags=("stats", "contrasts", "exact-arith"),
)
def q_orthogonal_poly_contrasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal polynomial contrasts of mean NET line revenue across
    the 11 equally-spaced discount levels (integer coefficients -5..5
    and 15,6,-1,...,15): contrast terms and weights floor to e6/e9
    integers, the pooled within MSE uses the floor-division identity,
    and t = C / sqrt(MSE sum c^2/n). Linear t answers 'does revenue
    trend with discount', quadratic t 'does it curve' -- with NO
    model fitting, the textbook trick for equally spaced doses."""
    li = read_table(spark, sf_dir, "lineitem")
    lv = li.select(
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("lev"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)"
            " AS BIGINT) DIV 100"
        ).alias("net"),
    )
    per = lv.groupBy("lev").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("net").cast(_DEC).alias("s"),
        F.sum(F.col("net").cast(_DEC) * F.col("net").cast(_DEC))
        .cast(_DEC)
        .alias("q"),
    )
    coefs = spark.createDataFrame(
        [(i, _LIN[i], _QUAD[i]) for i in range(11)], "lev bigint, cl int, cq int"
    )
    mean = F.col("s").cast("double") / F.col("n")
    terms = per.join(F.broadcast(coefs), "lev").select(
        "n",
        F.floor(F.lit(1e6) * (F.col("cl") * mean) + 0.5).cast("bigint").alias(
            "lt_e6"
        ),
        F.floor(F.lit(1e6) * (F.col("cq") * mean) + 0.5).cast("bigint").alias(
            "qt_e6"
        ),
        F.expr("CAST((n * q - s * s) DIV n AS DECIMAL(38,0))").alias("css"),
        F.floor(
            F.lit(1e9) * (F.col("cl").cast("double") * F.col("cl") / F.col("n"))
            + 0.5
        )
        .cast("bigint")
        .alias("wl_e9"),
        F.floor(
            F.lit(1e9) * (F.col("cq").cast("double") * F.col("cq") / F.col("n"))
            + 0.5
        )
        .cast("bigint")
        .alias("wq_e9"),
    )
    agg = terms.agg(
        F.sum("n").cast("bigint").alias("ntot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("lt_e6").cast(_DEC).alias("lc"),
        F.sum("qt_e6").cast(_DEC).alias("qc"),
        F.sum("css").cast(_DEC).alias("wss"),
        F.sum("wl_e9").cast(_DEC).alias("wl"),
        F.sum("wq_e9").cast(_DEC).alias("wq"),
    )
    mse = F.col("wss").cast("double") / (F.col("ntot") - F.col("k"))
    lc = F.col("lc").cast("double") / 1e6
    qc = F.col("qc").cast("double") / 1e6
    return agg.select(
        F.col("ntot").alias("n_lines"),
        (F.round(lc, 2) + 0.0).alias("linear_contrast"),
        (F.round(qc, 2) + 0.0).alias("quadratic_contrast"),
        (
            F.round(lc / F.sqrt(mse * F.col("wl").cast("double") / 1e9), 4) + 0.0
        ).alias("linear_t"),
        (
            F.round(qc / F.sqrt(mse * F.col("wq").cast("double") / 1e9), 4) + 0.0
        ).alias("quadratic_t"),
    )
