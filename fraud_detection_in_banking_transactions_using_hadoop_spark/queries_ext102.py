"""Extension batch 102: cluster-robust inference, the delete-one
jackknife, and circular (directional) seasonality statistics.

- cluster_robust_se: newey_west fixed SERIAL correlation; this fixes
  CLUSTER correlation -- line revenues within a supplier nation
  co-move, so the sandwich meat sums scores per cluster FIRST. With
  the n-scaled regressor X = n x - Sx and integer residuals E, the
  per-cluster score sums and their squares are exact integers:
  se_cl = sqrt(c M / Cxx^2), c = G/(G-1) (n-1)/(n-2). The inflation
  ratio says how much the iid assumption flattered the t-stat.
- jackknife_nation_se: the delete-one-group jackknife for a RATIO
  statistic (revenue per order) -- replicas are closed-form from
  totals minus per-nation sums, each replica e9-floored before the
  25-term variance. The oldest honest SE there is; no delta method.
- circular_seasonality_rayleigh: day-of-year is an ANGLE (Dec 31 and
  Jan 1 are neighbors): resultant length Rbar, Rayleigh z = n Rbar^2,
  circular SD, and the mean direction in days, with per-day-of-year
  cos/sin terms e9-floored before the 366-term sums.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Cluster-robust (nation-clustered) SE for the revenue-on-quantity slope.
# ---------------------------------------------------------------------------
@register(
    "cluster_robust_se",
    """
    WITH rows_l AS (
      SELECT s.s_nationkey AS g,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) // 100 AS y
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM rows_l),
    fit AS (
      SELECT n, sx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a,
             CAST(n * sxx - sx * sx AS DOUBLE) AS cxx
      FROM mom),
    scores AS (
      SELECT r.g,
             (f.n * r.x - f.sx)
               * CAST(floor(CAST(r.y AS DOUBLE) - f.a - f.b * r.x + 0.5)
                      AS BIGINT) AS u,
             CAST(floor(CAST(r.y AS DOUBLE) - f.a - f.b * r.x + 0.5) AS BIGINT)
               AS e
      FROM rows_l r CROSS JOIN fit f),
    perg AS (
      SELECT g, CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS sg
      FROM scores GROUP BY g),
    meat AS (
      SELECT CAST(count(*) AS BIGINT) AS gn,
             CAST(sum(sg * sg) AS HUGEINT) AS m
      FROM perg),
    sse AS (
      SELECT CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS s2
      FROM scores)
    SELECT f.n AS n_lines,
           CAST(mt.gn AS INTEGER) AS n_clusters,
           round(f.b, 6) AS slope_dollars_per_unit,
           round(sqrt(CAST(s.s2 AS DOUBLE) / (f.n - 2)
                      * CAST(f.n AS DOUBLE) / f.cxx), 6) AS se_ols,
           round(sqrt(CAST(mt.gn AS DOUBLE) / (mt.gn - 1)
                      * (CAST(f.n AS DOUBLE) - 1.0) / (f.n - 2)
                      * CAST(mt.m AS DOUBLE) / (f.cxx * f.cxx)), 6)
             AS se_cluster,
           round(sqrt(CAST(mt.gn AS DOUBLE) / (mt.gn - 1)
                      * (CAST(f.n AS DOUBLE) - 1.0) / (f.n - 2)
                      * CAST(mt.m AS DOUBLE) / (f.cxx * f.cxx))
                 / sqrt(CAST(s.s2 AS DOUBLE) / (f.n - 2)
                        * CAST(f.n AS DOUBLE) / f.cxx), 4)
             AS cluster_inflation
    FROM fit f CROSS JOIN meat mt CROSS JOIN sse s
    """,
    tags=("econometrics", "cluster-robust", "exact-arith"),
)
def q_cluster_robust_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation-clustered sandwich SE for the line-revenue-on-quantity
    slope: per-cluster score sums sg = sum (n x - Sx) E are exact
    integers (E = whole-dollar residuals from the broadcast exact
    fit), the meat M = sum sg^2 stays exact in DECIMAL, and se_cl =
    sqrt(G/(G-1) (n-1)/(n-2) M / Cxx^2). cluster_inflation > 1 is
    the within-nation correlation the iid OLS se ignores -- the
    cross-sectional sibling of newey_west_slope_se."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    )
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rows_l = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).select(
        F.col("s_nationkey").alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT) DIV 100").alias("y"),
    )
    mom = rows_l.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).cast(_DEC).alias("sxx"),
        F.sum(F.col("x").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)
    bnum = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    bden = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fit = mom.select(
        "n",
        "sx",
        (bnum / bden).alias("b"),
        (
            (F.col("sy").cast("double") - bnum / bden * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
        bden.alias("cxx"),
    )
    e = F.floor(
        F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("x") + 0.5
    ).cast("bigint")
    x_sc = (F.col("n").cast(_DEC) * F.col("x") - F.col("sx")).cast(_DEC)
    scores = rows_l.crossJoin(F.broadcast(fit)).select(
        "g", (x_sc * e.cast(_DEC)).cast(_DEC).alias("u"), e.alias("e")
    )
    perg = scores.groupBy("g").agg(F.sum("u").cast(_DEC).alias("sg"))
    meat = perg.agg(
        F.count(F.lit(1)).cast("bigint").alias("gn"),
        F.sum(F.col("sg") * F.col("sg")).cast(_DEC).alias("m"),
    )
    sse = scores.agg(
        F.sum(F.col("e").cast(_DEC) * F.col("e").cast(_DEC)).cast(_DEC).alias("s2")
    )
    out = fit.crossJoin(F.broadcast(meat)).crossJoin(F.broadcast(sse))
    ndd = F.col("n").cast("double")
    se_ols = F.sqrt(
        F.col("s2").cast("double") / (F.col("n") - 2) * ndd / F.col("cxx")
    )
    se_cl = F.sqrt(
        F.col("gn").cast("double")
        / (F.col("gn") - 1)
        * (ndd - 1.0)
        / (F.col("n") - 2)
        * F.col("m").cast("double")
        / (F.col("cxx") * F.col("cxx"))
    )
    return out.select(
        F.col("n").alias("n_lines"),
        F.col("gn").cast("int").alias("n_clusters"),
        F.round("b", 6).alias("slope_dollars_per_unit"),
        F.round(se_ols, 6).alias("se_ols"),
        F.round(se_cl, 6).alias("se_cluster"),
        F.round(se_cl / se_ols, 4).alias("cluster_inflation"),
    )


# ---------------------------------------------------------------------------
# Delete-one-nation jackknife SE of revenue per order.
# ---------------------------------------------------------------------------
@register(
    "jackknife_nation_se",
    """
    WITH per AS (
      SELECT c.c_nationkey AS g,
             CAST(count(*) AS BIGINT) AS n_ord,
             CAST(sum(round(o.o_totalprice * 100, 0)) AS HUGEINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey),
    tot AS (
      SELECT CAST(sum(n_ord) AS BIGINT) AS nt,
             CAST(sum(rev) AS HUGEINT) AS rt,
             CAST(count(*) AS BIGINT) AS gcnt
      FROM per),
    reps AS (
      SELECT p.g,
             CAST(floor(1e9 * (CAST(t.rt - p.rev AS DOUBLE)
                               / (t.nt - p.n_ord) / 100.0) + 0.5) AS BIGINT)
               AS th_e9
      FROM per p CROSS JOIN tot t),
    jk AS (
      SELECT CAST(count(*) AS BIGINT) AS gcnt,
             CAST(sum(th_e9) AS HUGEINT) AS s1,
             CAST(sum(CAST(th_e9 AS HUGEINT) * th_e9) AS HUGEINT) AS s2
      FROM reps)
    SELECT (SELECT CAST(gcnt AS INTEGER) FROM tot) AS n_groups,
           round(CAST((SELECT rt FROM tot) AS DOUBLE)
                 / (SELECT nt FROM tot) / 100.0, 4) AS theta_dollars,
           round(sqrt((CAST(j.gcnt AS DOUBLE) - 1.0) / j.gcnt
                      * (CAST(j.s2 AS DOUBLE) / j.gcnt
                         - CAST(j.s1 AS DOUBLE) / j.gcnt
                           * (CAST(j.s1 AS DOUBLE) / j.gcnt))
                      * j.gcnt) / 1e9, 4) AS jackknife_se_dollars,
           round((CAST(j.gcnt AS DOUBLE) - 1.0)
                 * (CAST(j.s1 AS DOUBLE) / j.gcnt / 1e9
                    - CAST((SELECT rt FROM tot) AS DOUBLE)
                      / (SELECT nt FROM tot) / 100.0), 4) + 0.0
             AS jackknife_bias_dollars
    FROM jk j
    """,
    tags=("resampling", "jackknife", "exact-arith"),
)
def q_jackknife_nation_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-nation jackknife for revenue per order: each of the
    25 replicas theta_(g) = (R - r_g)/(N - n_g) is closed-form from
    the totals minus exact per-nation sums, e9-floored before the
    replica variance; SE = sqrt((G-1)/G sum (th_g - thbar)^2) and the
    bias estimate (G-1)(thbar - theta). Honest grouped uncertainty
    for a ratio with zero distributional assumptions -- and the
    grouped complement of srm_delta_ratio's delta method."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_nationkey").alias("g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ord"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast(_DEC).alias("rev"),
        )
    )
    tot = per.agg(
        F.sum("n_ord").cast("bigint").alias("nt"),
        F.sum("rev").cast(_DEC).alias("rt"),
        F.count(F.lit(1)).cast("bigint").alias("gcnt"),
    )
    reps = per.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.lit(1e9)
            * (
                (F.col("rt") - F.col("rev")).cast("double")
                / (F.col("nt") - F.col("n_ord"))
                / 100.0
            )
            + 0.5
        )
        .cast("bigint")
        .alias("th_e9")
    )
    jk = reps.agg(
        F.count(F.lit(1)).cast("bigint").alias("gcnt"),
        F.sum("th_e9").cast(_DEC).alias("s1"),
        F.sum(F.col("th_e9").cast(_DEC) * F.col("th_e9").cast(_DEC))
        .cast(_DEC)
        .alias("s2"),
    )
    out = jk.crossJoin(F.broadcast(tot.select("nt", "rt", F.col("gcnt").alias("gc2"))))
    gd = F.col("gcnt").cast("double")
    mean_e9 = F.col("s1").cast("double") / F.col("gcnt")
    var_e9 = (
        F.col("s2").cast("double") / F.col("gcnt") - mean_e9 * mean_e9
    )
    theta = F.col("rt").cast("double") / F.col("nt") / 100.0
    return out.select(
        F.col("gc2").cast("int").alias("n_groups"),
        F.round(theta, 4).alias("theta_dollars"),
        F.round(
            F.sqrt((gd - 1.0) / F.col("gcnt") * var_e9 * F.col("gcnt")) / 1e9, 4
        ).alias("jackknife_se_dollars"),
        (
            F.round((gd - 1.0) * (mean_e9 / 1e9 - theta), 4) + 0.0
        ).alias("jackknife_bias_dollars"),
    )


# ---------------------------------------------------------------------------
# Circular seasonality of order dates (Rayleigh test).
# ---------------------------------------------------------------------------
@register(
    "circular_seasonality_rayleigh",
    f"""
    WITH doy AS (
      SELECT CAST(date_part('doy', o_orderdate) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    terms AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(floor(1e9 * (c * cos(2.0 * {math.pi} * (d - 0.5)
                                        / 366.0)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS cs,
             CAST(sum(CAST(floor(1e9 * (c * sin(2.0 * {math.pi} * (d - 0.5)
                                        / 366.0)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS sn
      FROM doy),
    c2 AS (
      SELECT n,
             sqrt((CAST(cs AS DOUBLE) / 1e9) * (CAST(cs AS DOUBLE) / 1e9)
                  + (CAST(sn AS DOUBLE) / 1e9) * (CAST(sn AS DOUBLE) / 1e9))
               / n AS rbar,
             atan2(CAST(sn AS DOUBLE) / 1e9, CAST(cs AS DOUBLE) / 1e9)
               AS theta
      FROM terms)
    SELECT CAST(n AS BIGINT) AS n_orders,
           round(rbar, 6) AS resultant_rbar,
           round(CAST(n AS DOUBLE) * rbar * rbar, 2) AS rayleigh_z,
           round(sqrt(-2.0 * ln(rbar)) * 366.0 / (2.0 * {math.pi}), 2)
             AS circular_sd_days,
           round((CASE WHEN theta < 0 THEN theta + 2.0 * {math.pi}
                       ELSE theta END) * 366.0 / (2.0 * {math.pi}), 1)
             AS mean_direction_doy
    FROM c2
    """,
    tags=("circular", "seasonality", "exact-arith"),
)
def q_circular_seasonality_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of order day-of-year: per-day cos/sin mass
    terms floor to e9 integers before the 366-term resultant sums;
    Rbar near 0 means no seasonal direction (Rayleigh z = n Rbar^2
    tests uniformity exactly), and the mean direction converts back
    to a day-of-year. Month histograms break at the year boundary --
    circular statistics is the correct geometry for calendar
    seasonality."""
    orders = read_table(spark, sf_dir, "orders")
    doy = orders.groupBy(
        F.dayofyear("o_orderdate").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ang = 2.0 * math.pi * (F.col("d") - 0.5) / 366.0
    terms = doy.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.floor(F.lit(1e9) * (F.col("c") * F.cos(ang)) + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("cs"),
        F.sum(F.floor(F.lit(1e9) * (F.col("c") * F.sin(ang)) + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("sn"),
    )
    csd = F.col("cs").cast("double") / 1e9
    snd = F.col("sn").cast("double") / 1e9
    rbar = F.sqrt(csd * csd + snd * snd) / F.col("n")
    theta = F.atan2(snd, csd)
    c2 = terms.select("n", rbar.alias("rbar"), theta.alias("theta"))
    return c2.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round("rbar", 6).alias("resultant_rbar"),
        F.round(F.col("n").cast("double") * F.col("rbar") * F.col("rbar"), 2).alias(
            "rayleigh_z"
        ),
        F.round(
            F.sqrt(-2.0 * F.log("rbar")) * 366.0 / (2.0 * math.pi), 2
        ).alias("circular_sd_days"),
        F.round(
            F.when(F.col("theta") < 0, F.col("theta") + 2.0 * math.pi)
            .otherwise(F.col("theta"))
            * 366.0
            / (2.0 * math.pi),
            1,
        ).alias("mean_direction_doy"),
    )
