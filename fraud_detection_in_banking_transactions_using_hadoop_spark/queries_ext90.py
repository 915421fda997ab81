"""Extension batch 90: Western Electric control-chart rules, Lin's
concordance correlation, and Bland-Altman limits of agreement.

- western_electric_alarms: ucl_grouped/ucl_windowed draw the control
  limits; the WE run rules are what operators actually page on --
  R1 (beyond 3 sigma), R2 (2-of-3 beyond 2 sigma one side), R3
  (4-of-5 beyond 1 sigma one side), R4 (8 consecutive one side).
  Limits come from a frozen first-year baseline (exact integer
  moments); rules are framed count windows over the calendar series.
- lins_ccc_agreement / bland_altman_limits: do o_totalprice and the
  summed line list-prices AGREE (not just correlate)? Lin's CCC
  penalizes scale and location shifts correlation ignores;
  Bland-Altman reports the bias and the +-1.96 sigma limits within
  which 95% of per-order differences should fall. The method-
  comparison pair every instrumentation migration needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Western Electric alarm scan on daily revenue.
# ---------------------------------------------------------------------------
@register(
    "western_electric_alarms",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(y) AS HUGEINT) AS sb,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS qb
      FROM d WHERE dt <= (SELECT min(dt) + INTERVAL 365 DAY FROM d)),
    lim AS (
      SELECT CAST(sb AS DOUBLE) / nb AS mu,
             sqrt((CAST(nb AS DOUBLE) * qb - CAST(sb AS DOUBLE) * sb)
                  / (CAST(nb AS DOUBLE) * nb)) AS sg
      FROM base),
    marked AS (
      SELECT dt, y,
             CASE WHEN y > l.mu + 3.0 * l.sg OR y < l.mu - 3.0 * l.sg
                  THEN 1 ELSE 0 END AS r1,
             CASE WHEN y > l.mu + 2.0 * l.sg THEN 1 ELSE 0 END AS a2,
             CASE WHEN y < l.mu - 2.0 * l.sg THEN 1 ELSE 0 END AS b2,
             CASE WHEN y > l.mu + 1.0 * l.sg THEN 1 ELSE 0 END AS a1,
             CASE WHEN y < l.mu - 1.0 * l.sg THEN 1 ELSE 0 END AS b1,
             CASE WHEN CAST(y AS DOUBLE) > l.mu THEN 1 ELSE 0 END AS ab,
             CASE WHEN CAST(y AS DOUBLE) < l.mu THEN 1 ELSE 0 END AS bl
      FROM d CROSS JOIN lim l
      WHERE dt > (SELECT min(dt) + INTERVAL 365 DAY FROM d)),
    runs AS (
      SELECT dt, r1,
             CASE WHEN sum(a2) OVER w3 >= 2 OR sum(b2) OVER w3 >= 2
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN sum(a1) OVER w5 >= 4 OR sum(b1) OVER w5 >= 4
                  THEN 1 ELSE 0 END AS r3,
             CASE WHEN sum(ab) OVER w8 = 8 OR sum(bl) OVER w8 = 8
                  THEN 1 ELSE 0 END AS r4
      FROM marked
      WINDOW w3 AS (ORDER BY dt ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w5 AS (ORDER BY dt ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             w8 AS (ORDER BY dt ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_monitored,
             CAST(sum(r1) AS BIGINT) AS rule1_days,
             CAST(sum(r2) AS BIGINT) AS rule2_days,
             CAST(sum(r3) AS BIGINT) AS rule3_days,
             CAST(sum(r4) AS BIGINT) AS rule4_days,
             min(CASE WHEN r1 + r2 + r3 + r4 > 0 THEN dt END) AS first_alarm
      FROM runs)
    SELECT n_monitored, rule1_days, rule2_days, rule3_days, rule4_days,
           strftime(first_alarm, '%Y-%m-%d') AS first_alarm_date
    FROM agg
    """,
    tags=("spc", "monitoring", "exact-arith"),
)
def q_western_electric_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric run rules on daily revenue against limits
    frozen from the FIRST YEAR (exact integer baseline moments; both
    engines compare against the identical mu/sigma doubles): R1 =
    beyond 3 sigma, R2 = 2-of-3 beyond 2 sigma one-sided, R3 = 4-of-5
    beyond 1 sigma one-sided, R4 = 8 consecutive one side of center.
    The run rules catch small sustained shifts long before a 3-sigma
    point fires -- that's why they exist."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    cutoff = d.agg(F.date_add(F.min("dt"), 365).alias("co"))
    dc = d.crossJoin(F.broadcast(cutoff))
    base = dc.where(F.col("dt") <= F.col("co")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("y").cast(_DEC).alias("sb"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("qb"),
    )
    lim = base.select(
        (F.col("sb").cast("double") / F.col("nb")).alias("mu"),
        F.sqrt(
            (
                F.col("nb").cast("double") * F.col("qb").cast("double")
                - F.col("sb").cast("double") * F.col("sb").cast("double")
            )
            / (F.col("nb").cast("double") * F.col("nb"))
        ).alias("sg"),
    )
    mu, sg = F.col("mu"), F.col("sg")
    marked = (
        dc.where(F.col("dt") > F.col("co"))
        .crossJoin(F.broadcast(lim))
        .select(
            "dt",
            "y",
            F.when(
                (F.col("y") > mu + 3.0 * sg) | (F.col("y") < mu - 3.0 * sg), 1
            )
            .otherwise(0)
            .alias("r1"),
            F.when(F.col("y") > mu + 2.0 * sg, 1).otherwise(0).alias("a2"),
            F.when(F.col("y") < mu - 2.0 * sg, 1).otherwise(0).alias("b2"),
            F.when(F.col("y") > mu + 1.0 * sg, 1).otherwise(0).alias("a1"),
            F.when(F.col("y") < mu - 1.0 * sg, 1).otherwise(0).alias("b1"),
            F.when(F.col("y").cast("double") > mu, 1).otherwise(0).alias("ab"),
            F.when(F.col("y").cast("double") < mu, 1).otherwise(0).alias("bl"),
        )
    )
    w3 = Window.orderBy("dt").rowsBetween(-2, 0)
    w5 = Window.orderBy("dt").rowsBetween(-4, 0)
    w8 = Window.orderBy("dt").rowsBetween(-7, 0)
    runs = marked.select(
        "dt",
        "r1",
        F.when((F.sum("a2").over(w3) >= 2) | (F.sum("b2").over(w3) >= 2), 1)
        .otherwise(0)
        .alias("r2"),
        F.when((F.sum("a1").over(w5) >= 4) | (F.sum("b1").over(w5) >= 4), 1)
        .otherwise(0)
        .alias("r3"),
        F.when((F.sum("ab").over(w8) == 8) | (F.sum("bl").over(w8) == 8), 1)
        .otherwise(0)
        .alias("r4"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_monitored"),
        F.sum("r1").cast("bigint").alias("rule1_days"),
        F.sum("r2").cast("bigint").alias("rule2_days"),
        F.sum("r3").cast("bigint").alias("rule3_days"),
        F.sum("r4").cast("bigint").alias("rule4_days"),
        F.min(
            F.when(
                F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0,
                F.col("dt"),
            )
        ).alias("first_alarm"),
    )
    return agg.select(
        "n_monitored",
        "rule1_days",
        "rule2_days",
        "rule3_days",
        "rule4_days",
        F.date_format("first_alarm", "yyyy-MM-dd").alias("first_alarm_date"),
    )


_PAIR_SQL = """
    pair AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS x,
             CAST(sum(round(l.l_extendedprice * 100, 0)) AS BIGINT) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM pair)
"""


def _pair_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    pair = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0))
            .cast("bigint")
            .alias("y")
        )
        .select(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("x"), "y"
        )
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    return pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(dd("x") * dd("x")).cast(_DEC).alias("sxx"),
        F.sum(dd("x") * dd("y")).cast(_DEC).alias("sxy"),
        F.sum(dd("y") * dd("y")).cast(_DEC).alias("syy"),
    )


# ---------------------------------------------------------------------------
# Lin's concordance correlation coefficient.
# ---------------------------------------------------------------------------
@register(
    "lins_ccc_agreement",
    f"""
    WITH {_PAIR_SQL},
    c AS (
      SELECT n,
             CAST(sx AS DOUBLE) / n AS mx,
             CAST(sy AS DOUBLE) / n AS my,
             CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vx,
             CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vy,
             CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS cxy
      FROM mom)
    SELECT n AS n_orders,
           round(cxy / sqrt(vx * vy), 6) AS pearson_r,
           round(2.0 * cxy / (vx + vy + (mx - my) * (mx - my)), 6) AS lins_ccc,
           round((2.0 * cxy / (vx + vy + (mx - my) * (mx - my)))
                 / (cxy / sqrt(vx * vy)), 6) AS accuracy_cb,
           round((mx - my) / 100.0, 2) + 0.0 AS mean_shift_dollars
    FROM c
    """,
    tags=("agreement", "dq", "exact-arith"),
)
def q_lins_ccc_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance between an order's total price and its summed
    line LIST prices: CCC = 2 Cxy / (Vx + Vy + (mx - my)^2) punishes
    the location/scale shifts Pearson r forgives -- accuracy_cb =
    CCC/r isolates the systematic-bias factor. On this data the gap
    IS the discount/tax wedge, so CCC < r quantifies it. Exact
    population moments throughout."""
    mom = _pair_mom(spark, sf_dir)
    nd = F.col("n").cast(_DEC)
    c = mom.select(
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (
            (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("vx"),
        (
            (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("vy"),
        (
            (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("cxy"),
    )
    r = F.col("cxy") / F.sqrt(F.col("vx") * F.col("vy"))
    ms = F.col("mx") - F.col("my")
    ccc = 2.0 * F.col("cxy") / (F.col("vx") + F.col("vy") + ms * ms)
    return c.select(
        F.col("n").alias("n_orders"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc, 6).alias("lins_ccc"),
        F.round(ccc / r, 6).alias("accuracy_cb"),
        (F.round(ms / 100.0, 2) + 0.0).alias("mean_shift_dollars"),
    )


# ---------------------------------------------------------------------------
# Bland-Altman limits of agreement.
# ---------------------------------------------------------------------------
@register(
    "bland_altman_limits",
    f"""
    WITH {_PAIR_SQL},
    dstat AS (
      SELECT n,
             CAST(sx - sy AS HUGEINT) AS sd1,
             CAST(sxx - 2 * sxy + syy AS HUGEINT) AS sd2
      FROM mom),
    c AS (
      SELECT n,
             CAST(sd1 AS DOUBLE) / n AS md,
             sqrt((CAST(n AS DOUBLE) * sd2 - CAST(sd1 AS DOUBLE) * sd1)
                  / (CAST(n AS DOUBLE) * n)) AS sdd
      FROM dstat),
    outside AS (
      SELECT CAST(count(*) AS BIGINT) AS n_out
      FROM pair p CROSS JOIN c
      WHERE CAST(p.x - p.y AS DOUBLE) > c.md + 1.96 * c.sdd
         OR CAST(p.x - p.y AS DOUBLE) < c.md - 1.96 * c.sdd)
    SELECT c.n AS n_orders,
           round(c.md / 100.0, 2) + 0.0 AS mean_diff_dollars,
           round((c.md - 1.96 * c.sdd) / 100.0, 2) + 0.0 AS loa_low_dollars,
           round((c.md + 1.96 * c.sdd) / 100.0, 2) + 0.0 AS loa_high_dollars,
           round(CAST(o.n_out AS DOUBLE) / c.n, 6) AS frac_outside
    FROM c CROSS JOIN outside o
    """,
    tags=("agreement", "dq", "exact-arith"),
)
def q_bland_altman_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman on the same price pair: per-order difference d =
    total - sum(list) has exact moment sums via sd1 = Sx - Sy and
    sd2 = Sxx - 2Sxy + Syy (no per-row recompute), giving the bias
    and the +-1.96 sigma limits of agreement; frac_outside counts
    orders past the limits (should be ~5% iff differences are
    normal). The per-order counterpart of lins_ccc_agreement's single
    coefficient."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    pair = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0))
            .cast("bigint")
            .alias("y")
        )
        .select(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("x"), "y"
        )
    )
    mom = _pair_mom(spark, sf_dir)
    dstat = mom.select(
        "n",
        (F.col("sx") - F.col("sy")).cast(_DEC).alias("sd1"),
        (F.col("sxx") - 2 * F.col("sxy") + F.col("syy")).cast(_DEC).alias("sd2"),
    )
    c = dstat.select(
        "n",
        (F.col("sd1").cast("double") / F.col("n")).alias("md"),
        F.sqrt(
            (
                F.col("n").cast("double") * F.col("sd2").cast("double")
                - F.col("sd1").cast("double") * F.col("sd1").cast("double")
            )
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("sdd"),
    )
    outside = (
        pair.crossJoin(F.broadcast(c))
        .where(
            ((F.col("x") - F.col("y")).cast("double") > F.col("md") + 1.96 * F.col("sdd"))
            | ((F.col("x") - F.col("y")).cast("double") < F.col("md") - 1.96 * F.col("sdd"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_out"))
    )
    return c.crossJoin(F.broadcast(outside)).select(
        F.col("n").alias("n_orders"),
        (F.round(F.col("md") / 100.0, 2) + 0.0).alias("mean_diff_dollars"),
        (F.round((F.col("md") - 1.96 * F.col("sdd")) / 100.0, 2) + 0.0).alias(
            "loa_low_dollars"
        ),
        (F.round((F.col("md") + 1.96 * F.col("sdd")) / 100.0, 2) + 0.0).alias(
            "loa_high_dollars"
        ),
        F.round(F.col("n_out").cast("double") / F.col("n"), 6).alias(
            "frac_outside"
        ),
    )
