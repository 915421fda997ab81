"""Extension batch 204 (round 8): X-mR individuals control chart and
the Qini uplift curve.

- xmr_individuals_chart: the Shewhart INDIVIDUALS chart (n=1 subgroups)
  on daily revenue -- sigma estimated from the moving range (mRbar),
  not the sample stddev, which is what distinguishes X-mR from the
  ucl_* mean+3sigma tier: limits xbar +/- 2.66*mRbar, mR chart UCL
  3.267*mRbar (the d2/D4 constants for n=2). Exact cent sums; the
  daily lag spine is CALENDAR class.

- qini_uplift_deciles: treatment-effect ranking evaluation. Treatment
  = md5 parity of custkey (deterministic A/B), outcome = repeat buyer,
  score = account balance; per score decile the treated/control
  response split, the uplift, and the cumulative Qini value
  cumY_t - cumY_c * cumN_t / cumN_c. A hash-random treatment makes
  uplift ~ 0 everywhere -- the null read -- and the planted pytest
  proves the machinery recovers a heterogeneous effect. Deciles via
  the distributed rank operator (lift_gains_table pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "xmr_individuals_chart",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    mr AS (
      SELECT day, cents,
             abs(cents - lag(cents) OVER (ORDER BY day)) AS mrange
      FROM daily),
    lim AS (
      SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS xbar,
             CAST(sum(mrange) AS DOUBLE) / count(mrange) AS mrbar
      FROM mr)
    SELECT strftime(m.day, '%Y-%m-%d') AS day, m.cents, m.mrange,
           round(l.xbar, 4) AS xbar_cents,
           round(l.xbar + 2.66 * l.mrbar, 4) AS ucl_x,
           round(l.xbar - 2.66 * l.mrbar, 4) AS lcl_x,
           round(3.267 * l.mrbar, 4) AS ucl_mr,
           CAST(CASE WHEN m.cents > l.xbar + 2.66 * l.mrbar
                       OR m.cents < l.xbar - 2.66 * l.mrbar
                     THEN 1 ELSE 0 END AS INTEGER) AS x_beyond,
           CAST(CASE WHEN m.mrange > 3.267 * l.mrbar
                     THEN 1 ELSE 0 END AS INTEGER) AS mr_beyond
    FROM mr m CROSS JOIN lim l
    """,
    tags=("spc", "control-chart", "calendar"),
)
def q_xmr_individuals_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-mR individuals chart on daily revenue: moving-range-based
    sigma (mRbar/d2 with d2 = 1.128 folded into the 2.66 constant) --
    robust to the between-day trend inflating a naive stddev. Emits
    per-day values, both charts' limits, and violation flags."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    mr = daily.select(
        "day",
        "cents",
        F.abs(F.col("cents") - F.lag("cents").over(w)).alias("mrange"),
    )
    lim = mr.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("xbar"),
        (F.sum("mrange").cast("double") / F.count("mrange")).alias("mrbar"),
    )
    ux = F.col("xbar") + 2.66 * F.col("mrbar")
    lx = F.col("xbar") - 2.66 * F.col("mrbar")
    umr = 3.267 * F.col("mrbar")
    return mr.crossJoin(F.broadcast(lim)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "mrange",
        F.round(F.col("xbar"), 4).alias("xbar_cents"),
        F.round(ux, 4).alias("ucl_x"),
        F.round(lx, 4).alias("lcl_x"),
        F.round(umr, 4).alias("ucl_mr"),
        F.when((F.col("cents") > ux) | (F.col("cents") < lx), 1)
        .otherwise(0)
        .cast("int")
        .alias("x_beyond"),
        F.when(F.col("mrange") > umr, 1)
        .otherwise(0)
        .cast("int")
        .alias("mr_beyond"),
    )


@register(
    "qini_uplift_deciles",
    """
    WITH cust AS (
      SELECT c.c_custkey,
             CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)), 1, 1))
                  ::BIGINT % 2 AS INTEGER) AS treated,
             c.c_acctbal,
             CASE WHEN count(o.o_orderkey) >= 2 THEN 1 ELSE 0 END AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal),
    scored AS (
      SELECT treated, y,
             ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
      FROM cust),
    per AS (
      SELECT decile,
             CAST(sum(treated) AS BIGINT) AS n_t,
             CAST(sum(treated * y) AS BIGINT) AS y_t,
             CAST(sum(1 - treated) AS BIGINT) AS n_c,
             CAST(sum((1 - treated) * y) AS BIGINT) AS y_c
      FROM scored GROUP BY decile),
    cum AS (
      SELECT decile, n_t, y_t, n_c, y_c,
             CAST(sum(n_t) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cn_t,
             CAST(sum(y_t) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cy_t,
             CAST(sum(n_c) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cn_c,
             CAST(sum(y_c) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cy_c
      FROM per)
    SELECT CAST(decile AS INTEGER) AS decile, n_t, y_t, n_c, y_c,
           CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
                ELSE round(CAST(y_t AS DOUBLE) / n_t
                           - CAST(y_c AS DOUBLE) / n_c, 6) + 0.0
           END AS uplift,
           CASE WHEN cn_c = 0 THEN NULL
                ELSE round(CAST(cy_t AS DOUBLE)
                           - CAST(cy_c AS DOUBLE) * cn_t / cn_c, 6) + 0.0
           END AS qini
    FROM cum
    """,
    tags=("ml-eval", "uplift", "causal"),
)
def q_qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve by score decile: treated-minus-control
    response uplift per decile and the cumulative Qini value
    cy_t - cy_c * cn_t / cn_c (the area under which is the AUUC).
    Deterministic md5-parity treatment, repeat-buyer outcome,
    balance-ranked deciles via the distributed rank operator. On
    hash-random treatment the curve hugs zero -- the correct null."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    base = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.when(F.count("o_orderkey") >= 2, 1).otherwise(0).alias("y")
        )
        .select(
            "c_custkey",
            "c_acctbal",
            "y",
            F.expr(
                "CAST(CAST(conv(substring(md5(CAST(c_custkey AS STRING)),"
                " 1, 1), 16, 10) AS BIGINT) % 2 AS INT)"
            ).alias("treated"),
        )
    )
    gr = with_global_rank(
        base,
        "c_acctbal",
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        ascending=False,
        rank_col="_i",
    )
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    scored = gr.crossJoin(F.broadcast(n_row)).select(
        "treated",
        "y",
        ntile_from_rank(F.col("_i"), F.col("_n"), 10).alias("decile"),
    )
    per = scored.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(F.col("treated") * F.col("y")).cast("bigint").alias("y_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum((1 - F.col("treated")) * F.col("y"))
        .cast("bigint")
        .alias("y_c"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile", "n_t", "y_t", "n_c", "y_c",
        F.sum("n_t").over(wcum).cast("bigint").alias("cn_t"),
        F.sum("y_t").over(wcum).cast("bigint").alias("cy_t"),
        F.sum("n_c").over(wcum).cast("bigint").alias("cn_c"),
        F.sum("y_c").over(wcum).cast("bigint").alias("cy_c"),
    )
    uplift = F.when(
        (F.col("n_t") == 0) | (F.col("n_c") == 0), F.lit(None)
    ).otherwise(
        F.round(
            F.col("y_t").cast("double") / F.col("n_t")
            - F.col("y_c").cast("double") / F.col("n_c"),
            6,
        )
        + 0.0
    )
    qini = F.when(F.col("cn_c") == 0, F.lit(None)).otherwise(
        F.round(
            F.col("cy_t").cast("double")
            - F.col("cy_c").cast("double") * F.col("cn_t") / F.col("cn_c"),
            6,
        )
        + 0.0
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n_t", "y_t", "n_c", "y_c",
        uplift.alias("uplift"),
        qini.alias("qini"),
    )
