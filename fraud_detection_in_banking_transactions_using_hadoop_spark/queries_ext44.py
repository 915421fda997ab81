"""Extension batch 44: the log-rank survival test, a credit scorecard,
and per-group median confidence intervals.

Scale notes (the 100 TB story per query):
- logrank_test completes the survival toolkit (Kaplan-Meier draws the
  curves; log-rank decides if they differ): subjects are customers,
  "death" is the second order (gap in days from the first), censoring
  at the corpus horizon. At-risk counts per group come from cumulative
  sums over the distinct day-gap spine (calendar-bounded); every
  per-time O-E and variance term is an e9 integer before the
  (order-free) sum, and only the closing z is a float.
- scorecard_points is the additive credit-scorecard: per-order points
  from banded value and priority (CASE literals), a per-customer
  return-history penalty, risk classes from fixed cutoffs. Pure
  integer map-side arithmetic + one customer groupBy -- the shape
  every production score card compiles to.
- grouped_median_ci generalizes the order-statistic median CI to
  per-group: every window is PARTITIONED by nation (spine cumulative
  counts, per-group rank bounds), so the whole thing is scale-free --
  the grouped form a dashboard of 25 nations actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Log-rank test: time to second order, BUILDING vs other segments.
# ---------------------------------------------------------------------------
@register(
    "logrank_test",
    """
    WITH firsts AS (
      SELECT o.o_custkey,
             min(o.o_orderdate) AS t1,
             CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS died
      FROM orders o GROUP BY o.o_custkey
    ),
    seconds AS (
      SELECT o_custkey, min(d2) AS t2 FROM (
        SELECT o_custkey, o_orderdate AS d2,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
      ) WHERE rn = 2 GROUP BY o_custkey
    ),
    horizon AS (SELECT max(o_orderdate) AS h FROM orders),
    subj AS (
      SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS grp,
             f.died,
             CASE WHEN f.died = 1
                  THEN date_diff('day', f.t1, s.t2)
                  ELSE date_diff('day', f.t1, (SELECT h FROM horizon))
             END AS gap
      FROM firsts f
      JOIN customer c ON c.c_custkey = f.o_custkey
      LEFT JOIN seconds s ON s.o_custkey = f.o_custkey
    ),
    spine AS (
      SELECT gap,
             CAST(sum(CASE WHEN grp = 1 AND died = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d1,
             CAST(sum(CASE WHEN grp = 0 AND died = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x0
      FROM subj GROUP BY gap
    ),
    tot AS (SELECT CAST(sum(x1) AS BIGINT) AS n1t,
                   CAST(sum(x0) AS BIGINT) AS n0t FROM spine),
    risk AS (
      SELECT gap, d1, d0,
             t.n1t - coalesce(sum(x1) OVER (ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1,
             t.n0t - coalesce(sum(x0) OVER (ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r0
      FROM spine CROSS JOIN tot t
    ),
    terms AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum(CAST(round(1000000000.0 * (d1 + d0)
                   * CAST(r1 AS DOUBLE) / (r1 + r0), 0) AS BIGINT))
                  AS BIGINT) AS e1_e9,
             CAST(sum(CASE WHEN r1 + r0 > 1 THEN
                   CAST(round(1000000000.0 * (d1 + d0)
                     * (CAST(r1 AS DOUBLE) / (r1 + r0))
                     * (CAST(r0 AS DOUBLE) / (r1 + r0))
                     * (r1 + r0 - d1 - d0) / (r1 + r0 - 1), 0) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS v_e9
      FROM risk WHERE d1 + d0 > 0
    )
    SELECT o1 AS observed_1,
           round(e1_e9 / 1000000000.0, 6) AS expected_1,
           CASE WHEN v_e9 = 0 THEN NULL
                ELSE round((o1 - e1_e9 / 1000000000.0)
                           / sqrt(v_e9 / 1000000000.0), 6)
           END AS z_score
    FROM terms
    """,
    tags=("survival", "logrank", "stats"),
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does BUILDING reorder faster? Death = second order (day gap from
    the first), censoring at the corpus horizon. At-risk counts per
    group are prefix sums over the distinct day-gap spine; each
    hypergeometric expectation/variance term rounds to an e9 integer
    before the sum, and z = (O1 - E1)/sqrt(V) closes in one float."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("t1"),
        F.when(F.count(F.lit(1)) >= 2, 1).otherwise(0).alias("died"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seconds = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 2)
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("t2"))
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    subj = (
        firsts.join(cust, firsts.o_custkey == cust.c_custkey)
        .join(seconds, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("grp"),
            "died",
            F.when(F.col("died") == 1, F.datediff(F.col("t2"), F.col("t1")))
            .otherwise(F.datediff(F.col("h"), F.col("t1")))
            .alias("gap"),
        )
    )
    spine = subj.groupBy("gap").agg(
        F.sum(F.when((F.col("grp") == 1) & (F.col("died") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("died") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("x0"),
    )
    tot = spine.agg(
        F.sum("x1").cast("bigint").alias("n1t"), F.sum("x0").cast("bigint").alias("n0t")
    )
    wg = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, -1)
    risk = spine.crossJoin(F.broadcast(tot)).select(
        "gap",
        "d1",
        "d0",
        (F.col("n1t") - F.coalesce(F.sum("x1").over(wg), F.lit(0))).alias("r1"),
        (F.col("n0t") - F.coalesce(F.sum("x0").over(wg), F.lit(0))).alias("r0"),
    )
    dtot = F.col("d1") + F.col("d0")
    rtot = F.col("r1") + F.col("r0")
    e_term = F.round(
        F.lit(1000000000.0) * dtot * F.col("r1").cast("double") / rtot, 0
    ).cast("bigint")
    v_term = F.when(
        rtot > 1,
        F.round(
            F.lit(1000000000.0)
            * dtot
            * (F.col("r1").cast("double") / rtot)
            * (F.col("r0").cast("double") / rtot)
            * (rtot - dtot)
            / (rtot - 1),
            0,
        ).cast("bigint"),
    ).otherwise(0)
    terms = risk.where(dtot > 0).agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(e_term).cast("bigint").alias("e1_e9"),
        F.sum(v_term).cast("bigint").alias("v_e9"),
    )
    return terms.select(
        F.col("o1").alias("observed_1"),
        F.round(F.col("e1_e9") / 1000000000.0, 6).alias("expected_1"),
        F.when(F.col("v_e9") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("o1") - F.col("e1_e9") / 1000000000.0)
                / F.sqrt(F.col("v_e9") / 1000000000.0),
                6,
            )
        )
        .alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Additive credit scorecard with banded points.
# ---------------------------------------------------------------------------
@register(
    "scorecard_points",
    f"""
    WITH order_pts AS (
      SELECT o_custkey,
             CASE WHEN {_CENTS} < 5000000 THEN 10
                  WHEN {_CENTS} < 20000000 THEN 20 ELSE 35 END
             + CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 25 ELSE 0 END AS pts
      FROM orders
    ),
    returns AS (
      SELECT o.o_custkey, CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_ret
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R' GROUP BY o.o_custkey
    ),
    per AS (
      SELECT p.o_custkey,
             CAST(500 + sum(p.pts) - 40 * coalesce(max(r.n_ret), 0) AS BIGINT)
               AS score,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(coalesce(max(r.n_ret), 0) AS BIGINT) AS n_returned
      FROM order_pts p LEFT JOIN returns r ON p.o_custkey = r.o_custkey
      GROUP BY p.o_custkey
    )
    SELECT o_custkey, n_orders, n_returned, score,
           CASE WHEN score >= 900 THEN 'A'
                WHEN score >= 700 THEN 'B' ELSE 'C' END AS risk_class
    FROM per
    """,
    tags=("fraud", "scorecard", "credit"),
)
def q_scorecard_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The additive scorecard every credit shop compiles to: banded
    order-value points + priority points per order, a flat penalty per
    returned order, base 500, fixed class cutoffs. Pure integer
    map-side CASEs + one customer groupBy."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    pts = (
        F.when(F.expr(_CENTS) < 5000000, 10)
        .when(F.expr(_CENTS) < 20000000, 20)
        .otherwise(35)
        + F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 25).otherwise(0)
    )
    order_pts = o.select("o_custkey", pts.alias("pts"))
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    returns = (
        li.select("l_orderkey")
        .distinct()
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ret"))
    )
    per = (
        order_pts.groupBy("o_custkey")
        .agg(
            F.sum("pts").cast("bigint").alias("sum_pts"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .join(returns, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_orders",
            F.coalesce(F.col("n_ret"), F.lit(0)).cast("bigint").alias("n_returned"),
            (500 + F.col("sum_pts") - 40 * F.coalesce(F.col("n_ret"), F.lit(0)))
            .cast("bigint")
            .alias("score"),
        )
    )
    return per.select(
        "o_custkey",
        "n_orders",
        "n_returned",
        "score",
        F.when(F.col("score") >= 900, "A")
        .when(F.col("score") >= 700, "B")
        .otherwise("C")
        .alias("risk_class"),
    )


# ---------------------------------------------------------------------------
# Per-nation median CI from partitioned order statistics.
# ---------------------------------------------------------------------------
@register(
    "grouped_median_ci",
    f"""
    WITH vals AS (
      SELECT c.c_nationkey AS nk, {_CENTS} AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    spine AS (SELECT nk, v, CAST(count(*) AS BIGINT) AS c FROM vals
              GROUP BY nk, v),
    cum AS (
      SELECT nk, v, sum(c) OVER (PARTITION BY nk ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (
      SELECT nk, CAST(sum(c) AS BIGINT) AS n,
             CAST((sum(c) + 1) // 2 AS BIGINT) AS r_med,
             CAST(greatest(floor((sum(c) - 1.959964 * sqrt(sum(c))) / 2), 1)
                  AS BIGINT) AS r_lo,
             CAST(least(ceil(1 + (sum(c) + 1.959964 * sqrt(sum(c))) / 2),
                        sum(c)) AS BIGINT) AS r_hi
      FROM spine GROUP BY nk),
    pick AS (
      SELECT t.nk, t.n,
             min(CASE WHEN cum.cc >= t.r_med THEN cum.v END) AS median_cents,
             min(CASE WHEN cum.cc >= t.r_lo THEN cum.v END) AS lo_cents,
             min(CASE WHEN cum.cc >= t.r_hi THEN cum.v END) AS hi_cents
      FROM cum JOIN tot t ON cum.nk = t.nk
      GROUP BY t.nk, t.n)
    SELECT nk, n, median_cents, lo_cents, hi_cents FROM pick
    """,
    tags=("stats", "order-statistics", "grouped"),
)
def q_grouped_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median_ci_orderstat per nation: every window is PARTITIONED by
    the group key (per-group spine cumulative counts, per-group
    binomial rank bounds), so 25 simultaneous CIs cost the same plan
    shape as one -- the grouped form is fully scale-free."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    vals = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nk"), F.expr(_CENTS).alias("v")
    )
    spine = vals.groupBy("nk", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wv = (
        Window.partitionBy("nk").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spine.select("nk", "v", F.sum("c").over(wv).alias("cc"))
    sn = F.sum("c")
    tot = spine.groupBy("nk").agg(
        sn.cast("bigint").alias("n"),
        F.expr("CAST((sum(c) + 1) DIV 2 AS BIGINT)").alias("r_med"),
        F.greatest(F.floor((sn - 1.959964 * F.sqrt(sn)) / 2), F.lit(1).cast("bigint"))
        .cast("bigint")
        .alias("r_lo"),
        F.least(F.ceil(1 + (sn + 1.959964 * F.sqrt(sn)) / 2), sn.cast("bigint"))
        .cast("bigint")
        .alias("r_hi"),
    )
    return (
        cum.join(tot, "nk")
        .groupBy("nk", "n")
        .agg(
            F.min(F.when(F.col("cc") >= F.col("r_med"), F.col("v"))).alias("median_cents"),
            F.min(F.when(F.col("cc") >= F.col("r_lo"), F.col("v"))).alias("lo_cents"),
            F.min(F.when(F.col("cc") >= F.col("r_hi"), F.col("v"))).alias("hi_cents"),
        )
        .select("nk", "n", "median_cents", "lo_cents", "hi_cents")
    )
