"""Extension batch 89: record-counts test, biweight midvariance, and
the Theil between/within decomposition.

- record_counts_test: under exchangeability the number of running-max
  records in n days is sum 1/t in expectation (every prefix's max is
  equally likely to be last) -- a distribution-free trend screen with
  NO parameters. Observed records come from the running-max window;
  the harmonic mean/variance close over e15-integer reciprocal terms.
- biweight_midvariance: Tukey's robust scale -- the
  breakdown-resistant SD the z-score family should use when spikes
  exist. Median and MAD are exact spine order statistics; the
  bounded-weight terms are e4/e9-scaled integers before the sums.
- theil_decomposition: theil_index reports ONE number; the
  decomposition T = T_between + sum s_g T_g(within) says how much
  inequality lives BETWEEN nations vs within them -- the property
  that makes Theil (not gini) the policy-analysis index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Record-counts exchangeability test on daily revenue.
# ---------------------------------------------------------------------------
@register(
    "record_counts_test",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    seq AS (
      SELECT dt, y,
             CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
             max(y) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      FROM d),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN prevmax IS NULL OR y > prevmax
                           THEN 1 ELSE 0 END) AS BIGINT) AS records,
             CAST(sum(CAST(floor(1e15 / t + 0.5) AS BIGINT)) AS HUGEINT)
               AS h_e15,
             CAST(sum(CAST(floor(1e15 * (t - 1) / (CAST(t AS DOUBLE) * t) + 0.5)
                           AS BIGINT)) AS HUGEINT) AS v_e15
      FROM seq)
    SELECT n AS n_days, records AS n_records,
           round(CAST(h_e15 AS DOUBLE) / 1e15, 4) AS expected_records,
           round((CAST(records AS DOUBLE) - CAST(h_e15 AS DOUBLE) / 1e15)
                 / sqrt(CAST(v_e15 AS DOUBLE) / 1e15), 4) + 0.0 AS z_score
    FROM s
    """,
    tags=("timeseries", "records", "exact-arith"),
)
def q_record_counts_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count the running-max record days of daily revenue and compare
    against the exchangeability law E[R] = sum 1/t, Var[R] =
    sum (t-1)/t^2: far more records than H_n means a rising level
    (each term floors to an e15 integer so both engines sum identical
    addends; the record indicator is an exact integer comparison
    against the strict prefix max). The zero-parameter cousin of
    mann_kendall_trend."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    w = Window.orderBy("dt")
    seq = d.select(
        "y",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.max("y").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("prevmax"),
    )
    s = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("prevmax").isNull() | (F.col("y") > F.col("prevmax")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("records"),
        F.sum(F.floor(F.lit(1e15) / F.col("t") + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("h_e15"),
        F.sum(
            F.floor(
                F.lit(1e15)
                * (F.col("t") - 1)
                / (F.col("t").cast("double") * F.col("t"))
                + 0.5
            ).cast("bigint")
        )
        .cast(_DEC)
        .alias("v_e15"),
    )
    h = F.col("h_e15").cast("double") / 1e15
    v = F.col("v_e15").cast("double") / 1e15
    return s.select(
        F.col("n").alias("n_days"),
        F.col("records").alias("n_records"),
        F.round(h, 4).alias("expected_records"),
        (F.round((F.col("records").cast("double") - h) / F.sqrt(v), 4) + 0.0).alias(
            "z_score"
        ),
    )


# ---------------------------------------------------------------------------
# Tukey biweight midvariance of daily revenue.
# ---------------------------------------------------------------------------
@register(
    "biweight_midvariance",
    """
    WITH d AS (
      SELECT CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    sp1 AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY y),
    r1 AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM sp1),
    med AS (
      SELECT min(v) AS m FROM r1
      WHERE 2 * cc >= (SELECT CAST(sum(c) AS BIGINT) FROM sp1)),
    sp2 AS (
      SELECT abs(y - (SELECT m FROM med)) AS v, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY abs(y - (SELECT m FROM med))),
    r2 AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM sp2),
    mad AS (
      SELECT min(v) AS md FROM r2
      WHERE 2 * cc >= (SELECT CAST(sum(c) AS BIGINT) FROM sp2)),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN abs(CAST(y - m.m AS DOUBLE) / (9.0 * md)) < 1.0
               THEN CAST(floor(1e4 * (CAST(y - m.m AS DOUBLE) * (y - m.m)
                 * pow(1.0 - (CAST(y - m.m AS DOUBLE) / (9.0 * md))
                             * (CAST(y - m.m AS DOUBLE) / (9.0 * md)), 2.0)
                 * pow(1.0 - (CAST(y - m.m AS DOUBLE) / (9.0 * md))
                             * (CAST(y - m.m AS DOUBLE) / (9.0 * md)), 2.0))
                 + 0.5) AS BIGINT) ELSE 0 END) AS HUGEINT) AS num_e4,
             CAST(sum(CASE WHEN abs(CAST(y - m.m AS DOUBLE) / (9.0 * md)) < 1.0
               THEN CAST(floor(1e9 * ((1.0 - (CAST(y - m.m AS DOUBLE) / (9.0 * md))
                                            * (CAST(y - m.m AS DOUBLE) / (9.0 * md)))
                 * (1.0 - 5.0 * (CAST(y - m.m AS DOUBLE) / (9.0 * md))
                              * (CAST(y - m.m AS DOUBLE) / (9.0 * md))))
                 + 0.5) AS BIGINT) ELSE 0 END) AS HUGEINT) AS den_e9,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
      FROM d CROSS JOIN med m CROSS JOIN mad),
    c AS (
      SELECT n,
             CAST(n AS DOUBLE) * (CAST(num_e4 AS DOUBLE) / 1e4)
               / ((CAST(den_e9 AS DOUBLE) / 1e9)
                  * (CAST(den_e9 AS DOUBLE) / 1e9)) AS bwmv,
             (CAST(n AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * n) AS varp
      FROM terms)
    SELECT n AS n_days,
           (SELECT CAST(m AS BIGINT) FROM med) AS median_dollars,
           (SELECT CAST(md AS BIGINT) FROM mad) AS mad_dollars,
           round(sqrt(bwmv), 4) AS biweight_sd_dollars,
           round(sqrt(varp), 4) AS classical_sd_dollars,
           round(sqrt(bwmv) / sqrt(varp), 6) AS robust_ratio
    FROM c
    """,
    tags=("robust", "scale", "exact-arith"),
)
def q_biweight_midvariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey biweight midvariance of daily revenue (whole dollars):
    u = (y - median)/(9 MAD), BWMV = n sum((y-M)^2 (1-u^2)^4) /
    (sum((1-u^2)(1-5u^2)))^2 over |u| < 1 -- the robust scale whose
    breakdown point a spike can't poison, against the classical SD
    for the tell-tale ratio. Median and MAD are exact order
    statistics off value spines; numerator terms floor to e4 and
    denominator terms to e9 integers before the sums."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.expr(
            "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
        ).alias("y")
    )
    sp1 = d.groupBy(F.col("y").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n1 = sp1.agg(F.sum("c").cast("bigint").alias("nn"))
    r1v = with_global_rank(sp1, "v", [F.col("v")], prefix_sum={"cc": "c"})
    med = (
        r1v.crossJoin(F.broadcast(n1))
        .where(2 * F.col("cc") >= F.col("nn"))
        .agg(F.min("v").alias("m"))
    )
    dm = d.crossJoin(F.broadcast(med))
    sp2 = dm.groupBy(F.abs(F.col("y") - F.col("m")).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n2 = sp2.agg(F.sum("c").cast("bigint").alias("nn2"))
    r2v = with_global_rank(sp2, "v", [F.col("v")], prefix_sum={"cc2": "c"})
    mad = (
        r2v.crossJoin(F.broadcast(n2))
        .where(2 * F.col("cc2") >= F.col("nn2"))
        .agg(F.min("v").alias("md"))
    )
    base = dm.crossJoin(F.broadcast(mad))
    dev = F.col("y") - F.col("m")
    ud = dev.cast("double") / (9.0 * F.col("md"))
    inside = F.abs(ud) < 1.0
    one_u2 = 1.0 - ud * ud
    num_term = F.floor(
        F.lit(1e4)
        * (dev.cast("double") * dev * F.pow(one_u2, F.lit(2.0)) * F.pow(one_u2, F.lit(2.0)))
        + 0.5
    ).cast("bigint")
    den_term = F.floor(
        F.lit(1e9) * (one_u2 * (1.0 - 5.0 * ud * ud)) + 0.5
    ).cast("bigint")
    terms = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # cast each term to DECIMAL BEFORE the sum: Spark's sum over
        # BIGINT keeps a LONG accumulator (ANSI overflow at sf0.1 --
        # the e4-scaled squared deviations total past 2^63), while
        # DuckDB's sum(BIGINT) auto-promotes to HUGEINT (r10 sweep)
        F.sum(F.when(inside, num_term).otherwise(0).cast(_DEC)).alias("num_e4"),
        F.sum(F.when(inside, den_term).otherwise(0).cast(_DEC)).alias("den_e9"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sy2"),
        F.max("m").alias("m"),
        F.max("md").alias("md"),
    )
    nd = F.col("n").cast("double")
    bwmv = (
        nd
        * (F.col("num_e4").cast("double") / 1e4)
        / (
            (F.col("den_e9").cast("double") / 1e9)
            * (F.col("den_e9").cast("double") / 1e9)
        )
    )
    varp = (nd * F.col("sy2").cast("double") - F.col("sy").cast("double") * F.col("sy")) / (
        nd * F.col("n")
    )
    c = terms.select("n", "m", "md", bwmv.alias("bwmv"), varp.alias("varp"))
    return c.select(
        F.col("n").alias("n_days"),
        F.col("m").cast("bigint").alias("median_dollars"),
        F.col("md").cast("bigint").alias("mad_dollars"),
        F.round(F.sqrt("bwmv"), 4).alias("biweight_sd_dollars"),
        F.round(F.sqrt("varp"), 4).alias("classical_sd_dollars"),
        F.round(F.sqrt("bwmv") / F.sqrt("varp"), 6).alias("robust_ratio"),
    )


# ---------------------------------------------------------------------------
# Theil inequality decomposition between/within nations.
# ---------------------------------------------------------------------------
@register(
    "theil_decomposition",
    """
    WITH spend AS (
      SELECT c.c_nationkey AS g,
             CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey, c.c_nationkey),
    gs AS (
      SELECT g, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(x) AS HUGEINT) AS xg,
             CAST(sum(CAST(floor(1e6 * (CAST(x AS DOUBLE)
                                        * ln(CAST(x AS DOUBLE))) + 0.5)
                           AS BIGINT)) AS HUGEINT) AS xlx_e6
      FROM spend GROUP BY g),
    tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(xg) AS HUGEINT) AS xx,
             CAST(sum(xlx_e6) AS HUGEINT) AS xlx
      FROM gs),
    parts AS (
      SELECT
        (SELECT CAST(xlx AS DOUBLE) / 1e6 / CAST(xx AS DOUBLE)
                - ln(CAST(xx AS DOUBLE) / n) FROM tot) AS t_total,
        (SELECT CAST(sum(CAST(floor(1e9 * (CAST(xg AS DOUBLE) / t.xx
                  * ln((CAST(xg AS DOUBLE) / ng)
                       / (CAST(t.xx AS DOUBLE) / t.n))) + 0.5) AS BIGINT))
                AS DOUBLE) / 1e9
         FROM gs CROSS JOIN tot t) AS t_between)
    SELECT round(t_total, 6) AS theil_total,
           round(t_between, 6) + 0.0 AS theil_between,
           round(t_total - t_between, 6) + 0.0 AS theil_within,
           round(t_between / t_total, 4) AS between_share
    FROM parts
    """,
    tags=("econ", "inequality", "exact-arith"),
)
def q_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T decomposed over nations: T = sum(x ln x)/X - ln(X/n)
    (e6-integer x*ln(x) terms per customer) and T_between =
    sum_g s_g ln(mu_g / mu) with revenue-share weights (e9-integer
    group terms); T_within = T - T_between by the exact additive
    identity. A high between_share means nationality, not individual
    variation, drives spend inequality -- the question the scalar
    theil_index can't answer."""
    orders = read_table(spark, sf_dir, "orders")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        orders.join(cu, orders.o_custkey == cu.c_custkey)
        .groupBy("o_custkey", F.col("c_nationkey").alias("g"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
        )
    )
    xd = F.col("x").cast("double")
    gs = spend.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast(_DEC).alias("xg"),
        F.sum(F.floor(F.lit(1e6) * (xd * F.log(xd)) + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("xlx_e6"),
    )
    tot = gs.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("xg").cast(_DEC).alias("xx"),
        F.sum("xlx_e6").cast(_DEC).alias("xlx"),
    )
    t_total_df = tot.select(
        (
            F.col("xlx").cast("double") / 1e6 / F.col("xx").cast("double")
            - F.log(F.col("xx").cast("double") / F.col("n"))
        ).alias("t_total")
    )
    between_term = F.floor(
        F.lit(1e9)
        * (
            F.col("xg").cast("double") / F.col("xx")
            * F.log(
                (F.col("xg").cast("double") / F.col("ng"))
                / (F.col("xx").cast("double") / F.col("n"))
            )
        )
        + 0.5
    ).cast("bigint")
    t_between_df = (
        gs.crossJoin(F.broadcast(tot))
        .agg(F.sum(between_term).cast("double").alias("tb_e9"))
        .select((F.col("tb_e9") / 1e9).alias("t_between"))
    )
    parts = t_total_df.crossJoin(F.broadcast(t_between_df))
    return parts.select(
        F.round("t_total", 6).alias("theil_total"),
        (F.round("t_between", 6) + 0.0).alias("theil_between"),
        (F.round(F.col("t_total") - F.col("t_between"), 6) + 0.0).alias(
            "theil_within"
        ),
        F.round(F.col("t_between") / F.col("t_total"), 4).alias("between_share"),
    )
