"""Extension batch 103: fairness auditing, regional shift-share
decomposition, and the AR(1) mean-reversion half-life.

- disparate_impact_audit: the four-fifths rule on discount access
  across customer nations -- rate ratios against the most-favored
  nation, with the 80% flag decided by the EXACT integer
  cross-multiplication 5 d_g n_ref < 4 d_ref n_g (no float ever
  touches the compliance decision). The regulatory screen every
  allocation system should ship with.
- shift_share_decomposition: each nation's 1996->1997 revenue change
  split into national-growth + segment-mix + local-share components
  (classic regional economics); the three components sum to the
  actual change by construction -- the identity is the test.
- ar1_half_life: phi from the exact lag-1 moment ratio on daily
  revenue; half-life = ln 2 / (-ln phi) is how many days a shock
  takes to decay halfway -- the operational meaning of 'how sticky
  is a good day'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Disparate-impact (four-fifths rule) audit of discount access.
# ---------------------------------------------------------------------------
@register(
    "disparate_impact_audit",
    """
    WITH base AS (
      SELECT c.c_nationkey AS g,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS got
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(got) AS BIGINT) AS d
      FROM base GROUP BY g),
    ref AS (
      SELECT g AS ref_g, n AS ref_n, d AS ref_d
      FROM per
      ORDER BY CAST(d AS DOUBLE) / n DESC, g LIMIT 1)
    SELECT CAST(p.g AS INTEGER) AS nationkey,
           p.n AS n_lines,
           round(CAST(p.d AS DOUBLE) / p.n, 6) AS discount_rate,
           round(CAST(p.d AS DOUBLE) / p.n
                 / (CAST(r.ref_d AS DOUBLE) / r.ref_n), 4) AS di_ratio,
           CASE WHEN 5 * p.d * r.ref_n < 4 * r.ref_d * p.n
                THEN 'below-4/5' ELSE 'ok' END AS four_fifths_flag
    FROM per p CROSS JOIN ref r
    ORDER BY nationkey
    """,
    tags=("fairness", "audit", "exact-arith"),
)
def q_disparate_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-fifths-rule audit of discount access by customer nation:
    selection rates against the most-favored nation, with the
    compliance flag decided by the exact integer inequality
    5 d_g n_ref < 4 d_ref n_g -- float rounding can never flip a
    regulatory verdict. di_ratio < 0.8 is the adverse-impact
    threshold the EEOC guideline names."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_discount")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .select(
            F.col("c_nationkey").alias("g"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("got"),
        )
    )
    per = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("got").cast("bigint").alias("d"),
    )
    ref = (
        per.orderBy((F.col("d").cast("double") / F.col("n")).desc(), "g")
        .limit(1)
        .select(
            F.col("g").alias("ref_g"),
            F.col("n").alias("ref_n"),
            F.col("d").alias("ref_d"),
        )
    )
    return (
        per.crossJoin(F.broadcast(ref))
        .select(
            F.col("g").cast("int").alias("nationkey"),
            F.col("n").alias("n_lines"),
            F.round(F.col("d").cast("double") / F.col("n"), 6).alias(
                "discount_rate"
            ),
            F.round(
                F.col("d").cast("double")
                / F.col("n")
                / (F.col("ref_d").cast("double") / F.col("ref_n")),
                4,
            ).alias("di_ratio"),
            F.when(
                5 * F.col("d") * F.col("ref_n") < 4 * F.col("ref_d") * F.col("n"),
                F.lit("below-4/5"),
            )
            .otherwise(F.lit("ok"))
            .alias("four_fifths_flag"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Shift-share decomposition of nation revenue growth 1996 -> 1997.
# ---------------------------------------------------------------------------
@register(
    "shift_share_decomposition",
    """
    WITH cells AS (
      SELECT c.c_nationkey AS g, c.c_mktsegment AS s,
             date_part('year', o.o_orderdate) AS yr,
             CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) // 100 AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE date_part('year', o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3),
    wide AS (
      SELECT g, s,
             CAST(sum(CASE WHEN yr = 1996 THEN rev ELSE 0 END) AS BIGINT) AS r0,
             CAST(sum(CASE WHEN yr = 1997 THEN rev ELSE 0 END) AS BIGINT) AS r1
      FROM cells GROUP BY g, s),
    segnat AS (
      SELECT s, CAST(sum(r0) AS BIGINT) AS s0, CAST(sum(r1) AS BIGINT) AS s1
      FROM wide GROUP BY s),
    nat AS (
      SELECT CAST(sum(s0) AS BIGINT) AS t0, CAST(sum(s1) AS BIGINT) AS t1
      FROM segnat),
    comp AS (
      SELECT w.g,
             CAST(sum(w.r1 - w.r0) AS BIGINT) AS actual,
             CAST(sum(CAST(floor(1e6 * (w.r0 * (CAST(n.t1 AS DOUBLE) / n.t0
                                                - 1.0)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS nat_e6,
             CAST(sum(CAST(floor(1e6 * (w.r0 * (CAST(sn.s1 AS DOUBLE) / sn.s0
                                                - CAST(n.t1 AS DOUBLE) / n.t0))
                                 + 0.5) AS BIGINT)) AS HUGEINT) AS mix_e6,
             CAST(sum(CAST(floor(1e6 * (w.r0 * (CAST(w.r1 AS DOUBLE)
                                                / nullif(w.r0, 0)
                                                - CAST(sn.s1 AS DOUBLE)
                                                  / sn.s0)) + 0.5) AS BIGINT))
                  AS HUGEINT) AS share_e6
      FROM wide w
      JOIN segnat sn ON sn.s = w.s
      CROSS JOIN nat n
      WHERE w.r0 > 0
      GROUP BY w.g)
    SELECT CAST(g AS INTEGER) AS nationkey,
           actual AS actual_change_dollars,
           CAST(nat_e6 // 1000000 AS BIGINT) AS national_component,
           CAST(mix_e6 // 1000000 AS BIGINT) AS mix_component,
           CAST(share_e6 // 1000000 AS BIGINT) AS share_component
    FROM comp ORDER BY nationkey
    """,
    tags=("econ", "decomposition", "exact-arith"),
)
def q_shift_share_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic shift-share: each nation's 1996->1997 revenue change
    decomposed over market segments into national-growth, segment-mix
    (did the nation sit in fast segments), and local-share (did it
    beat its segments) components. Cell terms floor to e6 integers
    before the per-nation sums; the three components sum to the
    actual change over cells with 1996 revenue (the additive
    identity, asserted in the invariant test). The decomposition a
    regional P&L review runs before praising or blaming a market."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cells = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .where(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("c_nationkey").alias("g"),
            F.col("c_mktsegment").alias("s"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.expr(
                "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
            ).alias("rev")
        )
    )
    wide = cells.groupBy("g", "s").agg(
        F.sum(F.when(F.col("yr") == 1996, F.col("rev")).otherwise(0))
        .cast("bigint")
        .alias("r0"),
        F.sum(F.when(F.col("yr") == 1997, F.col("rev")).otherwise(0))
        .cast("bigint")
        .alias("r1"),
    )
    segnat = wide.groupBy("s").agg(
        F.sum("r0").cast("bigint").alias("s0"),
        F.sum("r1").cast("bigint").alias("s1"),
    )
    nat = segnat.agg(
        F.sum("s0").cast("bigint").alias("t0"),
        F.sum("s1").cast("bigint").alias("t1"),
    )
    gnat = F.col("t1").cast("double") / F.col("t0")
    gseg = F.col("s1").cast("double") / F.col("s0")
    gloc = F.col("r1").cast("double") / F.nullif(F.col("r0"), F.lit(0))
    j = (
        wide.join(F.broadcast(segnat), "s")
        .crossJoin(F.broadcast(nat))
        .where(F.col("r0") > 0)
    )

    def e6(expr):
        return F.floor(F.lit(1e6) * expr + 0.5).cast("bigint")

    comp = j.groupBy("g").agg(
        F.sum(F.col("r1") - F.col("r0")).cast("bigint").alias("actual"),
        F.sum(e6(F.col("r0") * (gnat - 1.0))).cast(_DEC).alias("nat_e6"),
        F.sum(e6(F.col("r0") * (gseg - gnat))).cast(_DEC).alias("mix_e6"),
        F.sum(e6(F.col("r0") * (gloc - gseg))).cast(_DEC).alias("share_e6"),
    )
    return comp.select(
        F.col("g").cast("int").alias("nationkey"),
        F.col("actual").alias("actual_change_dollars"),
        F.expr("CAST(nat_e6 DIV 1000000 AS BIGINT)").alias("national_component"),
        F.expr("CAST(mix_e6 DIV 1000000 AS BIGINT)").alias("mix_component"),
        F.expr("CAST(share_e6 DIV 1000000 AS BIGINT)").alias("share_component"),
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# AR(1) mean-reversion half-life of daily revenue.
# ---------------------------------------------------------------------------
@register(
    "ar1_half_life",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    seq AS (
      SELECT CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t, y FROM d),
    pairs AS (
      SELECT a.y AS yl, b.y AS yt
      FROM seq a JOIN seq b ON b.t = a.t + 1),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yl) AS HUGEINT) AS sl,
             CAST(sum(yt) AS HUGEINT) AS st2,
             CAST(sum(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS sll,
             CAST(sum(CAST(yl AS HUGEINT) * yt) AS HUGEINT) AS slt
      FROM pairs),
    c AS (
      SELECT n,
             CAST(n * slt - sl * st2 AS DOUBLE)
               / CAST(n * sll - sl * sl AS DOUBLE) AS phi
      FROM mom)
    SELECT n AS n_pairs,
           round(phi, 6) + 0.0 AS ar1_phi,
           CASE WHEN phi > 0 AND phi < 1
                THEN round(ln(2.0) / (-ln(phi)), 2) END AS half_life_days,
           CASE WHEN phi > 0 AND phi < 1 THEN 'mean-reverting'
                WHEN phi >= 1 THEN 'non-stationary'
                ELSE 'anti-persistent' END AS regime
    FROM c
    """,
    tags=("timeseries", "mean-reversion", "exact-arith"),
)
def q_ar1_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) on daily revenue via the exact lag-pair moment ratio
    phi = C(y_t, y_{t-1}) / Var(y_{t-1}); the mean-reversion
    half-life ln 2 / (-ln phi) is the number of days a revenue shock
    takes to decay halfway back -- the single most operational
    restatement of autocorrelation a planner can use (and NULL when
    phi leaves (0,1), where no half-life exists)."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.expr(
            "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
        ).alias("y")
    )
    seq = d.select(
        F.row_number().over(Window.orderBy("dt")).cast("bigint").alias("t"), "y"
    )
    a = seq.select("t", F.col("y").alias("yl"))
    b = seq.select((F.col("t") - 1).alias("t"), F.col("y").alias("yt"))
    pairs = a.join(b, "t").select("yl", "yt")
    mom = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yl").cast(_DEC).alias("sl"),
        F.sum("yt").cast(_DEC).alias("st2"),
        F.sum(F.col("yl").cast(_DEC) * F.col("yl").cast(_DEC)).cast(_DEC).alias("sll"),
        F.sum(F.col("yl").cast(_DEC) * F.col("yt").cast(_DEC)).cast(_DEC).alias("slt"),
    )
    nd = F.col("n").cast(_DEC)
    phi = (nd * F.col("slt") - F.col("sl") * F.col("st2")).cast("double") / (
        nd * F.col("sll") - F.col("sl") * F.col("sl")
    ).cast("double")
    c = mom.select("n", phi.alias("phi"))
    in_range = (F.col("phi") > 0) & (F.col("phi") < 1)
    return c.select(
        F.col("n").alias("n_pairs"),
        (F.round("phi", 6) + 0.0).alias("ar1_phi"),
        F.when(
            in_range, F.round(F.log(F.lit(2.0)) / (-F.log(F.col("phi"))), 2)
        ).alias("half_life_days"),
        F.when(in_range, F.lit("mean-reverting"))
        .when(F.col("phi") >= 1, F.lit("non-stationary"))
        .otherwise(F.lit("anti-persistent"))
        .alias("regime"),
    )
