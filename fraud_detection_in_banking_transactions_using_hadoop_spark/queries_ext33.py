"""Extension batch 33: stratified treatment effects, survey raking
(iterative proportional fitting), a deterministic permutation test,
and capture-recapture population estimation.

Scale notes (the 100 TB story per query):
- stratified_ate is the workhorse causal adjustment: per-stratum arm
  means from one groupBy of exact cent sums, stratum weights N_s/N,
  every per-stratum term an e3 integer -- the estimator that replaces
  "just compare the means" when treatment assignment is confounded by
  segment.
- raking_weights is survey post-stratification via IPF: the sample's
  125-cell nation x segment table is alternately scaled to match the
  population's row and column margins (2 full iterations). Each
  adjusted weight rounds to an e6 integer BEFORE the next margin sum,
  so every margin total is an exact integer sum and both engines walk
  the identical trajectory. The fact tables collapse to cells first;
  IPF itself runs on the bounded cell table.
- permutation_sign_test is exact inference without rand(): the
  year-over-year daily-revenue sign-flip test with B=100 replicates
  whose flip signs come from a multiplicative integer hash of
  (replicate, day-index). The (replicate x day) grid builds map-side
  off the bounded spine; all statistics are exact BIGINT sums and the
  p-value is a count ratio.
- capture_recapture estimates hidden population size from two
  overlapping observation lists (1996 vs 1997 active customers):
  Lincoln-Petersen and the bias-corrected Chapman estimator, pure
  integer arithmetic -- the fraud-ring / dark-population sizing tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Stratified average treatment effect.
# ---------------------------------------------------------------------------
@register(
    "stratified_ate",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment AS stratum,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS t,
             {_CENTS} AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per AS (
      SELECT stratum,
             CAST(sum(t) AS BIGINT) AS n_t,
             CAST(sum(1 - t) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS s_t,
             CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS s_c
      FROM base GROUP BY stratum
      HAVING sum(t) > 0 AND sum(1 - t) > 0
    ),
    tot AS (SELECT CAST(sum(n_t + n_c) AS BIGINT) AS n FROM per)
    SELECT p.stratum, p.n_t, p.n_c,
           CAST(round(1000.0 * (CAST(p.s_t AS DOUBLE) / p.n_t
                                - CAST(p.s_c AS DOUBLE) / p.n_c), 0) AS BIGINT)
             AS diff_e3,
           CAST(round(1000.0 * (CAST(p.n_t + p.n_c AS DOUBLE) / t.n)
                 * (CAST(p.s_t AS DOUBLE) / p.n_t
                    - CAST(p.s_c AS DOUBLE) / p.n_c), 0) AS BIGINT)
             AS ate_term_e3
    FROM per p CROSS JOIN tot t
    """,
    tags=("causal", "stratification", "A1"),
)
def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment arm means of order value (exact cent sums), stratum
    weight = segment share; ATE = sum(ate_term_e3)/1000 cents. Strata
    missing an arm drop in both engines. One join + one groupBy to 5
    rows; the total broadcasts."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("stratum"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias("t"),
        F.expr(_CENTS).alias("y"),
    )
    per = (
        base.groupBy("stratum")
        .agg(
            F.sum("t").cast("bigint").alias("n_t"),
            F.sum(1 - F.col("t")).cast("bigint").alias("n_c"),
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).cast("bigint").alias("s_t"),
            F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).cast("bigint").alias("s_c"),
        )
        .where((F.col("n_t") > 0) & (F.col("n_c") > 0))
    )
    tot = per.agg((F.sum(F.col("n_t") + F.col("n_c"))).cast("bigint").alias("n"))
    diff = F.col("s_t").cast("double") / F.col("n_t") - F.col("s_c").cast("double") / F.col("n_c")
    w = (F.col("n_t") + F.col("n_c")).cast("double") / F.col("n")
    return per.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_t",
        "n_c",
        F.round(1000.0 * diff, 0).cast("bigint").alias("diff_e3"),
        F.round(1000.0 * w * diff, 0).cast("bigint").alias("ate_term_e3"),
    )


# ---------------------------------------------------------------------------
# Survey raking (IPF) of the even-custkey sample to population margins.
# ---------------------------------------------------------------------------
@register(
    "raking_weights",
    """
    WITH pop AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    prow AS (SELECT nk, CAST(sum(n) AS BIGINT) AS target FROM pop GROUP BY nk),
    pcol AS (SELECT seg, CAST(sum(n) AS BIGINT) AS target FROM pop GROUP BY seg),
    samp AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(1000000 * count(*) AS BIGINT) AS w0
      FROM customer WHERE c_custkey % 2 = 0 GROUP BY 1, 2
    ),
    r1 AS (
      SELECT s.nk, s.seg,
             CAST(round(CAST(s.w0 AS DOUBLE) * pr.target * 1000000
                   / (SELECT CAST(sum(w0) AS DOUBLE) FROM samp s2
                      WHERE s2.nk = s.nk), 0) AS BIGINT) AS w
      FROM samp s JOIN prow pr ON s.nk = pr.nk
    ),
    c1 AS (
      SELECT r.nk, r.seg,
             CAST(round(CAST(r.w AS DOUBLE) * pc.target * 1000000
                   / (SELECT CAST(sum(w) AS DOUBLE) FROM r1 r2
                      WHERE r2.seg = r.seg), 0) AS BIGINT) AS w
      FROM r1 r JOIN pcol pc ON r.seg = pc.seg
    ),
    r2 AS (
      SELECT c.nk, c.seg,
             CAST(round(CAST(c.w AS DOUBLE) * pr.target * 1000000
                   / (SELECT CAST(sum(w) AS DOUBLE) FROM c1 c2
                      WHERE c2.nk = c.nk), 0) AS BIGINT) AS w
      FROM c1 c JOIN prow pr ON c.nk = pr.nk
    ),
    c2 AS (
      SELECT r.nk, r.seg,
             CAST(round(CAST(r.w AS DOUBLE) * pc.target * 1000000
                   / (SELECT CAST(sum(w) AS DOUBLE) FROM r2 r3
                      WHERE r3.seg = r.seg), 0) AS BIGINT) AS w
      FROM r2 r JOIN pcol pc ON r.seg = pc.seg
    )
    SELECT nk, seg, w AS weight_e6 FROM c2
    """,
    tags=("survey", "raking", "ipf"),
)
def q_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full IPF iterations (row-adjust, col-adjust, twice): the
    even-custkey sample's cell weights are scaled to the full
    population's nation and segment margins. Every adjusted weight
    rounds to an e6 integer BEFORE the next margin sum, so margin
    totals are exact integer sums and both engines walk the identical
    trajectory (the cross-group float-sum rule). All IPF work runs on
    the bounded 125-cell table."""
    cust = read_table(spark, sf_dir, "customer")
    pop = cust.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    prow = pop.groupBy("nk").agg(F.sum("n").cast("bigint").alias("rt"))
    pcol = pop.groupBy("seg").agg(F.sum("n").cast("bigint").alias("ct"))
    samp = (
        cust.where(F.col("c_custkey") % 2 == 0)
        .groupBy(F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg"))
        .agg((1000000 * F.count(F.lit(1))).cast("bigint").alias("w"))
    )

    def row_adjust(df):
        cur = df.groupBy("nk").agg(F.sum("w").cast("bigint").alias("cur"))
        return (
            df.join(cur, "nk")
            .join(prow, "nk")
            .select(
                "nk",
                "seg",
                F.round(
                    F.col("w").cast("double")
                    * F.col("rt")
                    * 1000000
                    / F.col("cur").cast("double"),
                    0,
                )
                .cast("bigint")
                .alias("w"),
            )
        )

    def col_adjust(df):
        cur = df.groupBy("seg").agg(F.sum("w").cast("bigint").alias("cur"))
        return (
            df.join(cur, "seg")
            .join(pcol, "seg")
            .select(
                "nk",
                "seg",
                F.round(
                    F.col("w").cast("double")
                    * F.col("ct")
                    * 1000000
                    / F.col("cur").cast("double"),
                    0,
                )
                .cast("bigint")
                .alias("w"),
            )
        )

    out = col_adjust(row_adjust(col_adjust(row_adjust(samp))))
    return out.select("nk", "seg", F.col("w").alias("weight_e6"))


# ---------------------------------------------------------------------------
# Deterministic permutation (sign-flip) test on year-over-year daily
# revenue changes.
# ---------------------------------------------------------------------------
_PERM_B = 100


@register(
    "permutation_sign_test",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    idx AS (
      SELECT c, lead(c, 364) OVER (ORDER BY d) AS nxt,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM days
    ),
    diffs AS (SELECT i, nxt - c AS delta FROM idx WHERE nxt IS NOT NULL),
    obs AS (SELECT CAST(sum(delta) AS BIGINT) AS t_obs,
                   CAST(count(*) AS BIGINT) AS n_pairs FROM diffs),
    grid AS (
      SELECT b.b, d.i, d.delta,
             CASE WHEN ((b.b * 104729 + d.i * 999983 + 12289) % 2147483647)
                       % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM diffs d CROSS JOIN (SELECT unnest(range({_PERM_B})) AS b) b
    ),
    reps AS (SELECT b, CAST(sum(sgn * delta) AS BIGINT) AS t FROM grid
             GROUP BY b)
    SELECT o.n_pairs, o.t_obs,
           CAST(sum(CASE WHEN abs(r.t) >= abs(o.t_obs) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           CAST((1000000 * (1 + sum(CASE WHEN abs(r.t) >= abs(o.t_obs)
                                    THEN 1 ELSE 0 END)))
                // ({_PERM_B} + 1) AS BIGINT) AS p_value_ppm
    FROM reps r CROSS JOIN obs o
    GROUP BY o.n_pairs, o.t_obs
    """,
    tags=("stats", "permutation", "inference"),
)
def q_permutation_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-flip permutation test of the mean year-over-year (364-day,
    week-aligned) daily revenue change: flip signs come from a
    multiplicative integer hash of (replicate, day-index) -- no
    rand(), identical replicates in both engines -- and every replicate
    statistic is an exact BIGINT sum. p = (1 + #extreme)/(B+1) in ppm.
    The grid builds map-side off the bounded spine."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d")
    idx = days.select(
        "c",
        F.lead("c", 364).over(w).alias("nxt"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    diffs = idx.where(F.col("nxt").isNotNull()).select(
        "i", (F.col("nxt") - F.col("c")).alias("delta")
    )
    obs = diffs.agg(
        F.sum("delta").cast("bigint").alias("t_obs"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    grid = diffs.select(
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        "i",
        "delta",
    ).select(
        F.col("b").cast("bigint").alias("b"),
        "i",
        "delta",
        F.when(
            ((F.col("b") * 104729 + F.col("i") * 999983 + 12289) % 2147483647) % 2 == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    reps = grid.groupBy("b").agg(
        F.sum(F.col("sgn") * F.col("delta")).cast("bigint").alias("t")
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .groupBy("n_pairs", "t_obs")
        .agg(
            F.sum(F.when(F.abs(F.col("t")) >= F.abs(F.col("t_obs")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            "n_pairs",
            "t_obs",
            "n_extreme",
            F.expr(
                f"CAST((1000000 * (1 + n_extreme)) DIV ({_PERM_B} + 1) AS BIGINT)"
            ).alias("p_value_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Capture-recapture population estimate from two activity lists.
# ---------------------------------------------------------------------------
@register(
    "capture_recapture",
    """
    WITH l1 AS (SELECT DISTINCT o_custkey AS k FROM orders
                WHERE o_orderdate >= DATE '1996-01-01'
                  AND o_orderdate < DATE '1997-01-01'),
    l2 AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE o_orderdate >= DATE '1997-01-01'
             AND o_orderdate < DATE '1998-01-01'),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM l1 JOIN l2 ON l1.k = l2.k),
    c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM l1) AS n1,
                 (SELECT CAST(count(*) AS BIGINT) FROM l2) AS n2,
                 (SELECT m FROM m) AS m)
    SELECT n1, n2, m,
           CASE WHEN m = 0 THEN NULL ELSE CAST((n1 * n2) // m AS BIGINT) END
             AS lincoln_petersen,
           CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS chapman
    FROM c
    """,
    tags=("stats", "population", "fraud"),
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two overlapping observation windows (1996 and 1997 active
    customers) size the underlying population: Lincoln-Petersen
    n1*n2/m and the bias-corrected Chapman estimator, all integer
    floor arithmetic. The fraud framing: estimate how many actors
    exist beyond the ones you've seen twice."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    l1 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    l2 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
        .select(F.col("o_custkey").alias("k2"))
        .distinct()
    )
    m = l1.join(l2, F.col("k") == F.col("k2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    n1 = l1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = l2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    c = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    return c.select(
        "n1",
        "n2",
        "m",
        F.when(F.col("m") == 0, F.lit(None).cast("bigint"))
        .otherwise(F.expr("CAST((n1 * n2) DIV m AS BIGINT)"))
        .alias("lincoln_petersen"),
        F.expr("CAST(((n1 + 1) * (n2 + 1)) DIV (m + 1) - 1 AS BIGINT)").alias("chapman"),
    )
