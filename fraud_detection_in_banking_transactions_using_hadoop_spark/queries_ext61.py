"""Extension batch 61: KMV distinct sketch, Wasserstein-1 price gap,
Mann-Kendall trend test, and Pettitt changepoint.

Scale notes (the 100 TB story per query):
- kmv_distinct_sketch is the order-statistics cousin of HLL
  (approx_aggs): keep the k smallest 48-bit hashes of the key, estimate
  distinct = (k-1) * 2^48 / h_(k). The k-smallest select is
  TakeOrderedAndProject (per-partition heaps, one k-row merge -- no
  global sort), and two sketches MERGE by unioning hash sets and
  re-taking k smallest, which the union arm exercises. Estimates are
  exact DECIMAL(38,0)/HUGEINT floor divisions, so the error itself is
  part of the hash-checked contract.
- wasserstein_price_gap integrates the FULL EDF gap between two arms
  (where KS takes the max and CvM the square): W1 * n * m =
  sum over the distinct-value spine of (v_next - v) * |A*m - B*n|.
  The o_totalprice cent spine is ~O(rows) (measured, README), so
  cumulative arm counts come from operators/rank.with_global_rank and
  v_next from the rank equi-join (r+1) -- no single-task window, no
  lead() over the raw spine. Exact HUGEINT accumulation.
- mann_kendall_trend is the significance companion to theil_sen_slope:
  S = sum of sign(x_j - x_i) over day pairs of the daily revenue
  series (calendar-bounded |days|^2 broadcast pair join, the
  kendall_tau_daily shape), tie-corrected Var(S) kept as the exact
  integer 18*Var, one closing sqrt.
- pettitt_changepoint is the rank-based (distribution-free) single
  changepoint locator: U_t from DOUBLED average ranks (the
  mann_whitney spine trick keeps ties exact integers),
  K = max |U_t|, p ~ 2 exp(-6 K^2 / (n^3 + n^2)). Windows run over
  the ~|days| daily series only (growth-gate CALENDAR class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_KMV_K = 64
_H48 = 281474976710656  # 2^48


# ---------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch with a merge arm.
# ---------------------------------------------------------------------------
@register(
    "kmv_distinct_sketch",
    f"""
    WITH cust AS (
      SELECT o_custkey AS ck,
             CASE WHEN o_orderdate < DATE '1998-01-01' THEN 'h1' ELSE 'h2' END
               AS arm
      FROM orders),
    hashes AS (
      SELECT arm, ('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM (SELECT DISTINCT arm, ck FROM cust)),
    both_arms AS (
      SELECT arm, h FROM hashes
      UNION ALL
      SELECT 'union' AS arm, h FROM (SELECT DISTINCT h FROM hashes)),
    ranked AS (
      SELECT arm, h,
             row_number() OVER (PARTITION BY arm ORDER BY h) AS rk,
             count(*) OVER (PARTITION BY arm) AS n_exact
      FROM both_arms),
    kth AS (
      SELECT arm, CAST(max(n_exact) AS BIGINT) AS exact_distinct,
             max(CASE WHEN rk = {_KMV_K} THEN h END) AS hk
      FROM ranked WHERE rk <= {_KMV_K} GROUP BY arm)
    SELECT arm,
           CAST({_KMV_K} AS INTEGER) AS k,
           exact_distinct,
           CAST(CASE WHEN exact_distinct < {_KMV_K} THEN exact_distinct
                ELSE CAST({_KMV_K - 1} AS HUGEINT) * {_H48} // hk END
             AS BIGINT) AS kmv_estimate,
           CAST((1000000 * abs(CAST(CASE WHEN exact_distinct < {_KMV_K}
                     THEN exact_distinct
                     ELSE CAST({_KMV_K - 1} AS HUGEINT) * {_H48} // hk END
                   AS BIGINT) - exact_distinct)) // exact_distinct AS BIGINT)
             AS abs_err_ppm
    FROM kth ORDER BY arm
    """,
    tags=("sketch", "distinct", "mergeable"),
)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active customers per half-era plus the MERGED sketch:
    union the two hash sets, re-take the k smallest -- the mergeability
    that makes KMV a warehouse-rollup sketch. The per-arm k-smallest is
    a bounded sort (k rows per arm survive); estimate and its error are
    exact integer arithmetic, so the oracle checks the sketch's error,
    not just its machinery. At 64 <= distinct the estimate lands within
    a few percent; below k the sketch IS exact and says so."""
    orders = read_table(spark, sf_dir, "orders")
    cust = orders.select(
        F.col("o_custkey").alias("ck"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), "h1"
        ).otherwise("h2").alias("arm"),
    ).distinct()
    hashes = cust.select(
        "arm",
        F.conv(F.substring(F.md5(F.col("ck").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    both = hashes.unionByName(
        hashes.select(F.lit("union").alias("arm"), "h").distinct()
    )
    # exact per-arm counts as a 3-row broadcast dim; the rank filter
    # rk <= k then plans as WindowGroupLimit (per-partition group
    # limits), so the k-smallest never sorts a whole arm in one task
    counts = both.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    w = Window.partitionBy("arm").orderBy("h")
    kth = (
        both.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KMV_K)
        .groupBy("arm")
        .agg(F.max("h").alias("hk"))  # = h_(min(k, n)): the kth order stat
        .join(F.broadcast(counts), "arm")
    )
    est = (
        kth.withColumn(
            "kmv_estimate",
            F.when(
                F.col("exact_distinct") < _KMV_K, F.col("exact_distinct")
            )
            .otherwise(
                F.expr(f"CAST(CAST({_KMV_K - 1} AS {_DEC}) * {_H48} DIV hk AS BIGINT)")
            )
            .cast("bigint"),
        )
    )
    return est.select(
        "arm",
        F.lit(_KMV_K).cast("int").alias("k"),
        "exact_distinct",
        "kmv_estimate",
        F.expr(
            "CAST((1000000 * abs(kmv_estimate - exact_distinct))"
            " DIV exact_distinct AS BIGINT)"
        ).alias("abs_err_ppm"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# Wasserstein-1 (earth mover's) distance between two price distributions.
# ---------------------------------------------------------------------------
@register(
    "wasserstein_price_gap",
    """
    WITH arms AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    spine AS (
      SELECT v, CAST(count(*) AS HUGEINT) AS c,
             CAST(sum(arm) AS HUGEINT) AS c1
      FROM arms GROUP BY v),
    cum AS (
      SELECT v, row_number() OVER (ORDER BY v) AS r,
             sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a,
             sum(c - c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b
      FROM spine),
    tot AS (
      SELECT CAST(sum(c1) AS HUGEINT) AS n, CAST(sum(c - c1) AS HUGEINT) AS m
      FROM spine),
    terms AS (
      SELECT CAST(sum(CAST(nx.v - cu.v AS HUGEINT)
                      * abs(cu.a * t.m - cu.b * t.n)) AS HUGEINT) AS num
      FROM cum cu JOIN cum nx ON nx.r = cu.r + 1 CROSS JOIN tot t)
    SELECT CAST(t.n AS BIGINT) AS n_urgent,
           CAST(t.m AS BIGINT) AS n_low,
           CAST(terms.num // (t.n * t.m) AS BIGINT) AS w1_cents_floor,
           round(CAST(terms.num AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.m AS DOUBLE)) / 100.0, 6)
             AS w1_dollars
    FROM terms CROSS JOIN tot t
    """,
    tags=("stats", "distance", "exact-arith"),
)
def q_wasserstein_price_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 between URGENT and LOW order-total distributions: the area
    between the two EDFs, computed exactly on the distinct-cent spine as
    sum((v_next - v) * |A*m - B*n|) / (n*m). Spine cumulative counts and
    ranks come from the two-level rank plan; v_next is the rank
    equi-join (r+1), not lead() over a single task. The last spine row
    self-cancels (A*m = B*n there) and is dropped by the inner join."""
    orders = read_table(spark, sf_dir, "orders")
    arms = orders.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    spine = arms.groupBy("v").agg(
        F.count(F.lit(1)).cast(_DEC).alias("c"),
        F.sum("arm").cast(_DEC).alias("c1"),
    ).withColumn("c0", F.col("c") - F.col("c1"))
    cum = with_global_rank(
        spine, "v", [F.col("v")], rank_col="r", prefix_sum={"a": "c1", "b": "c0"},
        bucket_bits=16,  # cent domain (r13)
    ).select("v", "r", F.col("a").cast(_DEC).alias("a"), F.col("b").cast(_DEC).alias("b"))
    tot = spine.agg(
        F.sum("c1").cast(_DEC).alias("n"), F.sum("c0").cast(_DEC).alias("m")
    )
    nxt = cum.select((F.col("r") - 1).alias("r"), F.col("v").alias("v_next"))
    terms = (
        cum.join(nxt, "r")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("v_next") - F.col("v")).cast(_DEC)
                * F.abs(F.col("a") * F.col("m") - F.col("b") * F.col("n"))
            )
            .cast(_DEC)
            .alias("num"),
            F.max("n").alias("n"),
            F.max("m").alias("m"),
        )
    )
    return terms.select(
        F.col("n").cast("bigint").alias("n_urgent"),
        F.col("m").cast("bigint").alias("n_low"),
        F.expr(f"CAST(num DIV (n * m) AS BIGINT)").alias("w1_cents_floor"),
        F.round(
            F.col("num").cast("double")
            / (F.col("n").cast("double") * F.col("m").cast("double"))
            / 100.0,
            6,
        ).alias("w1_dollars"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily revenue series.
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_trend",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM d a JOIN d b ON a.dt < b.dt),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)), 0)
                  AS HUGEINT) AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY x) g
      WHERE t > 1)
    SELECT nn.n AS n_days, s.s_stat,
           CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) * (2 * nn.n + 5)
                - ties.tie_term AS BIGINT) AS var_s_x18,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                        / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2 * nn.n + 5)
                                - CAST(ties.tie_term AS DOUBLE)) / 18.0)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                        / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2 * nn.n + 5)
                                - CAST(ties.tie_term AS DOUBLE)) / 18.0)
                      ELSE 0.0 END, 6) AS z_score
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
    tags=("stats", "trend", "nonparametric"),
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is daily revenue monotonically trending? S sums pair signs over
    the calendar-bounded |days|^2 broadcast pair join (~2.9M pairs at
    full calendar, constant in SF -- the kendall_tau_daily shape);
    Var(S) keeps the tie correction as the exact integer 18*Var. The
    continuity-corrected z closes in one sqrt."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    a, b = d.alias("a"), d.alias("b")
    s = a.join(F.broadcast(b), F.col("a.dt") < F.col("b.dt")).agg(
        F.sum(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t").cast(_DEC)
                    * (F.col("t") - 1).cast(_DEC)
                    * (2 * F.col("t") + 5).cast(_DEC)
                ),
                F.lit(0).cast(_DEC),
            )
            .cast(_DEC)
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    var_d = (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term").cast("double")) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_d))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_d))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        (
            F.col("n").cast(_DEC)
            * (F.col("n") - 1).cast(_DEC)
            * (2 * F.col("n") + 5).cast(_DEC)
            - F.col("tie_term")
        )
        .cast("bigint")
        .alias("var_s_x18"),
        F.round(z, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Pettitt changepoint test (rank-based single shift locator).
# ---------------------------------------------------------------------------
@register(
    "pettitt_changepoint",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    spine AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY x),
    dr AS (
      SELECT x,
             2 * coalesce(sum(c) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1
               AS d2  -- doubled average rank: exact integer under ties
      FROM spine),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    u AS (
      SELECT d.dt,
             CAST(row_number() OVER (ORDER BY d.dt) AS BIGINT) AS t,
             sum(dr.d2) OVER (ORDER BY d.dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre2
      FROM d JOIN dr ON d.x = dr.x),
    ut AS (
      SELECT u.dt, u.t, CAST(u.pre2 - u.t * (nn.n + 1) AS BIGINT) AS u2
      FROM u CROSS JOIN nn WHERE u.t < nn.n)
    SELECT ut.dt AS changepoint_date,
           CAST(abs(ut.u2) AS BIGINT) AS k2_stat,
           nn.n AS n_days,
           round(2 * exp(-6.0 * (CAST(abs(ut.u2) AS DOUBLE) / 2)
                               * (CAST(abs(ut.u2) AS DOUBLE) / 2)
                         / (CAST(nn.n AS DOUBLE) * nn.n * nn.n
                            + CAST(nn.n AS DOUBLE) * nn.n)), 6) AS p_approx
    FROM ut CROSS JOIN nn
    ORDER BY abs(ut.u2) DESC, ut.dt LIMIT 1
    """,
    tags=("stats", "changepoint", "nonparametric"),
)
def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does the daily revenue distribution shift? U_t compares
    ranks before/after each candidate day; doubled average ranks (the
    mann_whitney spine trick) keep ties exact, so U2_t = prefix(d2) -
    t*(n+1) is an exact integer and K = max|U2|/2. Both windows run
    over the ~|days| daily series (CALENDAR growth class); the argmax
    is an ordered LIMIT 1 with the date as tiebreak."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    spine = d.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    dr = spine.select(
        "x",
        (
            2 * F.coalesce(F.sum("c").over(wv), F.lit(0)) + F.col("c") + 1
        ).alias("d2"),
    )
    nn = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wd = Window.orderBy("dt")
    u = d.join(dr, "x").select(
        "dt",
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.sum("d2").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("pre2"),
    )
    ut = u.crossJoin(F.broadcast(nn)).where(F.col("t") < F.col("n")).select(
        "dt",
        (F.col("pre2") - F.col("t") * (F.col("n") + 1)).cast("bigint").alias("u2"),
        "n",
    )
    k2 = F.abs(F.col("u2")).cast("double") / 2
    nd = F.col("n").cast("double")
    p = 2 * F.exp(-6.0 * k2 * k2 / (nd * nd * nd + nd * nd))
    return (
        ut.select(
            F.col("dt").alias("changepoint_date"),
            F.abs(F.col("u2")).cast("bigint").alias("k2_stat"),
            F.col("n").alias("n_days"),
            F.round(p, 6).alias("p_approx"),
        )
        .orderBy(F.col("k2_stat").desc(), "changepoint_date")
        .limit(1)
    )
