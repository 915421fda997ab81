"""Extension batch 125 (round 6): shrinkage and stratified inference --
James-Stein (Efron-Morris) shrunk nation means, the Mantel-Haenszel
pooled odds ratio with the CMH test, and Yuen's trimmed-mean t test.

Scale notes (the 100 TB story):
- james_stein_means: per-nation exact integer moments -> one 1-row
  broadcast of (grand mean, S, pooled variance) -> shrunk estimates
  map-side. Shrinkage is THE answer to noisy small-group dashboards.
- mantel_haenszel_pooled: one conditional aggregation to the 25
  nation-stratum 2x2 cells; every MH term is a rational of exact
  integers, e9-rounded before the stratum sum (order-free).
- yuen_trimmed_t: per-segment trimmed means/winsorized variances from
  the grouped cent spine -- the rank-window overlap (how many of a
  value's copies fall inside [g+1, n-g]) is exact integer arithmetic
  off the grouped prefix, so heavy tails are clipped without any
  per-row sort."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_TRIM = 0.1  # Yuen trim fraction per tail


@register(
    "james_stein_means",
    """
    WITH vals AS (
      SELECT c.c_nationkey AS nation,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    per AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS ss
      FROM vals GROUP BY nation),
    gl AS (
      SELECT CAST(count(*) AS BIGINT) AS a,
             CAST(sum(n) AS BIGINT) AS ntot,
             sum(CAST(s AS DOUBLE) / n) / count(*) AS mbar,
             sum(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS sse,
             sum(1.0 / n) AS sinv
      FROM per),
    sh AS (
      SELECT p.nation, p.n,
             CAST(p.s AS DOUBLE) / p.n AS m_i,
             g.mbar, g.a,
             (g.sse / (g.ntot - g.a)) * (g.sinv / g.a) AS vbar,
             (SELECT sum((CAST(q.s AS DOUBLE) / q.n - g.mbar)
                         * (CAST(q.s AS DOUBLE) / q.n - g.mbar))
              FROM per q) AS bigs
      FROM per p CROSS JOIN gl g)
    SELECT nation, n,
           round(m_i / 100, 6) AS raw_mean_dollars,
           round(greatest(0.0, 1 - (a - 3) * vbar / bigs), 6)
             AS shrink_factor,
           round((mbar + greatest(0.0, 1 - (a - 3) * vbar / bigs)
                         * (m_i - mbar)) / 100, 6) AS js_mean_dollars
    FROM sh
    """,
    tags=("stats", "shrinkage", "exact-arith"),
)
def q_james_stein_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive-part James-Stein (Efron-Morris) shrinkage of per-nation
    mean order values toward the grand mean of nation means:
    theta_i = mbar + max(0, 1 - (a-3)*vbar/S) * (m_i - mbar), with
    vbar = pooled within-nation variance * mean(1/n_i) (the average
    sampling variance of a nation mean) and S = sum (m_i - mbar)^2.
    Dominates the raw means in total squared error for a >= 4 groups
    -- the estimator every per-segment dashboard should be showing.
    Per-nation moments are exact integers; the sampling-variance and
    S scalars broadcast once."""
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    vals = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
    )
    per = vals.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast(_DEC).alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v")).cast(_DEC).alias("ss"),
    )
    m_i = F.col("s").cast("double") / F.col("n")
    gl = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("a"),
        F.sum("n").cast("bigint").alias("ntot"),
        (F.sum(m_i) / F.count(F.lit(1))).alias("mbar"),
        F.sum(
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
        ).alias("sse"),
        F.sum(F.lit(1.0) / F.col("n")).alias("sinv"),
    )
    bigs = per.crossJoin(F.broadcast(gl.select("mbar"))).agg(
        F.sum((m_i - F.col("mbar")) * (m_i - F.col("mbar"))).alias("bigs")
    )
    sh = per.crossJoin(F.broadcast(gl)).crossJoin(F.broadcast(bigs))
    vbar = (F.col("sse") / (F.col("ntot") - F.col("a"))) * (
        F.col("sinv") / F.col("a")
    )
    factor = F.greatest(
        F.lit(0.0), 1 - (F.col("a") - 3) * vbar / F.col("bigs")
    )
    return sh.select(
        "nation",
        "n",
        F.round(m_i / 100, 6).alias("raw_mean_dollars"),
        F.round(factor, 6).alias("shrink_factor"),
        F.round((F.col("mbar") + factor * (m_i - F.col("mbar"))) / 100, 6).alias(
            "js_mean_dollars"
        ),
    )


@register(
    "mantel_haenszel_pooled",
    """
    WITH strata AS (
      SELECT c.c_nationkey AS nation,
             CASE WHEN c.c_mktsegment IN ('BUILDING', 'MACHINERY')
                  THEN 1 ELSE 0 END AS exposed,
             CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END AS outcome
      FROM customer c),
    cells AS (
      SELECT nation,
             CAST(sum(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(sum(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM strata GROUP BY nation),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(CAST(round(1000000000.0 * a * d / (a + b + c + d), 0)
                  AS HUGEINT)) AS HUGEINT) AS num_e9,
             CAST(sum(CAST(round(1000000000.0 * b * c / (a + b + c + d), 0)
                  AS HUGEINT)) AS HUGEINT) AS den_e9,
             CAST(sum(a) AS BIGINT) AS sum_a,
             CAST(sum(CAST(round(1000000000.0 * (a + b) * (a + c)
                    / (a + b + c + d), 0) AS HUGEINT)) AS HUGEINT) AS e_e9,
             CAST(sum(CAST(round(1000000000.0
                    * (a + b) * (c + d) * (a + c) * (b + d)
                    / (CAST(a + b + c + d AS DOUBLE)
                       * (a + b + c + d) * (a + b + c + d - 1)), 0)
                  AS HUGEINT)) AS HUGEINT) AS v_e9
      FROM cells)
    SELECT n_strata, sum_a,
           round(CAST(num_e9 AS DOUBLE) / den_e9, 6) AS or_mh,
           round((abs(sum_a - CAST(e_e9 AS DOUBLE) / 1000000000.0) - 0.5)
                 * (abs(sum_a - CAST(e_e9 AS DOUBLE) / 1000000000.0) - 0.5)
                 / (CAST(v_e9 AS DOUBLE) / 1000000000.0), 6) AS cmh_stat
    FROM terms
    """,
    tags=("stats", "epidemiology", "stratified"),
)
def q_mantel_haenszel_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across nation strata (exposure
    = heavy-industry segment, outcome = high balance):
    OR_MH = sum(a_i d_i / n_i) / sum(b_i c_i / n_i), plus the
    continuity-corrected CMH chi-square from exact expectations and
    hypergeometric variances. Pooling per-stratum keeps Simpson's
    paradox out of the estimate -- the stratified complement to
    odds_ratio_screen's crude 2x2. Every per-stratum rational rounds
    to an e9 integer before the order-free sum."""
    cust = read_table(spark, sf_dir, "customer")
    strata = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.when(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), 1)
        .otherwise(0)
        .alias("exposed"),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("outcome"),
    )

    def cell(e, o):
        return F.sum(
            F.when((F.col("exposed") == e) & (F.col("outcome") == o), 1).otherwise(
                0
            )
        ).cast("bigint")

    cells = strata.groupBy("nation").agg(
        cell(1, 1).alias("a"), cell(1, 0).alias("b"),
        cell(0, 1).alias("c"), cell(0, 0).alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    nt = a + b + c + d

    def e9(expr):
        return F.sum(F.round(F.lit(1000000000.0) * expr, 0).cast(_DEC)).cast(_DEC)

    terms = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        e9(a * d / nt).alias("num_e9"),
        e9(b * c / nt).alias("den_e9"),
        F.sum(a).cast("bigint").alias("sum_a"),
        e9((a + b) * (a + c) / nt).alias("e_e9"),
        e9(
            (a + b) * (c + d) * (a + c) * (b + d)
            / (nt.cast("double") * nt * (nt - 1))
        ).alias("v_e9"),
    )
    dev = F.abs(
        F.col("sum_a") - F.col("e_e9").cast("double") / 1000000000.0
    )
    return terms.select(
        "n_strata",
        "sum_a",
        F.round(
            F.col("num_e9").cast("double") / F.col("den_e9").cast("double"), 6
        ).alias("or_mh"),
        F.round(
            (dev - 0.5) * (dev - 0.5)
            / (F.col("v_e9").cast("double") / 1000000000.0),
            6,
        ).alias("cmh_stat"),
    )


@register(
    "yuen_trimmed_t",
    f"""
    WITH vals AS (
      SELECT CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END AS arm,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v
      FROM customer WHERE c_mktsegment IN ('HOUSEHOLD', 'FURNITURE')),
    spine AS (
      SELECT arm, v, CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY arm, v),
    pre AS (
      SELECT arm, v, c,
             sum(c) OVER (PARTITION BY arm ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    tot AS (
      SELECT arm, CAST(sum(c) AS BIGINT) AS n,
             CAST(floor({_TRIM} * sum(c)) AS BIGINT) AS g
      FROM spine GROUP BY arm),
    cuts AS (
      SELECT t.arm, t.n, t.g,
             (SELECT min(v) FROM pre p WHERE p.arm = t.arm
              AND p.cc >= t.g + 1) AS lo,
             (SELECT min(v) FROM pre p WHERE p.arm = t.arm
              AND p.cc >= t.n - t.g) AS hi
      FROM tot t),
    win AS (
      SELECT p.arm, k.n, k.g,
             CAST(sum(greatest(0, least(p.cc, k.n - k.g)
                               - greatest(p.cc - p.c + 1, k.g + 1) + 1)
                      * p.v) AS HUGEINT) AS tsum,
             CAST(sum(CASE WHEN p.v < k.lo THEN p.c * k.lo
                           WHEN p.v > k.hi THEN p.c * k.hi
                           ELSE p.c * p.v END) AS HUGEINT) AS wsum,
             CAST(sum(CASE WHEN p.v < k.lo
                             THEN p.c * (CAST(k.lo AS HUGEINT) * k.lo)
                           WHEN p.v > k.hi
                             THEN p.c * (CAST(k.hi AS HUGEINT) * k.hi)
                           ELSE p.c * (CAST(p.v AS HUGEINT) * p.v)
                      END) AS HUGEINT) AS wss
      FROM pre p JOIN cuts k ON k.arm = p.arm
      GROUP BY p.arm, k.n, k.g),
    st AS (
      SELECT arm, n, g, n - 2 * g AS h,
             CAST(tsum AS DOUBLE) / (n - 2 * g) AS tmean,
             (CAST(wss AS DOUBLE) - CAST(wsum AS DOUBLE) * wsum / n) / (n - 1)
               AS wvar
      FROM win)
    SELECT a.n AS n_house, b.n AS n_furn,
           round(a.tmean / 100, 6) AS trimmed_mean_house,
           round(b.tmean / 100, 6) AS trimmed_mean_furn,
           round((a.tmean - b.tmean)
                 / sqrt((a.n - 1) * a.wvar / (CAST(a.h AS DOUBLE) * (a.h - 1))
                        + (b.n - 1) * b.wvar
                          / (CAST(b.h AS DOUBLE) * (b.h - 1))), 6)
             AS yuen_t
    FROM st a CROSS JOIN st b WHERE a.arm = 1 AND b.arm = 0
    """,
    tags=("stats", "robust", "exact-arith"),
)
def q_yuen_trimmed_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-mean t (10% per tail) for HOUSEHOLD vs FURNITURE
    balances: trimmed means from exact rank-window overlaps on the
    grouped cent spine, winsorized variances from integer clamp sums,
    t = (tm1 - tm0)/sqrt(d1 + d0) with d_i = (n_i-1) s_wi^2 /
    (h_i (h_i - 1)). The robust two-sample test that ignores the 20%
    tail mass ordinary t is hostage to. All order statistics ride the
    grouped prefix -- no per-row sort."""
    cust = read_table(spark, sf_dir, "customer")
    vals = cust.where(
        F.col("c_mktsegment").isin("HOUSEHOLD", "FURNITURE")
    ).select(
        F.when(F.col("c_mktsegment") == "HOUSEHOLD", 1).otherwise(0).alias("arm"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("arm", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    pre = with_global_rank(
        spine, "v", [F.col("v")], prefix_sum={"cc": "c"}, partition_cols=["arm"]
    ).select("arm", "v", "c", "cc")
    tot = spine.groupBy("arm").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.floor(_TRIM * F.sum("c")).cast("bigint").alias("g"),
    )
    p2 = pre.join(tot, "arm")
    lo = (
        p2.where(F.col("cc") >= F.col("g") + 1)
        .groupBy("arm")
        .agg(F.min("v").alias("lo"))
    )
    hi = (
        p2.where(F.col("cc") >= F.col("n") - F.col("g"))
        .groupBy("arm")
        .agg(F.min("v").alias("hi"))
    )
    cuts = tot.join(lo, "arm").join(hi, "arm")
    j = pre.join(cuts, "arm")
    overlap = F.greatest(
        F.lit(0),
        F.least(F.col("cc"), F.col("n") - F.col("g"))
        - F.greatest(F.col("cc") - F.col("c") + 1, F.col("g") + 1)
        + 1,
    )
    wv = (
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
    )
    win = j.groupBy("arm", "n", "g").agg(
        F.sum(overlap * F.col("v")).cast(_DEC).alias("tsum"),
        F.sum(F.col("c") * wv).cast(_DEC).alias("wsum"),
        F.sum(F.col("c") * (wv.cast(_DEC) * wv)).cast(_DEC).alias("wss"),
    )
    st = win.select(
        "arm",
        "n",
        (F.col("n") - 2 * F.col("g")).alias("h"),
        (F.col("tsum").cast("double") / (F.col("n") - 2 * F.col("g"))).alias(
            "tmean"
        ),
        (
            (
                F.col("wss").cast("double")
                - F.col("wsum").cast("double")
                * F.col("wsum").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("wvar"),
    )
    a = st.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("h").alias("h1"),
        F.col("tmean").alias("tm1"), F.col("wvar").alias("wv1"),
    )
    b = st.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("h").alias("h0"),
        F.col("tmean").alias("tm0"), F.col("wvar").alias("wv0"),
    )
    jj = a.crossJoin(F.broadcast(b))
    d1 = (F.col("n1") - 1) * F.col("wv1") / (
        F.col("h1").cast("double") * (F.col("h1") - 1)
    )
    d0 = (F.col("n0") - 1) * F.col("wv0") / (
        F.col("h0").cast("double") * (F.col("h0") - 1)
    )
    return jj.select(
        F.col("n1").alias("n_house"),
        F.col("n0").alias("n_furn"),
        F.round(F.col("tm1") / 100, 6).alias("trimmed_mean_house"),
        F.round(F.col("tm0") / 100, 6).alias("trimmed_mean_furn"),
        F.round((F.col("tm1") - F.col("tm0")) / F.sqrt(d1 + d0), 6).alias(
            "yuen_t"
        ),
    )
