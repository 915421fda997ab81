"""Extension batch 73: variance changepoint scan, token trend slopes,
and rank-biased overlap.

Scale notes (the 100 TB story per query):
- variance_changepoint_scan: where does daily revenue VOLATILITY (not
  the mean -- that's pettitt/cusum) shift? For every interior split of
  the daily series, the population variances of the two segments close
  over exact prefix sums of cents and cents^2 (HUGEINT); the reported
  split maximizes |ln(var_after / var_before)| with a 30-day minimum
  segment. Windows run over the CALENDAR daily series; the argmax is
  an ordered LIMIT with the date as tiebreak.
- token_trend_slopes: which vocabulary is rising or falling across
  the source axis? Per-token ppm share per source (integer), densified
  over the full 20-source grid (absent = 0 -- a sparse-only fit would
  overstate stability), per-token closed-form OLS slope from EXACT
  integer sums (x = source index 0..19, y = ppm), top-20 movers by
  |slope| with the token as tiebreak. One explode + two groupBys +
  a broadcast source-grid densify join.
- rank_biased_overlap: how similar are the 1996 and 1997 top-50
  revenue part rankings? X_d = overlap of the depth-d prefixes
  (exact integers via max(rank_a, rank_b) <= d over the constant
  50-row depth grid); average overlap AO = mean X_d/d and truncated
  RBO (p = 0.9) with per-depth terms rounded to e12 integers before
  the order-free sum. Both rankings are TakeOrderedAndProject top-50s;
  every later step is constant-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_VAR_MIN_SEG = 30
_RBO_P = 0.9
_RBO_K = 50


# ---------------------------------------------------------------------------
# Variance changepoint scan on the daily revenue series.
# ---------------------------------------------------------------------------
@register(
    "variance_changepoint_scan",
    f"""
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    pre AS (
      SELECT dt,
             CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t,
             sum(CAST(x AS HUGEINT)) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
             sum(CAST(x AS HUGEINT) * x) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
      FROM d),
    tot AS (
      SELECT CAST(max(t) AS BIGINT) AS n, max(s1) AS ts1, max(s2) AS ts2
      FROM pre),
    scan AS (
      SELECT p.dt, p.t,
             (CAST(p.t AS DOUBLE) * p.s2 - CAST(p.s1 AS DOUBLE) * p.s1)
               / (CAST(p.t AS DOUBLE) * p.t) AS var_b,
             (CAST(tt.n - p.t AS DOUBLE) * (tt.ts2 - p.s2)
              - CAST(tt.ts1 - p.s1 AS DOUBLE) * (tt.ts1 - p.s1))
               / (CAST(tt.n - p.t AS DOUBLE) * (tt.n - p.t)) AS var_a
      FROM pre p CROSS JOIN tot tt
      WHERE p.t >= {_VAR_MIN_SEG} AND p.t <= tt.n - {_VAR_MIN_SEG}),
    scored AS (
      SELECT dt, t, var_b, var_a,
             abs(ln(var_a / var_b)) AS score
      FROM scan WHERE var_b > 0 AND var_a > 0)
    SELECT strftime(dt, '%Y-%m-%d') AS split_date,
           CAST(t AS BIGINT) AS n_days_before,
           round(sqrt(var_b) / 100.0, 4) AS sd_before_dollars,
           round(sqrt(var_a) / 100.0, 4) AS sd_after_dollars,
           round(score, 6) AS abs_log_var_ratio
    FROM scored ORDER BY score DESC, dt LIMIT 1
    """,
    tags=("timeseries", "changepoint", "exact-arith"),
)
def q_variance_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest volatility shift in daily revenue: per interior split
    (>= 30 days each side), segment population variances close over
    exact HUGEINT prefix sums, score = |ln variance ratio|, argmax via
    ordered LIMIT with the date tiebreak. The mean-shift detectors
    (pettitt, page_hinkley, cusum) are blind to this; a variance break
    is what risk monitoring actually alarms on."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    wd = Window.orderBy("dt")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    pre = d.select(
        "dt",
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.sum(F.col("x").cast(_DEC)).over(wcum).alias("s1"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).over(wcum).alias("s2"),
    )
    tot = pre.agg(
        F.max("t").cast("bigint").alias("n"),
        F.max("s1").alias("ts1"),
        F.max("s2").alias("ts2"),
    )
    td = F.col("t").cast("double")
    na = (F.col("n") - F.col("t")).cast("double")
    var_b = (td * F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double")) / (td * td)
    var_a = (
        na * (F.col("ts2") - F.col("s2")).cast("double")
        - (F.col("ts1") - F.col("s1")).cast("double") * (F.col("ts1") - F.col("s1")).cast("double")
    ) / (na * na)
    scan = (
        pre.crossJoin(F.broadcast(tot))
        .where((F.col("t") >= _VAR_MIN_SEG) & (F.col("t") <= F.col("n") - _VAR_MIN_SEG))
        .select("dt", "t", var_b.alias("var_b"), var_a.alias("var_a"))
        .where((F.col("var_b") > 0) & (F.col("var_a") > 0))
        .withColumn("score", F.abs(F.log(F.col("var_a") / F.col("var_b"))))
    )
    return (
        scan.orderBy(F.col("score").desc(), "dt")
        .limit(1)
        .select(
            F.date_format("dt", "yyyy-MM-dd").alias("split_date"),
            F.col("t").alias("n_days_before"),
            F.round(F.sqrt("var_b") / 100.0, 4).alias("sd_before_dollars"),
            F.round(F.sqrt("var_a") / 100.0, 4).alias("sd_after_dollars"),
            F.round("score", 6).alias("abs_log_var_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Token trend slopes across the source axis.
# ---------------------------------------------------------------------------
@register(
    "token_trend_slopes",
    """
    WITH toks AS (
      SELECT CAST(substr(source, 4) AS BIGINT) AS si,
             unnest(string_split(text, ' ')) AS tok
      FROM documents),
    per_src AS (
      SELECT si, CAST(count(*) AS BIGINT) AS n_src FROM toks GROUP BY si),
    counts AS (
      SELECT tok, si, CAST(count(*) AS BIGINT) AS c FROM toks
      GROUP BY tok, si),
    keep AS (
      SELECT tok FROM counts GROUP BY tok HAVING sum(c) >= 20),
    dense AS (
      SELECT k.tok, s.si,
             CAST((1000000 * coalesce(c.c, 0)) // s.n_src AS BIGINT) AS ppm
      FROM keep k CROSS JOIN per_src s
      LEFT JOIN counts c ON c.tok = k.tok AND c.si = s.si),
    fits AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(si) AS HUGEINT) AS sx,
             CAST(sum(ppm) AS HUGEINT) AS sy,
             CAST(sum(CAST(si AS HUGEINT) * ppm) AS HUGEINT) AS sxy,
             CAST(sum(CAST(si AS HUGEINT) * si) AS HUGEINT) AS sxx
      FROM dense GROUP BY tok),
    slopes AS (
      SELECT tok,
             CAST(sy AS BIGINT) AS total_ppm_mass,
             round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(k AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               AS slope_ppm_per_src
      FROM fits)
    SELECT tok AS token, total_ppm_mass, slope_ppm_per_src
    FROM slopes
    ORDER BY abs(slope_ppm_per_src) DESC, tok LIMIT 20
    """,
    tags=("text", "trend", "exact-arith"),
)
def q_token_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which tokens rise or fall across the source axis (src0..src19 as
    the pseudo-time dimension of this synthetic corpus)? Per-token ppm
    share per source as exact integers, DENSIFIED over the full source
    grid (a token absent from a source counts as 0 -- sparse-only fits
    overstate stability), closed-form OLS slope from exact integer
    sums, top-20 movers via TakeOrderedAndProject with the token as
    tiebreak."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.substring("source", 4, 10).cast("bigint").alias("si"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    per_src = toks.groupBy("si").agg(F.count(F.lit(1)).cast("bigint").alias("n_src"))
    counts = toks.groupBy("tok", "si").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    keep = counts.groupBy("tok").agg(F.sum("c").alias("tot")).where(
        F.col("tot") >= 20
    ).select("tok")
    dense = (
        keep.crossJoin(F.broadcast(per_src))
        .join(counts, ["tok", "si"], "left")
        .select(
            "tok",
            "si",
            F.expr("CAST((1000000 * coalesce(c, 0)) DIV n_src AS BIGINT)").alias("ppm"),
        )
    )
    fits = dense.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("si").cast(_DEC).alias("sx"),
        F.sum("ppm").cast(_DEC).alias("sy"),
        F.sum(F.col("si").cast(_DEC) * F.col("ppm").cast(_DEC)).cast(_DEC).alias("sxy"),
        F.sum(F.col("si").cast(_DEC) * F.col("si").cast(_DEC)).cast(_DEC).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    slope = (
        kd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (kd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    return (
        fits.select(
            F.col("tok").alias("token"),
            F.col("sy").cast("bigint").alias("total_ppm_mass"),
            F.round(slope, 6).alias("slope_ppm_per_src"),
        )
        .orderBy(F.abs(F.col("slope_ppm_per_src")).desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Rank-biased overlap between the 1996 and 1997 top-50 part rankings.
# ---------------------------------------------------------------------------
def _year_top_sql(year: int, alias: str) -> str:
    return f"""
    {alias} AS (
      SELECT pk, CAST(row_number() OVER (ORDER BY rev DESC, pk) AS BIGINT) AS r
      FROM (
        SELECT l.l_partkey AS pk,
               CAST(sum(round(l.l_extendedprice * 100, 0)) AS BIGINT) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE date_part('year', o.o_orderdate) = {year}
        GROUP BY l.l_partkey
        ORDER BY rev DESC, pk LIMIT {_RBO_K}) t)"""


@register(
    "rank_biased_overlap",
    f"""
    WITH {_year_top_sql(1996, "ra")},
    {_year_top_sql(1997, "rb")},
    both_lists AS (
      SELECT ra.pk, greatest(ra.r, rb.r) AS mr
      FROM ra JOIN rb ON ra.pk = rb.pk),
    depth AS (SELECT unnest(range(1, {_RBO_K + 1})) AS d),
    xd AS (
      SELECT d.d,
             CAST(count(b.pk) AS BIGINT) AS x
      FROM depth d LEFT JOIN both_lists b ON b.mr <= d.d
      GROUP BY d.d),
    terms AS (
      SELECT d, x,
             CAST(round(1e12 * (1 - {_RBO_P}) * pow({_RBO_P}, d - 1)
                        * x / d, 0) AS BIGINT) AS rbo_e12,
             CAST(round(1e12 * CAST(x AS DOUBLE) / d / {_RBO_K}, 0) AS BIGINT)
               AS ao_e12
      FROM xd)
    SELECT CAST({_RBO_K} AS INTEGER) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM both_lists) AS n_common,
           round(CAST(sum(rbo_e12) AS DOUBLE) / 1e12, 6) AS rbo_truncated,
           round(CAST(sum(ao_e12) AS DOUBLE) / 1e12, 6) AS average_overlap
    FROM terms
    """,
    tags=("ranking", "ir-metric", "exact-arith"),
)
def q_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How stable is the top-50 part revenue ranking year over year?
    X_d = |prefix_d(1996) intersect prefix_d(1997)| from
    max(rank_a, rank_b) <= d over the constant depth grid; truncated
    RBO (p = 0.9, no extrapolation) and average overlap close with
    per-depth terms rounded to e12 integers (order-free sums). Both
    rankings are TakeOrderedAndProject top-50s; everything downstream
    is constant-size."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")

    def year_top(year: int, rcol: str) -> DataFrame:
        rev = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.year("o_orderdate") == year)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0)).cast("bigint").alias("rev")
            )
            .orderBy(F.col("rev").desc(), "pk")
            .limit(_RBO_K)
        )
        w = Window.orderBy(F.col("rev").desc(), "pk")
        return rev.select("pk", F.row_number().over(w).cast("bigint").alias(rcol))

    both = year_top(1996, "ra").join(year_top(1997, "rb"), "pk").select(
        "pk", F.greatest("ra", "rb").alias("mr")
    )
    depth = li.sparkSession.range(1, _RBO_K + 1).select(F.col("id").alias("d"))
    xd = (
        depth.join(F.broadcast(both), F.col("mr") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("pk").cast("bigint").alias("x"))
    )
    terms = xd.select(
        F.round(
            F.lit(1e12)
            * (1 - _RBO_P)
            * F.pow(F.lit(_RBO_P), F.col("d") - 1)
            * F.col("x")
            / F.col("d"),
            0,
        )
        .cast("bigint")
        .alias("rbo_e12"),
        F.round(F.lit(1e12) * F.col("x").cast("double") / F.col("d") / _RBO_K, 0)
        .cast("bigint")
        .alias("ao_e12"),
    )
    n_common = both.agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    return terms.agg(
        F.round(F.sum("rbo_e12").cast("double") / 1e12, 6).alias("rbo_truncated"),
        F.round(F.sum("ao_e12").cast("double") / 1e12, 6).alias("average_overlap"),
    ).crossJoin(F.broadcast(n_common)).select(
        F.lit(_RBO_K).cast("int").alias("k"),
        "n_common",
        "rbo_truncated",
        "average_overlap",
    )
