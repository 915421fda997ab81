"""Extension batch 75: regression diagnostics on the daily revenue
trend fit (Durbin-Watson, Jarque-Bera, Cook's distance, Breusch-Pagan).

A trend line over the daily series is only trustworthy if its
residuals behave; these four are the standard econometric checks. All
four share the same discipline:

- The OLS fit closes over EXACT integer sums (day index t, daily cents
  y, and their products in DECIMAL(38,0)/HUGEINT) -- the slope and
  intercept are then single double divisions with IDENTICAL expression
  shape in both engines, so the doubles are bit-equal.
- Residuals are immediately rounded to integers (whole dollars for the
  scale-invariant statistics, cents for Cook's SSE) via
  floor(x + 0.5), after which every sum is order-free exact integer
  arithmetic; only the final statistic divides in double.
- The day-index and lag windows run over the CALENDAR daily series
  (saturating domain -- the allowlisted family measured by
  tests/test_global_window_growth.py).

Scale note: one groupBy(day) shuffle + one bounded-series window pass
per query; the moment aggregate broadcasts back as a 1-row table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# Shared SQL: daily revenue cents + 1-based day index + exact OLS
# moment sums. b_num/b_den are exact integers; slope/intercept are the
# ONLY double divisions, with the same shape as the Spark side.
_DAILY_FIT_SQL = """
    d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate),
    idx AS (
      SELECT dt, y,
             CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t
      FROM d),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS HUGEINT) AS st,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
             CAST(sum(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
      FROM idx),
    fit AS (
      SELECT n, st, sy, stt, sty,
             CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b
      FROM mom),
    fit2 AS (
      SELECT *,
             (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM fit)
"""


def _daily_fit(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(idx, fit2) twins of the SQL CTEs above: idx = (dt, y, t), fit2 =
    1-row (n, st, sy, stt, sty, b, a) with exact integer moments and
    the identical double division shapes."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("y")
    )
    idx = d.select(
        "dt", "y", F.row_number().over(Window.orderBy("dt")).cast("bigint").alias("t")
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast(_DEC).alias("st"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(F.col("t").cast(_DEC) * F.col("t").cast(_DEC)).cast(_DEC).alias("stt"),
        F.sum(F.col("t").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("sty"),
    )
    nd = F.col("n").cast(_DEC)
    fit = mom.withColumn(
        "b",
        (nd * F.col("sty") - F.col("st") * F.col("sy")).cast("double")
        / (nd * F.col("stt") - F.col("st") * F.col("st")).cast("double"),
    )
    fit2 = fit.withColumn(
        "a",
        (F.col("sy").cast("double") - F.col("b") * F.col("st").cast("double"))
        / F.col("n").cast("double"),
    )
    return idx, fit2


def _resid_dollars() -> Column:
    """Whole-dollar integer residual floor(e/100 + 0.5) of the joined
    (idx x fit2) frame -- identical shape to the SQL mirror."""
    e = (
        F.col("y").cast("double")
        - F.col("a")
        - F.col("b") * F.col("t").cast("double")
    )
    return F.floor(e / 100.0 + 0.5).cast("bigint")


_RESID_DOLLARS_SQL = (
    "CAST(floor((CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE)) / 100.0 + 0.5)"
    " AS BIGINT)"
)


# ---------------------------------------------------------------------------
# Durbin-Watson serial-correlation statistic.
# ---------------------------------------------------------------------------
@register(
    "durbin_watson",
    f"""
    WITH {_DAILY_FIT_SQL},
    resid AS (
      SELECT i.dt, {_RESID_DOLLARS_SQL} AS ed
      FROM idx i CROSS JOIN fit2),
    lagged AS (
      SELECT ed, lag(ed) OVER (ORDER BY dt) AS ep
      FROM resid),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(ed AS HUGEINT) * ed) AS HUGEINT) AS see,
             CAST(sum(CASE WHEN ep IS NULL THEN 0
                           ELSE CAST(ed - ep AS HUGEINT) * (ed - ep) END)
                  AS HUGEINT) AS sdd
      FROM lagged)
    SELECT n AS n_days,
           round(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6) AS dw_stat,
           round(1.0 - CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) / 2.0, 6) + 0.0
             AS rho_hat
    FROM sums
    """,
    tags=("diagnostics", "timeseries", "exact-arith"),
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the daily-revenue-on-time OLS
    residuals: DW = sum((e_t - e_{t-1})^2) / sum(e_t^2) over
    whole-dollar integer residuals (scale-invariant, so the rounding
    is harmless and makes both sums exact order-free integers);
    rho_hat = 1 - DW/2 is the implied lag-1 autocorrelation. DW ~ 2
    means the trend line left no serial structure behind."""
    idx, fit2 = _daily_fit(spark, sf_dir)
    resid = idx.crossJoin(F.broadcast(fit2)).select("dt", _resid_dollars().alias("ed"))
    lagged = resid.select(
        "ed", F.lag("ed").over(Window.orderBy("dt")).alias("ep")
    )
    dd = (F.col("ed") - F.col("ep")).cast(_DEC)
    sums = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ed").cast(_DEC) * F.col("ed").cast(_DEC)).cast(_DEC).alias("see"),
        F.sum(
            F.when(F.col("ep").isNull(), F.lit(0).cast(_DEC)).otherwise(dd * dd)
        ).cast(_DEC).alias("sdd"),
    )
    ratio = F.col("sdd").cast("double") / F.col("see").cast("double")
    return sums.select(
        F.col("n").alias("n_days"),
        F.round(ratio, 6).alias("dw_stat"),
        (F.round(F.lit(1.0) - ratio / 2.0, 6) + 0.0).alias("rho_hat"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test on daily revenue.
# ---------------------------------------------------------------------------
@register(
    "jarque_bera",
    """
    WITH d AS (
      SELECT CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS HUGEINT) AS s1,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2,
             CAST(sum(CAST(y AS HUGEINT) * y * y) AS HUGEINT) AS s3,
             CAST(sum(CAST(y AS HUGEINT) * y * y * y) AS HUGEINT) AS s4
      FROM d),
    c AS (
      SELECT CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM mom),
    cm AS (
      SELECT nd,
             r2 - m1 * m1 AS m2,
             r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                - 3.0 * m1 * m1 * m1 * m1 AS m4
      FROM c),
    st AS (
      SELECT nd,
             m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) - 3.0 AS exkurt
      FROM cm)
    SELECT CAST(nd AS BIGINT) AS n_days,
           round(skew, 6) + 0.0 AS skewness,
           round(exkurt, 6) + 0.0 AS excess_kurtosis,
           round(nd / 6.0 * (skew * skew + exkurt * exkurt / 4.0), 4) AS jb_stat
    FROM st
    """,
    tags=("diagnostics", "distribution", "exact-arith"),
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic of the daily revenue
    distribution (WHOLE DOLLARS -- the r10 sf0.1 sweep proved cents
    overflow even HUGEINT in sum(y^4): ~1.7e38 at sf0.1; dollar
    quantization is scale-invariant for skew/kurtosis up to the
    documented e-2 rounding of the daily level): population skewness
    and excess kurtosis close over exact integer power sums; JB = n/6
    (S^2 + K^2/4). sqrt(m2)*m2 replaces pow(m2, 1.5) because sqrt is
    correctly rounded in IEEE while libm pow differs by 1 ulp across
    engines. No window at all -- two aggregates."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.expr(
            "CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100"
        ).alias("y")
    )
    yd = F.col("y").cast(_DEC)
    mom = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast(_DEC).alias("s1"),
        F.sum(yd * yd).cast(_DEC).alias("s2"),
        F.sum(yd * yd * yd).cast(_DEC).alias("s3"),
        F.sum(yd * yd * yd * yd).cast(_DEC).alias("s4"),
    )
    nd = F.col("n").cast("double")
    c = mom.select(
        nd.alias("nd"),
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n")).alias("r2"),
        (F.col("s3").cast("double") / F.col("n")).alias("r3"),
        (F.col("s4").cast("double") / F.col("n")).alias("r4"),
    )
    m1 = F.col("m1")
    cm = c.select(
        "nd",
        (F.col("r2") - m1 * m1).alias("m2"),
        (F.col("r3") - 3.0 * m1 * F.col("r2") + 2.0 * m1 * m1 * m1).alias("m3"),
        (
            F.col("r4")
            - 4.0 * m1 * F.col("r3")
            + 6.0 * m1 * m1 * F.col("r2")
            - 3.0 * m1 * m1 * m1 * m1
        ).alias("m4"),
    )
    st = cm.select(
        "nd",
        (F.col("m3") / (F.col("m2") * F.sqrt("m2"))).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0).alias("exkurt"),
    )
    return st.select(
        F.col("nd").cast("bigint").alias("n_days"),
        (F.round("skew", 6) + 0.0).alias("skewness"),
        (F.round("exkurt", 6) + 0.0).alias("excess_kurtosis"),
        F.round(
            F.col("nd")
            / 6.0
            * (F.col("skew") * F.col("skew") + F.col("exkurt") * F.col("exkurt") / 4.0),
            4,
        ).alias("jb_stat"),
    )


# ---------------------------------------------------------------------------
# Cook's distance: most influential days of the trend fit.
# ---------------------------------------------------------------------------
@register(
    "cooks_distance_topk",
    f"""
    WITH {_DAILY_FIT_SQL},
    resid AS (
      SELECT i.dt, i.t,
             CAST(floor(CAST(y AS DOUBLE) - a - b * CAST(t AS DOUBLE) + 0.5)
                  AS BIGINT) AS ec,
             f.n, f.st, f.stt
      FROM idx i CROSS JOIN fit2 f),
    sse AS (
      SELECT CAST(sum(CAST(ec AS HUGEINT) * ec) AS HUGEINT) AS sse
      FROM resid),
    lev AS (
      SELECT r.dt, r.ec,
             1.0 / r.n
               + (CAST(r.t AS DOUBLE) - CAST(r.st AS DOUBLE) / r.n)
                 * (CAST(r.t AS DOUBLE) - CAST(r.st AS DOUBLE) / r.n)
                 / (CAST(r.stt AS DOUBLE)
                    - CAST(r.st AS DOUBLE) * r.st / r.n) AS h,
             CAST(s.sse AS DOUBLE) / (r.n - 2) AS s2
      FROM resid r CROSS JOIN sse s)
    SELECT strftime(dt, '%Y-%m-%d') AS dt,
           round(ec / 100.0, 2) + 0.0 AS residual_dollars,
           round(h, 6) AS leverage,
           round(CAST(ec AS DOUBLE) * ec * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)),
                 6) AS cooks_d
    FROM lev
    ORDER BY CAST(ec AS DOUBLE) * ec * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)) DESC,
             dt
    LIMIT 5
    """,
    tags=("diagnostics", "outlier", "exact-arith"),
)
def q_cooks_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five most influential days of the daily-revenue trend fit by
    Cook's distance D_i = e_i^2 h_i / (p s^2 (1-h_i)^2), p = 2:
    residuals rounded to integer CENTS so SSE is an exact order-free
    integer sum; leverage h_i closes over the broadcast exact moments.
    High-D days are where a single day drags the slope -- the
    fit-stability screen a revenue monitor wants."""
    idx, fit2 = _daily_fit(spark, sf_dir)
    e = (
        F.col("y").cast("double")
        - F.col("a")
        - F.col("b") * F.col("t").cast("double")
    )
    resid = idx.crossJoin(F.broadcast(fit2)).select(
        "dt",
        "t",
        F.floor(e + 0.5).cast("bigint").alias("ec"),
        "n",
        "st",
        "stt",
    )
    sse = resid.agg(
        F.sum(F.col("ec").cast(_DEC) * F.col("ec").cast(_DEC)).cast(_DEC).alias("sse")
    )
    tbar_dev = F.col("t").cast("double") - F.col("st").cast("double") / F.col("n")
    h = (
        F.lit(1.0) / F.col("n")
        + tbar_dev * tbar_dev
        / (
            F.col("stt").cast("double")
            - F.col("st").cast("double") * F.col("st") / F.col("n")
        )
    )
    lev = resid.crossJoin(F.broadcast(sse)).select(
        "dt",
        "ec",
        h.alias("h"),
        (F.col("sse").cast("double") / (F.col("n") - 2)).alias("s2"),
    )
    d_expr = (
        F.col("ec").cast("double")
        * F.col("ec")
        * F.col("h")
        / (2.0 * F.col("s2") * (1.0 - F.col("h")) * (1.0 - F.col("h")))
    )
    return (
        lev.orderBy(d_expr.desc(), "dt")
        .limit(5)
        .select(
            F.date_format("dt", "yyyy-MM-dd").alias("dt"),
            (F.round(F.col("ec") / 100.0, 2) + 0.0).alias("residual_dollars"),
            F.round("h", 6).alias("leverage"),
            F.round(d_expr, 6).alias("cooks_d"),
        )
    )


# ---------------------------------------------------------------------------
# Breusch-Pagan heteroskedasticity test.
# ---------------------------------------------------------------------------
@register(
    "breusch_pagan",
    f"""
    WITH {_DAILY_FIT_SQL},
    resid AS (
      SELECT i.t, {_RESID_DOLLARS_SQL} AS ed
      FROM idx i CROSS JOIN fit2),
    aux AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS HUGEINT) AS sx,
             CAST(sum(CAST(ed AS HUGEINT) * ed) AS HUGEINT) AS sy2,
             CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS sxx,
             CAST(sum(CAST(t AS HUGEINT) * ed * ed) AS HUGEINT) AS sxy,
             CAST(sum(CAST(ed AS HUGEINT) * ed * ed * ed) AS HUGEINT) AS syy
      FROM resid),
    r2 AS (
      SELECT n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy2 AS DOUBLE)) AS num,
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS denx,
             (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE)) AS deny
      FROM aux)
    SELECT n AS n_days,
           round(num * num / (denx * deny), 6) AS aux_r2,
           round(CAST(n AS DOUBLE) * num * num / (denx * deny), 4) AS bp_stat,
           CASE WHEN num > 0 THEN 'increasing' ELSE 'non-increasing' END
             AS variance_trend
    FROM r2
    """,
    tags=("diagnostics", "heteroskedasticity", "exact-arith"),
)
def q_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan LM test: regress the squared whole-dollar
    residuals on the day index; BP = n R^2 of that auxiliary fit. All
    five auxiliary moments are exact integers (ed^4 ~ 1e20 at sf0.1 --
    inside DECIMAL(38,0)); the R^2 numerator is squared in DOUBLE
    because its exact square would overflow 38 digits, with identical
    expression shape both engines. A significant BP means the trend's
    error variance itself trends -- the classic heteroskedasticity
    alarm."""
    idx, fit2 = _daily_fit(spark, sf_dir)
    resid = idx.crossJoin(F.broadcast(fit2)).select(
        "t", _resid_dollars().alias("ed")
    )
    td, ed = F.col("t").cast(_DEC), F.col("ed").cast(_DEC)
    aux = resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast(_DEC).alias("sx"),
        F.sum(ed * ed).cast(_DEC).alias("sy2"),
        F.sum(td * td).cast(_DEC).alias("sxx"),
        F.sum(td * ed * ed).cast(_DEC).alias("sxy"),
        F.sum(ed * ed * ed * ed).cast(_DEC).alias("syy"),
    )
    ndd = F.col("n").cast("double")
    r2 = aux.select(
        "n",
        (ndd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy2").cast("double")).alias("num"),
        (ndd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")).alias("denx"),
        (ndd * F.col("syy").cast("double") - F.col("sy2").cast("double") * F.col("sy2").cast("double")).alias("deny"),
    )
    return r2.select(
        F.col("n").alias("n_days"),
        F.round(F.col("num") * F.col("num") / (F.col("denx") * F.col("deny")), 6).alias(
            "aux_r2"
        ),
        F.round(
            F.col("n").cast("double") * F.col("num") * F.col("num")
            / (F.col("denx") * F.col("deny")),
            4,
        ).alias("bp_stat"),
        F.when(F.col("num") > 0, F.lit("increasing"))
        .otherwise(F.lit("non-increasing"))
        .alias("variance_trend"),
    )
