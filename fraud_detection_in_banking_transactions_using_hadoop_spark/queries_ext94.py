"""Extension batch 94: time-series econometrics -- the cross-
correlation function with lead/lag identification, an Engle-Granger
cointegration (residual ADF) test, and 1-lag Granger causality.

autocorr/pacf look WITHIN one series; this batch relates TWO (daily
order count vs daily revenue):

- ccf_lead_lag: corr(x_t, y_{t+k}) for k = -7..7 via an equi-join of
  the day-indexed series against the constant 15-row lag grid --
  per-lag moments are exact integers, so each correlation is one
  double expression. The argmax lag says who LEADS.
- engle_granger_adf: regress y on x (exact moments), round residuals
  to whole-dollar integers (scale-invariant for the test), then the
  Dickey-Fuller rho = sum(e_lag de)/sum(e_lag^2) with its t -- all
  integer sums. t below the EG 5% critical (~ -3.37 for 2 variables)
  means the pair is cointegrated: they drift together.
- granger_causality_1lag: does yesterday's ORDER COUNT improve
  today's revenue forecast beyond yesterday's revenue? Restricted vs
  unrestricted RSS from the exact 2x2 closed form; F with 1 df.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_CCF_MAX_LAG = 7

_DAILY_XY_SQL = """
    d AS (
      SELECT o_orderdate AS dt,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) // 100 AS y
      FROM orders GROUP BY o_orderdate),
    seq AS (
      SELECT CAST(row_number() OVER (ORDER BY dt) AS BIGINT) AS t, x, y
      FROM d)
"""


def _daily_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.expr("CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) DIV 100").alias(
            "y"
        ),
    )
    return d.select(
        F.row_number().over(Window.orderBy("dt")).cast("bigint").alias("t"),
        "x",
        "y",
    )


# ---------------------------------------------------------------------------
# Cross-correlation function, lags -7..+7.
# ---------------------------------------------------------------------------
@register(
    "ccf_lead_lag",
    f"""
    WITH {_DAILY_XY_SQL},
    lags AS (SELECT unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG + 1})) AS k),
    pairs AS (
      SELECT l.k, a.x AS xv, b.y AS yv
      FROM seq a JOIN lags l ON true
      JOIN seq b ON b.t = a.t + l.k),
    mm AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS HUGEINT) AS sx,
             CAST(sum(yv) AS HUGEINT) AS sy,
             CAST(sum(CAST(xv AS HUGEINT) * yv) AS HUGEINT) AS sxy,
             CAST(sum(CAST(xv AS HUGEINT) * xv) AS HUGEINT) AS sxx,
             CAST(sum(CAST(yv AS HUGEINT) * yv) AS HUGEINT) AS syy
      FROM pairs GROUP BY k)
    SELECT CAST(k AS INTEGER) AS lag_days, n AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0.0
             AS ccf
    FROM mm ORDER BY lag_days
    """,
    tags=("timeseries", "cross-correlation", "exact-arith"),
)
def q_ccf_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCF between daily order count and daily revenue (whole
    dollars) at lags -7..+7: the day-indexed series equi-joins
    against the constant 15-row lag grid (b.t = a.t + k), per-lag
    moments are exact integers, each correlation one double
    expression. Positive-lag peaks mean count LEADS revenue; the k=0
    column reproduces the plain correlation as a sanity anchor."""
    seq = _daily_seq(spark, sf_dir)
    lags = spark.createDataFrame(
        [(k,) for k in range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1)], "k int"
    )
    a = seq.select("t", F.col("x").alias("xv"))
    b = seq.select(F.col("t").alias("tb"), F.col("y").alias("yv"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("tb") == F.col("t") + F.col("k"))
        .select("k", "xv", "yv")
    )
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mm = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xv").cast(_DEC).alias("sx"),
        F.sum("yv").cast(_DEC).alias("sy"),
        F.sum(dd("xv") * dd("yv")).cast(_DEC).alias("sxy"),
        F.sum(dd("xv") * dd("xv")).cast(_DEC).alias("sxx"),
        F.sum(dd("yv") * dd("yv")).cast(_DEC).alias("syy"),
    )
    nd = F.col("n").cast(_DEC)
    ccf = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return mm.select(
        F.col("k").cast("int").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        (F.round(ccf, 6) + 0.0).alias("ccf"),
    ).orderBy("lag_days")


# ---------------------------------------------------------------------------
# Engle-Granger cointegration: ADF on the regression residuals.
# ---------------------------------------------------------------------------
@register(
    "engle_granger_adf",
    f"""
    WITH {_DAILY_XY_SQL},
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM seq),
    fit AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM mom),
    resid AS (
      SELECT s.t,
             CAST(floor(CAST(s.y AS DOUBLE) - f.a - f.b * s.x + 0.5) AS BIGINT)
               AS e
      FROM seq s CROSS JOIN fit f),
    walk AS (
      SELECT e, lag(e) OVER (ORDER BY t) AS ep FROM resid),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CAST(ep AS HUGEINT) * (e - ep)) AS HUGEINT) AS sed,
             CAST(sum(CAST(ep AS HUGEINT) * ep) AS HUGEINT) AS see,
             CAST(sum(CAST(e - ep AS HUGEINT) * (e - ep)) AS HUGEINT) AS sdd
      FROM walk WHERE ep IS NOT NULL),
    c AS (
      SELECT m,
             CAST(sed AS DOUBLE) / CAST(see AS DOUBLE) AS rho,
             (CAST(sdd AS DOUBLE)
              - CAST(sed AS DOUBLE) / CAST(see AS DOUBLE) * sed)
               / (m - 2) AS s2,
             CAST(see AS DOUBLE) AS seed
      FROM sums)
    SELECT m AS n_diffs,
           round(rho, 6) + 0.0 AS rho,
           round(rho / sqrt(s2 / seed), 4) + 0.0 AS adf_t,
           CASE WHEN rho / sqrt(s2 / seed) < -3.37
                THEN 'cointegrated-5pct' ELSE 'not-shown' END AS verdict
    FROM c
    """,
    tags=("timeseries", "cointegration", "exact-arith"),
)
def q_engle_granger_adf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger step 2: OLS residuals of daily revenue on daily
    order count (exact moment fit, residuals floored to whole-dollar
    integers -- the ADF t is scale-invariant), then the no-constant
    Dickey-Fuller regression Delta e = rho e_{{t-1}}: rho, its t, and
    the EG 5% verdict (critical ~ -3.37 for one regressor). A
    cointegrated pair licenses error-correction forecasting; a
    spurious one does not -- the test that separates them."""
    seq = _daily_seq(spark, sf_dir)
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum("y").cast(_DEC).alias("sy"),
        F.sum(dd("x") * dd("x")).cast(_DEC).alias("sxx"),
        F.sum(dd("x") * dd("y")).cast(_DEC).alias("sxy"),
    )
    nd = F.col("n").cast(_DEC)
    bnum = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    bden = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fit = mom.select(
        "n",
        (bnum / bden).alias("b"),
        (
            (F.col("sy").cast("double") - bnum / bden * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    resid = seq.crossJoin(F.broadcast(fit)).select(
        "t",
        F.floor(
            F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("x") + 0.5
        )
        .cast("bigint")
        .alias("e"),
    )
    walk = resid.select("e", F.lag("e").over(Window.orderBy("t")).alias("ep"))
    de = (F.col("e") - F.col("ep")).cast(_DEC)
    sums = walk.where(F.col("ep").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("ep").cast(_DEC) * de).cast(_DEC).alias("sed"),
        F.sum(F.col("ep").cast(_DEC) * F.col("ep").cast(_DEC)).cast(_DEC).alias("see"),
        F.sum(de * de).cast(_DEC).alias("sdd"),
    )
    rho = F.col("sed").cast("double") / F.col("see").cast("double")
    s2 = (F.col("sdd").cast("double") - rho * F.col("sed")) / (F.col("m") - 2)
    c = sums.select(
        "m", rho.alias("rho"), s2.alias("s2"), F.col("see").cast("double").alias("seed")
    )
    t = F.col("rho") / F.sqrt(F.col("s2") / F.col("seed"))
    return c.select(
        F.col("m").alias("n_diffs"),
        (F.round("rho", 6) + 0.0).alias("rho"),
        (F.round(t, 4) + 0.0).alias("adf_t"),
        F.when(t < -3.37, F.lit("cointegrated-5pct"))
        .otherwise(F.lit("not-shown"))
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Granger causality, one lag.
# ---------------------------------------------------------------------------
@register(
    "granger_causality_1lag",
    f"""
    WITH {_DAILY_XY_SQL},
    rows_l AS (
      SELECT b.y AS yt, a.y AS yl, a.x AS xl
      FROM seq a JOIN seq b ON b.t = a.t + 1),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yt) AS HUGEINT) AS s0,
             CAST(sum(yl) AS HUGEINT) AS s1,
             CAST(sum(xl) AS HUGEINT) AS s2v,
             CAST(sum(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS s11,
             CAST(sum(CAST(yl AS HUGEINT) * xl) AS HUGEINT) AS s12,
             CAST(sum(CAST(xl AS HUGEINT) * xl) AS HUGEINT) AS s22,
             CAST(sum(CAST(yl AS HUGEINT) * yt) AS HUGEINT) AS s10,
             CAST(sum(CAST(xl AS HUGEINT) * yt) AS HUGEINT) AS s20,
             CAST(sum(CAST(yt AS HUGEINT) * yt) AS HUGEINT) AS s00
      FROM rows_l),
    c AS (
      SELECT n,
             CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s12 - s1 * s2v AS DOUBLE) AS c12,
             CAST(n * s22 - s2v * s2v AS DOUBLE) AS c22,
             CAST(n * s10 - s1 * s0 AS DOUBLE) AS c10,
             CAST(n * s20 - s2v * s0 AS DOUBLE) AS c20,
             CAST(n * s00 - s0 * s0 AS DOUBLE) AS c00
      FROM mom),
    f AS (
      SELECT n, c00, c10, c11, c20,
             (c22 * c10 - c12 * c20) / (c11 * c22 - c12 * c12) AS b1,
             (c11 * c20 - c12 * c10) / (c11 * c22 - c12 * c12) AS b2
      FROM c),
    rss AS (
      SELECT n,
             c00 - (b1 * c10 + b2 * c20) AS rss_u,
             c00 - c10 * c10 / c11 AS rss_r,
             b2
      FROM f)
    SELECT n AS n_obs,
           round(b2, 6) + 0.0 AS beta_count_lag,
           round((rss_r - rss_u) / (rss_u / (n - 3)), 4) AS f_stat,
           CASE WHEN (rss_r - rss_u) / (rss_u / (n - 3)) > 3.85
                THEN 'count-granger-causes-revenue' ELSE 'not-shown' END
             AS verdict
    FROM rss
    """,
    tags=("timeseries", "causality", "exact-arith"),
)
def q_granger_causality_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger(1): does yesterday's order count predict today's
    revenue beyond yesterday's revenue? Unrestricted (y_l, x_l) fit
    via the exact 2x2 closed form, restricted y_l-only fit, and
    F = (RSS_r - RSS_u)/(RSS_u/(n-3)) with 1 df (5% critical ~3.85).
    All moments exact integers; RSS values close over the n-scaled
    central moments -- no residual materialization at all."""
    seq = _daily_seq(spark, sf_dir)
    a = seq.select(F.col("t"), F.col("y").alias("yl"), F.col("x").alias("xl"))
    b = seq.select((F.col("t") - 1).alias("t"), F.col("y").alias("yt"))
    rows_l = a.join(b, "t").select("yt", "yl", "xl")
    dd = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    mom = rows_l.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yt").cast(_DEC).alias("s0"),
        F.sum("yl").cast(_DEC).alias("s1"),
        F.sum("xl").cast(_DEC).alias("s2v"),
        F.sum(dd("yl") * dd("yl")).cast(_DEC).alias("s11"),
        F.sum(dd("yl") * dd("xl")).cast(_DEC).alias("s12"),
        F.sum(dd("xl") * dd("xl")).cast(_DEC).alias("s22"),
        F.sum(dd("yl") * dd("yt")).cast(_DEC).alias("s10"),
        F.sum(dd("xl") * dd("yt")).cast(_DEC).alias("s20"),
        F.sum(dd("yt") * dd("yt")).cast(_DEC).alias("s00"),
    )
    nd = F.col("n").cast(_DEC)
    c = mom.select(
        "n",
        (nd * F.col("s11") - F.col("s1") * F.col("s1")).cast("double").alias("c11"),
        (nd * F.col("s12") - F.col("s1") * F.col("s2v")).cast("double").alias("c12"),
        (nd * F.col("s22") - F.col("s2v") * F.col("s2v")).cast("double").alias("c22"),
        (nd * F.col("s10") - F.col("s1") * F.col("s0")).cast("double").alias("c10"),
        (nd * F.col("s20") - F.col("s2v") * F.col("s0")).cast("double").alias("c20"),
        (nd * F.col("s00") - F.col("s0") * F.col("s0")).cast("double").alias("c00"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c10") - F.col("c12") * F.col("c20")) / det
    b2 = (F.col("c11") * F.col("c20") - F.col("c12") * F.col("c10")) / det
    f = c.select("n", "c00", "c10", "c11", "c20", b1.alias("b1"), b2.alias("b2"))
    rss_u = F.col("c00") - (F.col("b1") * F.col("c10") + F.col("b2") * F.col("c20"))
    rss_r = F.col("c00") - F.col("c10") * F.col("c10") / F.col("c11")
    rss = f.select("n", rss_u.alias("rss_u"), rss_r.alias("rss_r"), "b2")
    fstat = (F.col("rss_r") - F.col("rss_u")) / (F.col("rss_u") / (F.col("n") - 3))
    return rss.select(
        F.col("n").alias("n_obs"),
        (F.round("b2", 6) + 0.0).alias("beta_count_lag"),
        F.round(fstat, 4).alias("f_stat"),
        F.when(fstat > 3.85, F.lit("count-granger-causes-revenue"))
        .otherwise(F.lit("not-shown"))
        .alias("verdict"),
    )
