"""Extension batch 183 (round 6): trend extraction and
serial-correlation-corrected regression -- the Henderson 13-term
moving average (the X-11 trend filter: EXACT rational weights
num_j/16796 that sum to one and annihilate every cubic, so the trend
passes polynomials untouched while maximally smoothing noise) over
monthly revenue, the Cochrane-Orcutt AR(1)-corrected trend slope for
daily revenue (the FGLS completion of durbin_watson +
newey_west_slope_se: estimate rho from exact-integer OLS residuals,
quasi-difference, re-fit), and the Pickands tail-index estimator
(the 3-order-statistic EVT read that works for ALL tail regimes,
complementing hill_tail_index's heavy-tail-only estimator on the
same order-value tail).

Cross-engine discipline: Henderson trends are exact integer dot
products over whole-dollar months divided by the 16796 literal once;
Cochrane-Orcutt residuals stay exact integers on the n*D common
denominator, are cent-requantized before the rho cross-moments, and
the quasi-differenced moments e-quantize per row; Pickands uses
exact integer order-stat gaps and one final ln."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# Henderson 13-term weights as exact rationals num_j / 16796
# (j = -6..6): sum = 1, sum j w = sum j^2 w = sum j^3 w = 0.
_H13_NUM = [-325, -468, 0, 1100, 2475, 3600, 4032, 3600, 2475, 1100, 0, -468, -325]
_H13_DEN = 16796

_PICK_K = 64  # Pickands k: uses order stats at ranks k, 2k, 4k


@register(
    "henderson_trend",
    f"""
    WITH mon AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    conv AS (
      SELECT m, v,
             {' + '.join(
                 f'({_H13_NUM[j + 6]} * '
                 + (f'lag(v, {-j})' if j < 0 else f'lead(v, {j})')
                 + ' OVER (ORDER BY m))'
                 for j in range(-6, 7) if _H13_NUM[j + 6] != 0
             )} AS num
      FROM mon)
    SELECT strftime(m, '%Y-%m') AS month, v AS revenue_dollars,
           round(CAST(num AS DOUBLE) / {_H13_DEN}, 2) AS trend_dollars,
           round(v - CAST(num AS DOUBLE) / {_H13_DEN}, 2) + 0.0
             AS cycle_dollars
    FROM conv WHERE num IS NOT NULL
    """,
    tags=("timeseries", "trend", "henderson"),
)
def q_henderson_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Henderson 13-term trend of monthly revenue -- the X-11/X-13
    seasonal-adjustment trend filter. The weights are the EXACT
    rationals num_j/16796 (num = [-325, -468, 0, 1100, 2475, 3600,
    4032, ...mirror]) characterized by: sum w = 1 and the filter
    annihilates first/second/third moments, so any cubic trend passes
    through UNCHANGED while the weighted roughness of the output is
    minimal -- the property the invariant test pins. Each trend value
    is one exact integer dot product over whole-dollar months divided
    by 16796 once; only interior months (full 13-month neighborhood)
    are emitted, cycle = actual - trend."""
    orders = read_table(spark, sf_dir, "orders")
    mon = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    w = Window.orderBy("m")
    num = None
    for j in range(-6, 7):
        c = _H13_NUM[j + 6]
        if c == 0:
            continue
        term = F.lit(c).cast("bigint") * (
            F.lag("v", -j).over(w) if j < 0 else F.lead("v", j).over(w)
        )
        num = term if num is None else num + term
    conv = mon.select("m", "v", num.alias("num")).where(
        F.col("num").isNotNull()
    )
    trend = F.col("num").cast("double") / _H13_DEN
    return conv.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        F.col("v").alias("revenue_dollars"),
        F.round(trend, 2).alias("trend_dollars"),
        (F.round(F.col("v") - trend, 2) + F.lit(0.0)).alias(
            "cycle_dollars"
        ),
    )


@register(
    "cochrane_orcutt",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    idx AS (
      SELECT v, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM daily),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(i) AS HUGEINT) AS sx,
             CAST(sum(v) AS HUGEINT) AS sy,
             CAST(sum(CAST(i AS HUGEINT) * i) AS HUGEINT) AS sxx,
             CAST(sum(CAST(i AS HUGEINT) * v) AS HUGEINT) AS sxy
      FROM idx),
    par AS (
      SELECT n, sx, sy, n * sxx - sx * sx AS dd,
             n * sxy - sx * sy AS bb
      FROM mom),
    res AS (
      SELECT i,
             CAST(floor(CAST(p.n * p.dd * x.v - p.dd * p.sy + p.bb * p.sx
                             - p.n * p.bb * x.i AS DOUBLE)
                        / CAST(p.n * p.dd AS DOUBLE) * 100.0 + 0.5)
                  AS BIGINT) AS r,
             x.v
      FROM idx x CROSS JOIN par p),
    lagd AS (
      SELECT i, r, v,
             lag(r) OVER (ORDER BY i) AS rl,
             lag(v) OVER (ORDER BY i) AS vl
      FROM res),
    rho AS (
      SELECT CAST(sum(CAST(r AS HUGEINT) * rl) AS HUGEINT) AS num,
             CAST(sum(CAST(rl AS HUGEINT) * rl) AS HUGEINT) AS den
      FROM lagd WHERE rl IS NOT NULL),
    rv AS (SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho
           FROM rho),
    tr AS (
      SELECT CAST(l.v AS DOUBLE) - r2.rho * l.vl AS ys,
             (CAST(l.i AS DOUBLE) - r2.rho * (l.i - 1)) AS xs
      FROM lagd l CROSS JOIN rv r2 WHERE l.rl IS NOT NULL),
    qm AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CAST(floor(xs * 1e6 + 0.5) AS BIGINT)) AS HUGEINT)
               AS qx,
             CAST(sum(CAST(floor(ys * 1e3 + 0.5) AS BIGINT)) AS HUGEINT)
               AS qy,
             CAST(sum(CAST(floor(xs * xs * 1e6 + 0.5) AS BIGINT))
                  AS HUGEINT) AS qxx,
             CAST(sum(CAST(floor(xs * ys * 1e3 + 0.5) AS BIGINT))
                  AS HUGEINT) AS qxy
      FROM tr)
    SELECT CAST(p.n AS BIGINT) AS n_days,
           round(r2.rho, 6) + 0.0 AS rho_hat,
           round(CAST(p.bb AS DOUBLE) / CAST(p.dd AS DOUBLE), 6) + 0.0
             AS slope_ols,
           round((q.m * (CAST(q.qxy AS DOUBLE) * 1e-3)
                  - (CAST(q.qx AS DOUBLE) * 1e-6)
                    * (CAST(q.qy AS DOUBLE) * 1e-3))
                 / (q.m * (CAST(q.qxx AS DOUBLE) * 1e-6)
                    - (CAST(q.qx AS DOUBLE) * 1e-6)
                      * (CAST(q.qx AS DOUBLE) * 1e-6)), 6) + 0.0
             AS slope_co
    FROM par p CROSS JOIN rv r2 CROSS JOIN qm q
    """,
    tags=("regression", "autocorrelation", "fgls"),
)
def q_cochrane_orcutt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochrane-Orcutt AR(1)-corrected trend slope of daily revenue:
    OLS residuals (kept EXACT as integers on the common n*D
    denominator, then cent-requantized) give rho = sum(e_t e_t-1) /
    sum(e_t-1^2); quasi-differencing y* = y_t - rho y_t-1,
    x* = t - rho (t-1) and re-fitting yields the serially-corrected
    slope printed beside the naive OLS one -- the FGLS companion to
    durbin_watson (which only DETECTS the autocorrelation) and
    newey_west_slope_se (which only widens the naive SE). Quantized
    integer moments everywhere a float sum would cross rows."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    idx = daily.select(
        "v",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias(
            "i"
        ),
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("i").cast(_DEC).alias("sx"),
        F.sum("v").cast(_DEC).alias("sy"),
        F.sum(F.col("i").cast(_DEC) * F.col("i")).cast(_DEC).alias("sxx"),
        F.sum(F.col("i").cast(_DEC) * F.col("v")).cast(_DEC).alias("sxy"),
    )
    par = mom.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "dd"
        ),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "bb"
        ),
    )
    res = idx.crossJoin(F.broadcast(par)).select(
        "i",
        "v",
        F.floor(
            (
                F.col("n") * F.col("dd") * F.col("v")
                - F.col("dd") * F.col("sy")
                + F.col("bb") * F.col("sx")
                - F.col("n") * F.col("bb") * F.col("i")
            ).cast("double")
            / (F.col("n") * F.col("dd")).cast("double")
            * 100.0
            + 0.5
        )
        .cast("bigint")
        .alias("r"),
    )
    w = Window.orderBy("i")
    lagd = res.select(
        "i",
        "r",
        "v",
        F.lag("r").over(w).alias("rl"),
        F.lag("v").over(w).alias("vl"),
    )
    rho = (
        lagd.where(F.col("rl").isNotNull())
        .agg(
            F.sum(F.col("r").cast(_DEC) * F.col("rl"))
            .cast(_DEC)
            .alias("num"),
            F.sum(F.col("rl").cast(_DEC) * F.col("rl"))
            .cast(_DEC)
            .alias("den"),
        )
        .select(
            (
                F.col("num").cast("double") / F.col("den").cast("double")
            ).alias("rho")
        )
    )
    tr = (
        lagd.where(F.col("rl").isNotNull())
        .crossJoin(F.broadcast(rho))
        .select(
            (F.col("v").cast("double") - F.col("rho") * F.col("vl"))
            .alias("ys"),
            (
                F.col("i").cast("double")
                - F.col("rho") * (F.col("i") - 1)
            ).alias("xs"),
        )
    )
    qm = tr.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.floor(F.col("xs") * 1e6 + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("qx"),
        F.sum(F.floor(F.col("ys") * 1e3 + 0.5).cast("bigint"))
        .cast(_DEC)
        .alias("qy"),
        F.sum(
            F.floor(F.col("xs") * F.col("xs") * 1e6 + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("qxx"),
        F.sum(
            F.floor(F.col("xs") * F.col("ys") * 1e3 + 0.5).cast("bigint")
        )
        .cast(_DEC)
        .alias("qxy"),
    )
    slope_co = (
        F.col("m") * (F.col("qxy").cast("double") * 1e-3)
        - (F.col("qx").cast("double") * 1e-6)
        * (F.col("qy").cast("double") * 1e-3)
    ) / (
        F.col("m") * (F.col("qxx").cast("double") * 1e-6)
        - (F.col("qx").cast("double") * 1e-6)
        * (F.col("qx").cast("double") * 1e-6)
    )
    return (
        par.crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(qm))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            (F.round(F.col("rho"), 6) + F.lit(0.0)).alias("rho_hat"),
            (
                F.round(
                    F.col("bb").cast("double")
                    / F.col("dd").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("slope_ols"),
            (F.round(slope_co, 6) + F.lit(0.0)).alias("slope_co"),
        )
    )


@register(
    "pickands_tail_index",
    f"""
    WITH topv AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders
      ORDER BY round(o_totalprice * 100, 0) DESC, o_orderkey
      LIMIT {4 * _PICK_K}),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v DESC) AS rn FROM topv),
    pick AS (
      SELECT max(CASE WHEN rn = {_PICK_K} THEN v END) AS xk,
             max(CASE WHEN rn = {2 * _PICK_K} THEN v END) AS x2k,
             max(CASE WHEN rn = {4 * _PICK_K} THEN v END) AS x4k
      FROM ranked)
    SELECT CAST({_PICK_K} AS BIGINT) AS k,
           CAST(xk AS BIGINT) AS xk_cents,
           CAST(x2k AS BIGINT) AS x2k_cents,
           CAST(x4k AS BIGINT) AS x4k_cents,
           round(CASE WHEN xk > x2k AND x2k > x4k
                 THEN ln(CAST(xk - x2k AS DOUBLE) / (x2k - x4k))
                      / ln(2.0) ELSE NULL END, 6) + 0.0 AS xi_hat
    FROM pick
    """,
    tags=("stats", "extreme-value", "tail"),
)
def q_pickands_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pickands tail-index estimator on the order-value upper tail:
    xi = ln((X_(k) - X_(2k)) / (X_(2k) - X_(4k))) / ln 2 from the
    three order statistics at ranks k, 2k, 4k (k = 64). Unlike the
    Hill estimator on the same tail (hill_tail_index, heavy-tail
    only), Pickands is consistent for EVERY extreme-value regime --
    xi > 0 heavy, = 0 Gumbel-light, < 0 finite endpoint; bounded
    order totals should read xi < 0. Exact integer order-stat gaps,
    one final ln."""
    orders = read_table(spark, sf_dir, "orders")
    topv = (
        orders.select(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("v"),
            "o_orderkey",
        )
        .orderBy(F.col("v").desc(), "o_orderkey")
        .limit(4 * _PICK_K)
        .select("v")
    )
    ranked = topv.select(
        "v",
        F.row_number().over(Window.orderBy(F.col("v").desc())).alias(
            "rn"
        ),
    )
    pick = ranked.agg(
        *[
            F.max(
                F.when(F.col("rn") == r, F.col("v"))
            ).alias(name)
            for name, r in (
                ("xk", _PICK_K),
                ("x2k", 2 * _PICK_K),
                ("x4k", 4 * _PICK_K),
            )
        ]
    )
    xi = F.when(
        (F.col("xk") > F.col("x2k")) & (F.col("x2k") > F.col("x4k")),
        F.log(
            (F.col("xk") - F.col("x2k")).cast("double")
            / (F.col("x2k") - F.col("x4k"))
        )
        / F.log(F.lit(2.0)),
    )
    return pick.select(
        F.lit(_PICK_K).cast("bigint").alias("k"),
        F.col("xk").cast("bigint").alias("xk_cents"),
        F.col("x2k").cast("bigint").alias("x2k_cents"),
        F.col("x4k").cast("bigint").alias("x4k_cents"),
        (F.round(xi, 6) + F.lit(0.0)).alias("xi_hat"),
    )
