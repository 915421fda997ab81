"""Extension batch 154 (round 6): almost-stochastic-order (the
modern model-comparison test -- Dror et al.'s violation-ratio
epsilon over quantile differences, here weekday-vs-weekend daily
revenue: 'how far from full stochastic dominance'), the McLeod-Li /
ARCH-effect portmanteau (Ljung-Box on SQUARED deviations: volatility
clustering that the level ACF can't see), and the Kupiec
proportion-of-failures backtest of the Cornish-Fisher VaR (does the
5% VaR actually get violated 5% of the time).

Cross-engine discipline:
- ASO: both quantile functions are exact order statistics off
  per-group value spines (PARTITIONED cumulative windows only); the
  violation ratio folds exact integer quantile gaps.
- McLeod-Li: squared deviations are e0-quantized dollars^2 integers,
  then the same exact-autocovariance machinery as ljung_box_q (u =
  m*z - Sz keeps every product inside DECIMAL(38,0) through sf1).
- Kupiec: violation counts are exact; the LR statistic is one double
  expression with the x = 0 / x = n boundary terms zeroed explicitly
  in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_K_GRID = 50
_Z_05 = "CAST(-1.6448536269514726 AS DOUBLE)"


@register(
    "almost_stochastic_order",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END
               AS we,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY 1, 2),
    spine AS (
      SELECT we, v, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY we, v),
    ranked AS (
      SELECT we, v, sum(c) OVER (PARTITION BY we ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    ng AS (
      SELECT we, CAST(sum(c) AS BIGINT) AS n FROM spine GROUP BY we),
    grid AS (SELECT unnest(range(1, {_K_GRID + 1})) AS k),
    q AS (
      SELECT g.k, r.we, min(r.v) AS qv
      FROM grid g
      JOIN ng t ON TRUE
      JOIN ranked r ON r.we = t.we
        AND 2 * {_K_GRID} * r.cc >= (2 * g.k - 1) * t.n
      GROUP BY g.k, r.we),
    gaps AS (
      SELECT a.k,
             CAST(a.qv - b.qv AS BIGINT) AS gap
      FROM q a JOIN q b ON a.k = b.k AND a.we = 0 AND b.we = 1),
    agg AS (
      SELECT CAST(sum(CASE WHEN gap < 0 THEN gap * gap ELSE 0 END) AS HUGEINT)
               AS viol,
             CAST(sum(gap * gap) AS HUGEINT) AS total,
             CAST(count(*) AS BIGINT) AS kk
      FROM gaps)
    SELECT kk AS n_quantiles,
           round(CASE WHEN total = 0 THEN 0.5
                 ELSE CAST(viol AS DOUBLE) / CAST(total AS DOUBLE) END, 6)
             AS eps_w2_violation,
           (CASE WHEN total = 0 THEN 0.5
            ELSE CAST(viol AS DOUBLE) / CAST(total AS DOUBLE) END) < 0.5
             AS weekday_almost_dominates
    FROM agg
    """,
    tags=("stats", "two-sample", "dominance"),
)
def q_almost_stochastic_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Almost-stochastic-order violation ratio between weekday (A) and
    weekend (B) daily revenue: over a 50-point quantile grid,
    eps_W2 = sum (qA - qB)_-^2 / sum (qA - qB)^2 -- 0 means weekday
    revenue FULLY stochastically dominates weekend, 0.5 means no
    order; eps < 0.5 is 'almost dominance' (the NLP model-comparison
    criterion). Quantiles are exact order statistics (min v with
    2K*cc >= (2k-1)n) off per-group spines; the ratio folds exact
    integer gaps."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").alias("d"),
        F.when(F.dayofweek("o_orderdate").isin(1, 7), 1)
        .otherwise(0)
        .alias("we"),
    ).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    spine = daily.groupBy("we", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("we").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = spine.select("we", "v", F.sum("c").over(w).alias("cc"))
    ng = spine.groupBy("we").agg(F.sum("c").cast("bigint").alias("n"))
    grid = spark.range(1, _K_GRID + 1).select(F.col("id").alias("k"))
    rk = ranked.join(ng, "we")
    q = (
        grid.crossJoin(rk)
        .where(
            2 * _K_GRID * F.col("cc") >= (2 * F.col("k") - 1) * F.col("n")
        )
        .groupBy("k", "we")
        .agg(F.min("v").alias("qv"))
    )
    qa = q.where(F.col("we") == 0).select("k", F.col("qv").alias("qa"))
    qb = q.where(F.col("we") == 1).select("k", F.col("qv").alias("qb"))
    gaps = qa.join(qb, "k").select(
        (F.col("qa") - F.col("qb")).cast("bigint").alias("gap")
    )
    agg = gaps.agg(
        F.sum(
            F.when(F.col("gap") < 0, F.col("gap") * F.col("gap")).otherwise(0)
        )
        .cast(_DEC)
        .alias("viol"),
        F.sum(F.col("gap") * F.col("gap")).cast(_DEC).alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    eps = F.when(F.col("total") == 0, 0.5).otherwise(
        F.col("viol").cast("double") / F.col("total").cast("double")
    )
    return agg.select(
        F.col("kk").alias("n_quantiles"),
        F.round(eps, 6).alias("eps_w2_violation"),
        (eps < 0.5).alias("weekday_almost_dominates"),
    )


@register(
    "mcleod_li_arch",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(v) AS HUGEINT) AS s
      FROM daily),
    z AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
             CAST(floor((CAST(v AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n)
                  * (CAST(v AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n) + 0.5)
                  AS BIGINT) AS z
      FROM daily CROSS JOIN mom m),
    zt AS (SELECT CAST(count(*) AS HUGEINT) AS m, CAST(sum(z) AS HUGEINT) AS sz
           FROM z),
    u AS (
      SELECT z.rn, CAST(z.z AS HUGEINT) * t.m - t.sz AS u, t.m
      FROM z CROSS JOIN zt t),
    lagged AS (
      SELECT rn, u, unnest(range(0, 8)) AS lag_k FROM u),
    g AS (
      SELECT a.lag_k, sum(a.u * b.u) AS gk
      FROM lagged a JOIN u b ON b.rn = a.rn - a.lag_k
      GROUP BY a.lag_k),
    rho AS (
      SELECT g.lag_k,
             CAST(g.gk AS DOUBLE) / CAST(g0.gk AS DOUBLE) AS r,
             CAST(t.m AS DOUBLE) AS nd
      FROM g CROSS JOIN (SELECT gk FROM g WHERE lag_k = 0) g0
      CROSS JOIN zt t
      WHERE g.lag_k >= 1)
    SELECT CAST(lag_k AS INTEGER) AS lag_k,
           round(r, 6) + 0.0 AS rho_squared_series,
           round(nd * (nd + 2) * sum(r * r / (nd - lag_k)) OVER (
             ORDER BY lag_k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS mcleod_li_q
    FROM rho
    ORDER BY lag_k
    """,
    tags=("timeseries", "volatility", "diagnostics"),
)
def q_mcleod_li_arch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McLeod-Li portmanteau: the Ljung-Box Q applied to SQUARED
    deviations of daily revenue -- significant autocorrelation in the
    squares with none in the levels is the ARCH signature (volatility
    clusters: big days follow big days in magnitude, not direction).
    Squared deviations are e0-quantized dollar^2 integers, then the
    exact ljung_box_q machinery (u = m*z - Sz) keeps every
    autocovariance product inside DECIMAL(38,0)."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("v").cast(_DEC).alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    z = daily.crossJoin(F.broadcast(mom)).select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn"),
        F.floor(
            (F.col("v").cast("double") - mu) * (F.col("v").cast("double") - mu)
            + 0.5
        )
        .cast("bigint")
        .alias("z"),
    )
    zt = z.agg(
        F.count(F.lit(1)).cast(_DEC).alias("m"),
        F.sum("z").cast(_DEC).alias("sz"),
    )
    u = z.crossJoin(F.broadcast(zt)).select(
        "rn",
        (F.col("z").cast(_DEC) * F.col("m") - F.col("sz")).alias("u"),
        "m",
    )
    lagged = u.select(
        "rn",
        "u",
        F.explode(F.array(*[F.lit(k) for k in range(0, 8)])).alias("lag_k"),
    )
    a = lagged.alias("a")
    b = u.alias("b")
    g = (
        a.join(b, F.col("b.rn") == F.col("a.rn") - F.col("a.lag_k"))
        .groupBy(F.col("a.lag_k").alias("lag_k"))
        .agg(F.sum(F.col("a.u") * F.col("b.u")).cast(_DEC).alias("gk"))
    )
    g0 = g.where(F.col("lag_k") == 0).select(F.col("gk").alias("g0"))
    rho = (
        g.where(F.col("lag_k") >= 1)
        .crossJoin(F.broadcast(g0))
        .crossJoin(
            F.broadcast(zt.select(F.col("m").cast("double").alias("nd")))
        )
        .select(
            "lag_k",
            (F.col("gk").cast("double") / F.col("g0").cast("double")).alias(
                "r"
            ),
            "nd",
        )
    )
    wq = Window.orderBy("lag_k").rowsBetween(Window.unboundedPreceding, 0)
    return rho.select(
        F.col("lag_k").cast("integer").alias("lag_k"),
        (F.round(F.col("r"), 6) + F.lit(0.0)).alias("rho_squared_series"),
        F.round(
            F.col("nd")
            * (F.col("nd") + 2)
            * F.sum(F.col("r") * F.col("r") / (F.col("nd") - F.col("lag_k"))).over(
                wq
            ),
            6,
        ).alias("mcleod_li_q"),
    ).orderBy("lag_k")


@register(
    "kupiec_var_backtest",
    f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100 AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
             CAST(sum(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS s3
      FROM daily),
    shape AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS m2,
             (CAST(s3 AS DOUBLE)
               - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(s2 AS DOUBLE)
               + 2.0 * CAST(n AS DOUBLE)
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
               / CAST(n AS DOUBLE) AS m3
      FROM mom),
    var_t AS (
      SELECT n, mu + ({_Z_05}
          + ({_Z_05} * {_Z_05} - 1.0)
            * (m3 / (m2 * sqrt(m2))) / 6.0) * sqrt(m2) AS var05
      FROM shape),
    viol AS (
      SELECT t.n, t.var05,
             CAST(sum(CASE WHEN d2.v < t.var05 THEN 1 ELSE 0 END) AS BIGINT)
               AS x
      FROM daily d2 CROSS JOIN var_t t GROUP BY t.n, t.var05)
    SELECT n AS n_days, round(var05, 2) AS var05_cf_dollars,
           x AS n_violations,
           round(0.05 * n, 2) AS expected_violations,
           round(-2.0 * (
             (n - x) * ln(0.95) + x * ln(0.05)
             - (CASE WHEN x = 0 THEN 0.0
                ELSE x * ln(CAST(x AS DOUBLE) / n) END)
             - (CASE WHEN x = n THEN 0.0
                ELSE (n - x) * ln(1.0 - CAST(x AS DOUBLE) / n) END)), 6)
             AS kupiec_lr,
           (-2.0 * (
             (n - x) * ln(0.95) + x * ln(0.05)
             - (CASE WHEN x = 0 THEN 0.0
                ELSE x * ln(CAST(x AS DOUBLE) / n) END)
             - (CASE WHEN x = n THEN 0.0
                ELSE (n - x) * ln(1.0 - CAST(x AS DOUBLE) / n) END)))
             > 3.841 AS reject_5pct
    FROM viol
    """,
    tags=("finance", "risk", "backtest"),
)
def q_kupiec_var_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kupiec proportion-of-failures backtest of the skew-adjusted
    (first-order Cornish-Fisher) 5% VaR for daily revenue: count the
    days below the VaR line, then LR = -2 ln[ L(p=0.05) / L(p_hat) ]
    ~ chi2_1 -- too many OR too few violations both reject (a VaR
    that never breaches is mis-calibrated too). Exact violation
    counts; the boundary terms x=0 / x=n are zeroed identically in
    both engines."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100 AS BIGINT)"
        ).alias("v")
    )
    v = F.col("v").cast(_DEC)
    mom = daily.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(v).cast(_DEC).alias("s1"),
        F.sum(v * F.col("v")).cast(_DEC).alias("s2"),
        F.sum(v * F.col("v") * F.col("v")).cast(_DEC).alias("s3"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    mu = s1 / nd
    m2 = (s2 - s1 * s1 / nd) / nd
    m3 = (s3 - 3.0 * mu * s2 + 2.0 * nd * mu * mu * mu) / nd
    zl = F.expr(_Z_05)
    var05 = mu + (zl + (zl * zl - 1.0) * (m3 / (m2 * F.sqrt(m2))) / 6.0) * F.sqrt(
        m2
    )
    var_t = mom.select(
        F.col("n").cast("bigint").alias("n"), var05.alias("var05")
    )
    viol = (
        daily.crossJoin(F.broadcast(var_t))
        .groupBy("n", "var05")
        .agg(
            F.sum(F.when(F.col("v") < F.col("var05"), 1).otherwise(0))
            .cast("bigint")
            .alias("x")
        )
    )
    xd = F.col("x").cast("double")
    ndd = F.col("n").cast("double")
    import math

    lr = -2.0 * (
        (ndd - xd) * math.log(0.95)
        + xd * math.log(0.05)
        - F.when(F.col("x") == 0, 0.0).otherwise(xd * F.log(xd / ndd))
        - F.when(F.col("x") == F.col("n"), 0.0).otherwise(
            (ndd - xd) * F.log(1.0 - xd / ndd)
        )
    )
    return viol.select(
        F.col("n").alias("n_days"),
        F.round(F.col("var05"), 2).alias("var05_cf_dollars"),
        F.col("x").alias("n_violations"),
        F.round(0.05 * ndd, 2).alias("expected_violations"),
        F.round(lr, 6).alias("kupiec_lr"),
        (lr > 3.841).alias("reject_5pct"),
    )
