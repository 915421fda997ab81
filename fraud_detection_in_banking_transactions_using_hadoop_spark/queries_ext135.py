"""Extension batch 135 (round 6): whiteness / random-walk /
stationarity diagnostics on the daily-revenue series -- the Ljung-Box
portmanteau Q, the Lo-MacKinlay variance-ratio test, and the KPSS
level-stationarity statistic. Complements the existing single-lag
diagnostics (durbin_watson, von_neumann_ratio, engle_granger_adf):
these three test WHOLE-spectrum properties (joint autocorrelation,
random-walk scaling, and the null of stationarity itself, which ADF
can only reject the other way around).

Scale notes (the 100 TB story):
- All three reduce the fact table to the |distinct days| calendar
  spine first (one grouped aggregation), so every window below runs
  on a CALENDAR-bounded input (growth gate class "orders_days").
- Exact-arithmetic discipline (CLAUDE.md float-parity rules): the
  demeaned series is carried as u_t = n*x_t - S (exact integers in
  DECIMAL(38,0)/HUGEINT), so autocovariance numerators, partial-sum
  squares and variance numerators are EXACT on both engines; each
  statistic is ONE double division at the end.
- Magnitude audit: at sf0.1 the largest exact term is KPSS's
  sum((n*P_t - t*S)^2) ~ 6e34 * (l+1) ~ 5e35 << 1e38; at sf1 it
  reaches ~5e37, still inside DECIMAL(38,0). Beyond sf1, switch the
  series to whole dollars (one-line change) -- documented, not hit
  by any tested scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


def _daily_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue in exact cents, indexed 1..n by date (unique key,
    so the unpartitioned row_number is deterministic)."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    return daily.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn"),
        "cents",
    )


_DAILY_SQL = """
    daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_orderdate),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, cents
      FROM daily),
    tot AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(cents) AS HUGEINT) AS sm
      FROM s)
"""


@register(
    "ljung_box_q",
    f"""
    WITH {_DAILY_SQL},
    u AS (
      SELECT s.rn, t.n, CAST(s.cents AS HUGEINT) * t.n - t.sm AS u
      FROM s CROSS JOIN tot t),
    lagged AS (
      SELECT rn, u, unnest(range(0, 8)) AS lag_k FROM u),
    g AS (
      SELECT a.lag_k, sum(a.u * b.u) AS gk
      FROM lagged a JOIN u b ON b.rn = a.rn - a.lag_k
      GROUP BY a.lag_k),
    rho AS (
      SELECT g.lag_k,
             CAST(g.gk AS DOUBLE) / CAST(g0.gk AS DOUBLE) AS r,
             CAST(t.n AS DOUBLE) AS nd
      FROM g CROSS JOIN (SELECT gk FROM g WHERE lag_k = 0) g0
      CROSS JOIN tot t
      WHERE g.lag_k >= 1)
    SELECT CAST(lag_k AS INTEGER) AS lag_k,
           round(r, 6) + 0.0 AS rho,
           round(nd * (nd + 2) * sum(r * r / (nd - lag_k)) OVER (
             ORDER BY lag_k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS q_stat
    FROM rho
    ORDER BY lag_k
    """,
    tags=("timeseries", "diagnostics", "exact-arith"),
)
def q_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on daily revenue, lags 1..7:
    Q(m) = n(n+2) * sum_{{k<=m}} rho_k^2/(n-k). The ACF numerators fold
    u_t = n*x_t - S (exact integers; the 1/n^2 cancels in the rho
    ratio), so both engines divide identical integers; the cumulative
    Q is a 7-term double prefix sum in deterministic lag order
    (explicit ROWS frame). Emits the per-lag rho and the running Q --
    the row at lag m IS the Q(m) statistic (chi2_m under whiteness)."""
    s = _daily_indexed(spark, sf_dir)
    tot = s.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("sm"),
    )
    u = s.crossJoin(F.broadcast(tot)).select(
        "rn",
        "n",
        (F.col("cents").cast(_DEC) * F.col("n") - F.col("sm")).alias("u"),
    )
    lagged = u.select(
        "rn", "u", F.explode(F.array(*[F.lit(k) for k in range(0, 8)])).alias("lag_k")
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
        .crossJoin(F.broadcast(tot.select(F.col("n").cast("double").alias("nd"))))
        .select(
            "lag_k",
            (F.col("gk").cast("double") / F.col("g0").cast("double")).alias("r"),
            "nd",
        )
    )
    w = Window.orderBy("lag_k").rowsBetween(Window.unboundedPreceding, 0)
    return rho.select(
        F.col("lag_k").cast("integer").alias("lag_k"),
        (F.round(F.col("r"), 6) + F.lit(0.0)).alias("rho"),
        F.round(
            F.col("nd")
            * (F.col("nd") + 2)
            * F.sum(F.col("r") * F.col("r") / (F.col("nd") - F.col("lag_k"))).over(w),
            6,
        ).alias("q_stat"),
    ).orderBy("lag_k")


@register(
    "variance_ratio_test",
    f"""
    WITH {_DAILY_SQL},
    y AS (
      SELECT rn, CAST(cents AS HUGEINT) AS x,
             sum(CAST(cents AS HUGEINT)) OVER (ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS y2,
             count(*) OVER (ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS c2,
             sum(CAST(cents AS HUGEINT)) OVER (ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS y5,
             count(*) OVER (ORDER BY rn
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS c5
      FROM s),
    agg AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(x * x) AS sxx,
             sum(CASE WHEN c2 = 2 THEN y2 END) AS sy2,
             sum(CASE WHEN c2 = 2 THEN y2 * y2 END) AS syy2,
             CAST(sum(CASE WHEN c2 = 2 THEN 1 END) AS HUGEINT) AS m2,
             sum(CASE WHEN c5 = 5 THEN y5 END) AS sy5,
             sum(CASE WHEN c5 = 5 THEN y5 * y5 END) AS syy5,
             CAST(sum(CASE WHEN c5 = 5 THEN 1 END) AS HUGEINT) AS m5
      FROM y),
    rows_q AS (
      SELECT 2 AS q, sy2 AS sy, syy2 AS syy, m2 AS m, n, sx, sxx FROM agg
      UNION ALL
      SELECT 5 AS q, sy5 AS sy, syy5 AS syy, m5 AS m, n, sx, sxx FROM agg)
    SELECT CAST(q AS INTEGER) AS q,
           CAST(n AS BIGINT) AS n_days,
           round(CAST((m * syy - sy * sy) * n * (n - 1) AS DOUBLE)
                 / CAST(q * (n * sxx - sx * sx) * m * (m - 1) AS DOUBLE), 6)
             AS vr,
           round((CAST((m * syy - sy * sy) * n * (n - 1) AS DOUBLE)
                  / CAST(q * (n * sxx - sx * sx) * m * (m - 1) AS DOUBLE) - 1.0)
                 / sqrt(2.0 * (2 * q - 1) * (q - 1)
                        / (3.0 * q * CAST(n AS DOUBLE))), 6) + 0.0 AS z_stat
    FROM rows_q
    ORDER BY q
    """,
    tags=("timeseries", "diagnostics", "exact-arith"),
)
def q_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test at horizons q=2 and q=5 on
    daily revenue increments: VR(q) = Var(overlapping q-day sums) /
    (q * Var(1-day)). Under i.i.d. increments VR=1; VR>1 flags
    positive persistence (momentum in spend), VR<1 mean reversion.
    Both sample variances are assembled from exact integer sufficient
    statistics (one HUGEINT/DECIMAL(38,0) expression each), so the
    ratio is ONE double division; z is the homoskedastic asymptotic
    z = (VR-1)/sqrt(2(2q-1)(q-1)/(3qn)). The overlapping q-sums are
    forward ROWS frames on the day index (complete windows only,
    via the frame count)."""
    s = _daily_indexed(spark, sf_dir)
    wb = Window.orderBy("rn")
    y = s.select(
        F.col("cents").cast(_DEC).alias("x"),
        F.sum(F.col("cents").cast(_DEC)).over(wb.rowsBetween(0, 1)).alias("y2"),
        F.count(F.lit(1)).over(wb.rowsBetween(0, 1)).alias("c2"),
        F.sum(F.col("cents").cast(_DEC)).over(wb.rowsBetween(0, 4)).alias("y5"),
        F.count(F.lit(1)).over(wb.rowsBetween(0, 4)).alias("c5"),
    )
    agg = y.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast(_DEC).alias("sxx"),
        F.sum(F.when(F.col("c2") == 2, F.col("y2"))).cast(_DEC).alias("sy2"),
        F.sum(F.when(F.col("c2") == 2, F.col("y2") * F.col("y2")))
        .cast(_DEC)
        .alias("syy2"),
        F.sum(F.when(F.col("c2") == 2, F.lit(1))).cast(_DEC).alias("m2"),
        F.sum(F.when(F.col("c5") == 5, F.col("y5"))).cast(_DEC).alias("sy5"),
        F.sum(F.when(F.col("c5") == 5, F.col("y5") * F.col("y5")))
        .cast(_DEC)
        .alias("syy5"),
        F.sum(F.when(F.col("c5") == 5, F.lit(1))).cast(_DEC).alias("m5"),
    )
    rows_q = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(2).alias("q"),
                    F.col("sy2").alias("sy"),
                    F.col("syy2").alias("syy"),
                    F.col("m2").alias("m"),
                ),
                F.struct(
                    F.lit(5).alias("q"),
                    F.col("sy5").alias("sy"),
                    F.col("syy5").alias("syy"),
                    F.col("m5").alias("m"),
                ),
            )
        ).alias("e"),
        "n",
        "sx",
        "sxx",
    ).select("e.q", "e.sy", "e.syy", "e.m", "n", "sx", "sxx")
    num = (
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
        * F.col("n")
        * (F.col("n") - 1)
    ).cast("double")
    den = (
        F.col("q")
        * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.col("m")
        * (F.col("m") - 1)
    ).cast("double")
    vr = num / den
    nd = F.col("n").cast("double")
    se = F.sqrt(
        F.lit(2.0)
        * (2 * F.col("q") - 1)
        * (F.col("q") - 1)
        / (F.lit(3.0) * F.col("q") * nd)
    )
    return rows_q.select(
        F.col("q").cast("integer").alias("q"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(vr, 6).alias("vr"),
        (F.round((vr - 1.0) / se, 6) + F.lit(0.0)).alias("z_stat"),
    ).orderBy("q")


@register(
    "kpss_stationarity",
    f"""
    WITH {_DAILY_SQL},
    lsel AS (
      SELECT n, sm,
             CAST(floor(4.0 * sqrt(sqrt(CAST(n AS DOUBLE) / 100.0)))
                  AS BIGINT) AS l
      FROM tot),
    base AS (
      SELECT s.rn, t.n, t.sm,
             CAST(s.cents AS HUGEINT) * t.n - t.sm AS u,
             sum(CAST(s.cents AS HUGEINT)) OVER (ORDER BY s.rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM s CROSS JOIN tot t),
    tsum AS (
      SELECT sum((n * p - CAST(rn AS HUGEINT) * sm)
                 * (n * p - CAST(rn AS HUGEINT) * sm)) AS t2
      FROM base),
    lagged AS (
      SELECT b.rn, b.u, j.lag_j
      FROM base b CROSS JOIN
        (SELECT unnest(range(0, (SELECT l FROM lsel) + 1)) AS lag_j) j),
    g AS (
      SELECT a.lag_j, sum(a.u * b.u) AS gj
      FROM lagged a JOIN base b ON b.rn = a.rn - a.lag_j
      GROUP BY a.lag_j),
    den AS (
      SELECT sum(CASE WHEN g.lag_j = 0 THEN (l.l + 1) * g.gj
                      ELSE 2 * (l.l + 1 - g.lag_j) * g.gj END) AS d_inner
      FROM g CROSS JOIN lsel l)
    SELECT CAST(t.n AS BIGINT) AS n_days,
           CAST(l.l AS INTEGER) AS bandwidth_l,
           round(CAST((l.l + 1) * ts.t2 AS DOUBLE)
                 / CAST(t.n * d.d_inner AS DOUBLE), 6) AS kpss_eta,
           (CAST((l.l + 1) * ts.t2 AS DOUBLE)
              / CAST(t.n * d.d_inner AS DOUBLE)) > 0.463 AS reject_5pct
    FROM tot t CROSS JOIN lsel l CROSS JOIN tsum ts CROSS JOIN den d
    """,
    tags=("timeseries", "diagnostics", "exact-arith"),
)
def q_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity statistic on daily revenue:
    eta = n^-2 sum_t S_t^2 / lrv, with S_t the demeaned partial sums
    and lrv the Bartlett long-run variance at the standard bandwidth
    l = floor(4*(n/100)^(1/4)) (computed as sqrt(sqrt()) so both
    engines floor the identical double). Clearing denominators:
    eta = (l+1)*sum((n*P_t - t*S)^2) / (n * [(l+1)*G_0 +
    2*sum_j (l+1-j)*G_j]) with G_j = sum u_t*u_{{t-j}}, u = n*x - S --
    every term EXACT in DECIMAL(38,0), one double division at the end.
    reject_5pct compares against the 0.463 level-stationarity critical
    value. The lag spine is a dynamic 0..l explode joined back on the
    day index (equi-join, no nested loop on data rows)."""
    s = _daily_indexed(spark, sf_dir)
    tot = s.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("cents").cast(_DEC).alias("sm"),
    )
    lsel = tot.select(
        "n",
        "sm",
        F.floor(
            F.lit(4.0) * F.sqrt(F.sqrt(F.col("n").cast("double") / 100.0))
        )
        .cast("bigint")
        .alias("l"),
    )
    wp = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    base = s.crossJoin(F.broadcast(tot)).select(
        "rn",
        "n",
        "sm",
        (F.col("cents").cast(_DEC) * F.col("n") - F.col("sm")).alias("u"),
        F.sum(F.col("cents").cast(_DEC)).over(wp).alias("p"),
    )
    st = (F.col("n") * F.col("p") - F.col("rn").cast(_DEC) * F.col("sm")).alias(
        "st"
    )
    tsum = base.select(st).agg(
        F.sum(F.col("st") * F.col("st")).cast(_DEC).alias("t2")
    )
    lags = lsel.select(
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("l"))).alias("lag_j")
    )
    lagged = base.select("rn", "u").crossJoin(F.broadcast(lags))
    a = lagged.alias("a")
    b = base.select("rn", "u").alias("b")
    g = (
        a.join(b, F.col("b.rn") == F.col("a.rn") - F.col("a.lag_j"))
        .groupBy(F.col("a.lag_j").alias("lag_j"))
        .agg(F.sum(F.col("a.u") * F.col("b.u")).cast(_DEC).alias("gj"))
    )
    den = (
        g.crossJoin(F.broadcast(lsel.select("l")))
        .select(
            F.when(
                F.col("lag_j") == 0, (F.col("l") + 1).cast(_DEC) * F.col("gj")
            )
            .otherwise(
                F.lit(2).cast(_DEC)
                * (F.col("l") + 1 - F.col("lag_j")).cast(_DEC)
                * F.col("gj")
            )
            .alias("term")
        )
        .agg(F.sum("term").cast(_DEC).alias("d_inner"))
    )
    eta = ((F.col("l") + 1).cast(_DEC) * F.col("t2")).cast("double") / (
        F.col("n") * F.col("d_inner")
    ).cast("double")
    return (
        tot.select("n")
        .crossJoin(F.broadcast(lsel.select("l")))
        .crossJoin(F.broadcast(tsum))
        .crossJoin(F.broadcast(den))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("l").cast("integer").alias("bandwidth_l"),
            F.round(eta, 6).alias("kpss_eta"),
            (eta > 0.463).alias("reject_5pct"),
        )
    )
