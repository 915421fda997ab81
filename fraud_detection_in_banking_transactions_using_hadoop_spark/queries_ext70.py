"""Extension batch 70: instrumental-variable Wald estimate,
Oaxaca-Blinder gap decomposition, daily Sharpe/Sortino + underwater
duration, and Erlang-C staffing.

Scale notes (the 100 TB story per query):
- iv_wald_estimate: the simplest causal-IV shape -- a binary
  instrument (customer-nation parity) shifting exposure (>=5%
  discount), outcome = return flag. Wald = reduced-form / first-stage
  difference, all four cell means from exact integer counts; one
  grouped aggregate over the 3-table join.
- oaxaca_blinder_gap: decomposes the open-vs-finished unit-price
  gap into the part explained by quantity composition (at pooled OLS
  coefficients) and the unexplained remainder. Three OLS fits (two
  groups + pooled) each close over exact HUGEINT sufficient
  statistics; every double is derived from identical integers.
- sharpe_sortino_daily: risk-adjusted quality of the daily revenue
  'returns' (day-over-day log returns, e9-int terms): annualized
  Sharpe, Sortino (downside-only deviation), plus the longest
  underwater spell (days since the running peak) -- the duration
  companion to max_drawdown. Series windows are CALENDAR class.
- erlang_c_staffing: events arrivals per hour + a fixed 180 s service
  time give the offered load A; Erlang C over a constant 1..20 agent
  grid (k! as exact integer literals, cumulative term sums) yields the
  wait probability per c and the minimum c meeting a 20% target. The
  grid is constant -- the only data-dependent input is the arrival
  rate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_SERVICE_SEC = 180.0
_ERLANG_MAX_C = 20
_FACTS = [math.factorial(k) for k in range(_ERLANG_MAX_C + 1)]


# ---------------------------------------------------------------------------
# Instrumental-variable Wald estimator.
# ---------------------------------------------------------------------------
@register(
    "iv_wald_estimate",
    """
    WITH base AS (
      SELECT c.c_nationkey % 2 AS z,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS x,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey),
    arms AS (
      SELECT z, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM base GROUP BY z),
    wide AS (
      SELECT max(CASE WHEN z = 0 THEN n END) AS n0,
             max(CASE WHEN z = 0 THEN sx END) AS sx0,
             max(CASE WHEN z = 0 THEN sy END) AS sy0,
             max(CASE WHEN z = 1 THEN n END) AS n1,
             max(CASE WHEN z = 1 THEN sx END) AS sx1,
             max(CASE WHEN z = 1 THEN sy END) AS sy1
      FROM arms)
    SELECT n0, n1,
           round(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0, 6)
             AS reduced_form,
           round(CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0, 6)
             AS first_stage,
           round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                 / (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0), 6)
             AS wald_iv
    FROM wide
    """,
    tags=("causal", "iv", "exact-arith"),
)
def q_iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald IV: with nation parity as the (synthetic) instrument, the
    causal effect of discount exposure on returns is the reduced-form
    outcome difference over the first-stage exposure difference. All
    four means close over exact integer counts from one grouped pass;
    a weak first stage shows up as a tiny denominator -- exactly what
    the estimate's magnitude reports."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cst = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cst), o.o_custkey == cst.c_custkey)
        .select(
            (F.col("c_nationkey") % 2).alias("z"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("x"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
    )
    arms = base.groupBy("z").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    wide = arms.agg(
        *[
            F.max(F.when(F.col("z") == z, F.col(c))).alias(f"{c}{z}")
            for z in (0, 1)
            for c in ("n", "sx", "sy")
        ]
    )
    p = lambda c, z: F.col(f"{c}{z}").cast("double") / F.col(f"n{z}")  # noqa: E731
    rf = p("sy", 1) - p("sy", 0)
    fs = p("sx", 1) - p("sx", 0)
    return wide.select(
        "n0",
        "n1",
        F.round(rf, 6).alias("reduced_form"),
        F.round(fs, 6).alias("first_stage"),
        F.round(rf / fs, 6).alias("wald_iv"),
    )


# ---------------------------------------------------------------------------
# Oaxaca-Blinder decomposition of the open-vs-finished unit-price gap.
# ---------------------------------------------------------------------------
_OB_STATS = """
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS sq,
             CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq,
             CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS su,
             CAST(sum(CAST(q AS HUGEINT) * u) AS HUGEINT) AS squ
"""


@register(
    "oaxaca_blinder_gap",
    f"""
    WITH base AS (
      SELECT CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS g,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(100 * l_extendedprice / l_quantity, 0) AS BIGINT) AS u
      FROM lineitem WHERE l_quantity > 0),
    sa AS ({_OB_STATS} FROM base WHERE g = 1),
    sb AS ({_OB_STATS} FROM base WHERE g = 0),
    sp AS ({_OB_STATS} FROM base),
    fit AS (
      SELECT
        (CAST(sp.n AS DOUBLE) * sp.squ - CAST(sp.sq AS DOUBLE) * sp.su)
          / (CAST(sp.n AS DOUBLE) * sp.sqq - CAST(sp.sq AS DOUBLE) * sp.sq)
          AS b_pool,
        CAST(sa.su AS DOUBLE) / sa.n AS ya, CAST(sb.su AS DOUBLE) / sb.n AS yb,
        CAST(sa.sq AS DOUBLE) / sa.n AS xa, CAST(sb.sq AS DOUBLE) / sb.n AS xb,
        sa.n AS n_open, sb.n AS n_other
      FROM sa CROSS JOIN sb CROSS JOIN sp)
    SELECT n_open, n_other,
           round(ya - yb, 6) AS total_gap_cents,
           round(b_pool * (xa - xb), 6) AS explained_cents,
           round((ya - yb) - b_pool * (xa - xb), 6) AS unexplained_cents,
           round(b_pool, 6) AS pooled_slope
    FROM fit
    """,
    tags=("econ", "decomposition", "exact-arith"),
)
def q_oaxaca_blinder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why do open-status lines realize different unit prices? The
    two-fold Oaxaca-Blinder split: explained = pooled-OLS slope times
    the quantity-composition gap; unexplained = the remainder (pricing
    differences at equal composition). All sufficient statistics exact
    HUGEINT; unit price is the per-line cents ratio rounded once."""
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    base = li.select(
        F.when(F.col("l_linestatus") == "O", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(100 * F.col("l_extendedprice") / F.col("l_quantity"), 0)
        .cast("bigint")
        .alias("u"),
    )

    def stats(df: DataFrame, suffix: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n{suffix}"),
            F.sum(F.col("q").cast(_DEC)).cast(_DEC).alias(f"sq{suffix}"),
            F.sum(F.col("q").cast(_DEC) * F.col("q").cast(_DEC)).cast(_DEC).alias(f"sqq{suffix}"),
            F.sum(F.col("u").cast(_DEC)).cast(_DEC).alias(f"su{suffix}"),
            F.sum(F.col("q").cast(_DEC) * F.col("u").cast(_DEC)).cast(_DEC).alias(f"squ{suffix}"),
        )

    sa = stats(base.where(F.col("g") == 1), "a")
    sb = stats(base.where(F.col("g") == 0), "b")
    sp = stats(base, "p")
    fit = sa.crossJoin(F.broadcast(sb)).crossJoin(F.broadcast(sp))
    npd = F.col("np").cast("double")
    b_pool = (
        npd * F.col("squp").cast("double") - F.col("sqp").cast("double") * F.col("sup").cast("double")
    ) / (
        npd * F.col("sqqp").cast("double") - F.col("sqp").cast("double") * F.col("sqp").cast("double")
    )
    ya = F.col("sua").cast("double") / F.col("na")
    yb = F.col("sub").cast("double") / F.col("nb")
    xa = F.col("sqa").cast("double") / F.col("na")
    xb = F.col("sqb").cast("double") / F.col("nb")
    return fit.select(
        F.col("na").alias("n_open"),
        F.col("nb").alias("n_other"),
        F.round(ya - yb, 6).alias("total_gap_cents"),
        F.round(b_pool * (xa - xb), 6).alias("explained_cents"),
        F.round((ya - yb) - b_pool * (xa - xb), 6).alias("unexplained_cents"),
        F.round(b_pool, 6).alias("pooled_slope"),
    )


# ---------------------------------------------------------------------------
# Sharpe / Sortino of daily revenue log-returns + underwater duration.
# ---------------------------------------------------------------------------
@register(
    "sharpe_sortino_daily",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    seq AS (
      SELECT dt, x, lag(x) OVER (ORDER BY dt) AS px,
             max(x) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM d),
    rets AS (
      SELECT CAST(round(1e9 * ln(CAST(x AS DOUBLE) / px), 0) AS BIGINT) AS r_e9
      FROM seq WHERE px IS NOT NULL AND px > 0),
    spells AS (
      SELECT dt, CASE WHEN x < peak THEN 0 ELSE 1 END AS at_peak,
             sum(CASE WHEN x < peak THEN 0 ELSE 1 END) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM seq),
    uw AS (
      SELECT CAST(coalesce(max(cnt), 0) AS BIGINT) AS max_underwater_days
      FROM (SELECT grp, count(*) - max(at_peak) AS cnt
            FROM spells GROUP BY grp) t),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r_e9) AS HUGEINT) AS s1,
             CAST(sum(CAST(r_e9 AS HUGEINT) * r_e9) AS HUGEINT) AS s2,
             CAST(sum(CASE WHEN r_e9 < 0
                  THEN CAST(r_e9 AS HUGEINT) * r_e9 ELSE 0 END) AS HUGEINT) AS sneg
      FROM rets)
    SELECT mom.n AS n_returns,
           round(CAST(s1 AS DOUBLE) / n / 1e9, 6) + 0.0 AS mean_logret,
           -- mean/std is scale-free: both stay in e9 units
           round((CAST(s1 AS DOUBLE) / n)
                 / sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                        / (CAST(n AS DOUBLE) * n)) * sqrt(365.0), 6) + 0.0
             AS sharpe_annual,
           round((CAST(s1 AS DOUBLE) / n)
                 / sqrt(CAST(sneg AS DOUBLE) / n) * sqrt(365.0), 6) + 0.0
             AS sortino_annual,
           uw.max_underwater_days
    FROM mom CROSS JOIN uw
    """,
    tags=("timeseries", "finance", "exact-arith"),
)
def q_sharpe_sortino_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk-adjusted stability of daily revenue: day-over-day log
    returns as e9 integers (order-free moments), annualized Sharpe
    (population std) and Sortino (downside second moment about zero),
    plus the longest underwater spell -- consecutive days below the
    running peak, counted with the gaps-and-islands grp = cumulative
    count of at-peak days. All windows run over the CALENDAR daily
    series."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    wd = Window.orderBy("dt")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    seq = d.select(
        "dt",
        "x",
        F.lag("x").over(wd).alias("px"),
        F.max("x").over(wcum).alias("peak"),
    )
    rets = seq.where(F.col("px").isNotNull() & (F.col("px") > 0)).select(
        F.round(F.lit(1e9) * F.log(F.col("x").cast("double") / F.col("px")), 0)
        .cast("bigint")
        .alias("r_e9")
    )
    at_peak = F.when(F.col("x") < F.col("peak"), 0).otherwise(1)
    spells = seq.select(
        "dt", at_peak.alias("at_peak"), F.sum(at_peak).over(wcum).alias("grp")
    )
    uw = (
        spells.groupBy("grp")
        .agg((F.count(F.lit(1)) - F.max("at_peak")).alias("cnt"))
        .agg(F.coalesce(F.max("cnt"), F.lit(0)).cast("bigint").alias(
            "max_underwater_days"
        ))
    )
    mom = rets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r_e9").cast(_DEC).alias("s1"),
        F.sum(F.col("r_e9").cast(_DEC) * F.col("r_e9").cast(_DEC)).cast(_DEC).alias("s2"),
        F.sum(
            F.when(
                F.col("r_e9") < 0, F.col("r_e9").cast(_DEC) * F.col("r_e9").cast(_DEC)
            ).otherwise(F.lit(0).cast(_DEC))
        )
        .cast(_DEC)
        .alias("sneg"),
    )
    nd = F.col("n").cast("double")
    mean_e9 = F.col("s1").cast("double") / nd  # e9 units
    std_e9 = F.sqrt(
        (nd * F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double"))
        / (nd * nd)
    )
    dstd_e9 = F.sqrt(F.col("sneg").cast("double") / nd)
    ann = F.sqrt(F.lit(365.0))
    # mean/std is scale-free, so the e9 units cancel exactly
    return mom.crossJoin(F.broadcast(uw)).select(
        F.col("n").alias("n_returns"),
        (F.round(mean_e9 / 1e9, 6) + 0.0).alias("mean_logret"),
        (F.round(mean_e9 / std_e9 * ann, 6) + 0.0).alias("sharpe_annual"),
        (F.round(mean_e9 / dstd_e9 * ann, 6) + 0.0).alias("sortino_annual"),
        "max_underwater_days",
    )


# ---------------------------------------------------------------------------
# Erlang-C staffing from the observed arrival rate.
# ---------------------------------------------------------------------------
_FACT_LIST = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800, 39916800, 479001600, 6227020800, 87178291200, 1307674368000, 20922789888000, 355687428096000, 6402373705728000, 121645100408832000, 2432902008176640000]


@register(
    "erlang_c_staffing",
    f"""
    WITH rate AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             count(*) / ((CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS DOUBLE))
                         / 3600000000.0) AS per_hour
      FROM events),
    ld AS (
      SELECT n_events, per_hour, per_hour * {_SERVICE_SEC} / 3600.0 AS a
      FROM rate),
    kf AS (
      SELECT unnest(range(0, {_ERLANG_MAX_C + 1})) AS k,
             unnest(ARRAY[{', '.join(str(f) for f in _FACT_LIST)}]) AS fk),
    grid AS (SELECT unnest(range(1, {_ERLANG_MAX_C + 1})) AS c),
    s AS (
      SELECT g.c, l.a, l.n_events, l.per_hour,
             sum(pow(l.a, kf.k) / kf.fk) AS s_c
      FROM ld l CROSS JOIN grid g JOIN kf ON kf.k < g.c
      GROUP BY g.c, l.a, l.n_events, l.per_hour),
    ec AS (
      SELECT s.c, s.a, s.n_events, s.per_hour,
             CASE WHEN s.a >= s.c THEN 1.0
                  ELSE (pow(s.a, s.c) / kf.fk * (s.c / (s.c - s.a)))
                       / (s.s_c + pow(s.a, s.c) / kf.fk * (s.c / (s.c - s.a)))
             END AS wait_prob
      FROM s JOIN kf ON kf.k = s.c)
    SELECT n_events,
           round(per_hour, 6) AS arrivals_per_hour,
           round(a, 6) AS offered_erlangs,
           CAST(min(CASE WHEN wait_prob <= 0.2 THEN c END) AS INTEGER)
             AS agents_for_20pct,
           -- Erlang C is DECREASING in c, so the max over the
           -- qualifying set is the probability at the minimal c
           round(max(CASE WHEN wait_prob <= 0.2 THEN wait_prob END), 6)
             AS wait_prob_at_min
    FROM ec GROUP BY n_events, per_hour, a
    """,
    tags=("ops", "queueing", "staffing"),
)
def q_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many concurrent reviewers does the event stream need?
    Arrival rate from the observed span (integer microseconds), offered
    load A = rate x 180 s service time, Erlang-C wait probability over
    a constant 1..20 agent grid with k! inlined as exact integer
    literals -- the minimum c with P(wait) <= 20% is the staffing
    answer. Only the (tiny) rate aggregate touches data.

    wait_prob_at_min is the probability AT the chosen c: Erlang C is
    DECREASING in c, so the maximum over the qualifying set is the
    value at the smallest qualifying c (the first formulation used
    min() and silently reported c=20's probability -- caught by the
    invariant test's literal recomputation)."""
    ev = read_table(spark, sf_dir, "events")
    rate = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.count(F.lit(1))
            / (
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).cast("double")
                / 3600000000.0
            )
        ).alias("per_hour"),
    )
    ld = rate.select(
        "n_events", "per_hour", (F.col("per_hour") * _SERVICE_SEC / 3600.0).alias("a")
    )
    kf = F.posexplode(F.array(*[F.lit(float(f)) for f in _FACT_LIST])).alias("k", "fk")
    kf_df = ld.sparkSession.range(1).select(kf)
    grid = ld.sparkSession.range(1, _ERLANG_MAX_C + 1).select(
        F.col("id").cast("int").alias("c")
    )
    s = (
        ld.crossJoin(F.broadcast(grid))
        .join(F.broadcast(kf_df), F.col("k") < F.col("c"))
        .groupBy("c", "a", "n_events", "per_hour")
        .agg(F.sum(F.pow(F.col("a"), F.col("k")) / F.col("fk")).alias("s_c"))
    )
    ec = s.join(F.broadcast(kf_df), F.col("k") == F.col("c")).select(
        "c",
        "a",
        "n_events",
        "per_hour",
        F.when(F.col("a") >= F.col("c"), F.lit(1.0))
        .otherwise(
            (F.pow("a", "c") / F.col("fk") * (F.col("c") / (F.col("c") - F.col("a"))))
            / (
                F.col("s_c")
                + F.pow("a", "c") / F.col("fk") * (F.col("c") / (F.col("c") - F.col("a")))
            )
        )
        .alias("wait_prob"),
    )
    return ec.groupBy("n_events", "per_hour", "a").agg(
        F.min(F.when(F.col("wait_prob") <= 0.2, F.col("c"))).cast("int").alias(
            "agents_for_20pct"
        ),
        # Erlang C decreases in c: max over the qualifying set = the
        # probability at the minimal qualifying c
        F.round(
            F.max(F.when(F.col("wait_prob") <= 0.2, F.col("wait_prob"))), 6
        ).alias("wait_prob_at_min"),
    ).select(
        "n_events",
        F.round("per_hour", 6).alias("arrivals_per_hour"),
        F.round("a", 6).alias("offered_erlangs"),
        "agents_for_20pct",
        "wait_prob_at_min",
    )
