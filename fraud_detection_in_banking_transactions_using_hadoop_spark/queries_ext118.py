"""Extension batch 118 (round 6): queueing/ops analytics -- Erlang B
blocking over a server grid, a Little's-law consistency check on a
clamped observation window, and Croston intermittent-demand
forecasting with the Syntetos-Boylan correction.

Scale notes (the 100 TB story):
- erlang_b_blocking: the offered load reduces to ONE exact rational
  (purchases / (10 * observed-hours)); the (c, k) factorial grid is a
  constant 230-row broadcast, each log-space term is an e8-rounded
  integer before exp (the kaplan-meier float rule), and the blocking
  probabilities close per c with one sum -- no recursion, no driver
  math, data touched once.
- littles_law_window: reuses the +-1 boundary-delta sweep
  (concurrency_time_percentiles) to integrate the open-order level
  over a DYNAMICALLY anchored one-year window, and compares
  L_timeavg against lambda * W-bar computed from window-STARTING
  spans only. The two differ exactly by window-edge-crossing spans,
  so the ratio is a data-quality number, not an identity (computing
  both from the same spans would be vacuously 1).
- croston_intermittent: rare big-ticket days form the intermittent
  series; the last-65 nonzero days (ordered LIMIT -> bounded rows)
  carry both SES recursions via the ewma prefix-sum unroll -- the
  bounded window keeps r^-i inside double range by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_MAX_C = 20
_SERVICE_MIN = 6  # fixed mean service time (minutes) for the load model
_CROSTON_ALPHA = 0.2
_CROSTON_W = 65  # last-K nonzero days (64 intervals)
_BIG_TICKET = 450000.0

# ln(k!) for k = 0.._MAX_C as exact python-computed literals shared by
# both engines (constant grid, no cross-engine libm involved)
_LNFACT = [0.0]
for _k in range(1, _MAX_C + 1):
    _LNFACT.append(_LNFACT[-1] + math.log(_k))


def _lnfact_values_sql() -> str:
    rows = ", ".join(f"({k}, {_LNFACT[k]!r})" for k in range(_MAX_C + 1))
    return f"(VALUES {rows}) lf(k, lnf)"


@register(
    "erlang_b_blocking",
    f"""
    WITH load AS (
      SELECT CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS purchases,
             CAST(count(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS hours
      FROM events),
    a AS (
      SELECT purchases, hours,
             ln(CAST(purchases AS DOUBLE) / (10 * hours)) AS ln_a
      FROM load),
    grid AS (
      SELECT c.c, lf.k, lf.lnf
      FROM (SELECT unnest(range(1, {_MAX_C + 1})) AS c) c
      JOIN {_lnfact_values_sql()} ON lf.k <= c.c),
    terms AS (
      SELECT g.c, g.k,
             CAST(round(100000000.0 * (g.k * a.ln_a - g.lnf), 0) AS BIGINT)
               AS t_e8
      FROM grid g CROSS JOIN a),
    tops AS (
      SELECT c, t_e8 AS top_e8 FROM terms WHERE k = c),
    blocked AS (
      SELECT t.c,
             1.0 / sum(exp((t.t_e8 - tp.top_e8) / 100000000.0)) AS b
      FROM terms t JOIN tops tp ON tp.c = t.c
      GROUP BY t.c)
    SELECT b.c AS servers,
           (SELECT round(CAST(purchases AS DOUBLE) / (10 * hours), 6)
            FROM load) AS offered_erlangs,
           round(b.b, 6) AS p_block,
           round((SELECT CAST(purchases AS DOUBLE) / (10 * hours) FROM load)
                 * (1 - b.b), 6) AS carried_erlangs
    FROM blocked b ORDER BY b.c
    """,
    tags=("ops", "queueing", "erlang"),
)
def q_erlang_b_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang B blocking probability B(c, a) for c = 1..20 servers at
    the measured purchase load (a = purchases / (10 * observed hours):
    arrivals/hour x 6-minute mean service). B = (a^c/c!) /
    sum_k a^k/k!, evaluated in log space with e8-rounded integer
    exponents and normalized by the top term, so the per-c sum has
    <= c+1 well-conditioned exp() calls -- the loss-system sizing
    curve (no queueing) that complements erlang_c_staffing's
    wait-system answer."""
    ev = read_table(spark, sf_dir, "events")
    load = ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("purchases"),
        F.countDistinct(F.date_trunc("hour", "ts")).cast("bigint").alias("hours"),
    )
    a = load.select(
        "purchases",
        "hours",
        F.log(F.col("purchases").cast("double") / (10 * F.col("hours"))).alias("ln_a"),
    )
    lf = spark.createDataFrame(
        [(k, _LNFACT[k]) for k in range(_MAX_C + 1)], "k int, lnf double"
    )
    cs = spark.range(1, _MAX_C + 1).select(F.col("id").cast("int").alias("c"))
    grid = cs.join(F.broadcast(lf), lf.k <= cs.c)
    terms = grid.crossJoin(F.broadcast(a)).select(
        "c",
        "k",
        F.round(
            F.lit(100000000.0) * (F.col("k") * F.col("ln_a") - F.col("lnf")), 0
        )
        .cast("bigint")
        .alias("t_e8"),
    )
    tops = terms.where(F.col("k") == F.col("c")).select(
        "c", F.col("t_e8").alias("top_e8")
    )
    blocked = (
        terms.join(F.broadcast(tops), "c")
        .groupBy("c")
        .agg(
            (
                F.lit(1.0)
                / F.sum(
                    F.exp((F.col("t_e8") - F.col("top_e8")) / F.lit(100000000.0))
                )
            ).alias("b")
        )
    )
    erl = F.col("purchases").cast("double") / (10 * F.col("hours"))
    return (
        blocked.crossJoin(F.broadcast(load))
        .select(
            F.col("c").alias("servers"),
            F.round(erl, 6).alias("offered_erlangs"),
            F.round(F.col("b"), 6).alias("p_block"),
            F.round(erl * (1 - F.col("b")), 6).alias("carried_erlangs"),
        )
        .orderBy("servers")
    )


# ---------------------------------------------------------------------------
# Little's law on a clamped one-year window.
# ---------------------------------------------------------------------------
@register(
    "littles_law_window",
    """
    WITH spans AS (
      SELECT o.o_orderdate AS st, max(l.l_shipdate) AS en
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING max(l.l_shipdate) > o.o_orderdate),
    win AS (
      SELECT make_date(CAST(max(date_part('year', st)) AS INTEGER) - 4, 1, 1)
               AS w0,
             make_date(CAST(max(date_part('year', st)) AS INTEGER) - 3, 1, 1)
               AS w1
      FROM spans),
    bounds AS (
      SELECT st AS d, CAST(1 AS BIGINT) AS delta FROM spans
      UNION ALL SELECT en, CAST(-1 AS BIGINT) FROM spans),
    daily AS (SELECT d, CAST(sum(delta) AS BIGINT) AS dd FROM bounds GROUP BY d),
    lvl AS (
      SELECT d AS s0, lead(d) OVER (ORDER BY d) AS s1,
             sum(dd) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level
      FROM daily),
    clipped AS (
      SELECT CAST(sum(level * greatest(0, date_diff('day',
               greatest(s0, w.w0), least(s1, w.w1)))) AS BIGINT) AS area,
             CAST(date_diff('day', w.w0, w.w1) AS BIGINT) AS t_days
      FROM lvl CROSS JOIN win w
      WHERE s1 IS NOT NULL
      GROUP BY t_days),
    arr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_arr,
             CAST(sum(date_diff('day', st, en)) AS BIGINT) AS tot_w
      FROM spans CROSS JOIN win w
      WHERE st >= w.w0 AND st < w.w1)
    SELECT (SELECT CAST(date_part('year', w0) AS BIGINT) FROM win) AS window_year,
           c.t_days, a.n_arr,
           round(CAST(c.area AS DOUBLE) / c.t_days, 6) AS l_timeavg,
           round(CAST(a.n_arr AS DOUBLE) / c.t_days, 6) AS lambda_per_day,
           round(CAST(a.tot_w AS DOUBLE) / a.n_arr, 6) AS w_mean_days,
           round((CAST(a.n_arr AS DOUBLE) / c.t_days)
                 * (CAST(a.tot_w AS DOUBLE) / a.n_arr)
                 / (CAST(c.area AS DOUBLE) / c.t_days), 6) AS littles_ratio
    FROM clipped c CROSS JOIN arr a
    """,
    tags=("ops", "queueing", "exact-arith"),
)
def q_littles_law_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law L = lambda * W audited on a one-year window
    (anchored max-order-year - 4, per the dynamic-anchor rule): L is
    the exact time-average of simultaneously-open orders from the
    boundary-delta sweep clipped to the window; lambda and W-bar come
    from spans STARTING in the window. The ratio deviates from 1
    exactly by edge-crossing spans (work started before/after the
    window), so it measures whether the system was in steady state --
    the first sanity check of any queueing analysis."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("en"))
        .where(F.col("en") > F.col("o_orderdate"))
        .select(F.col("o_orderdate").alias("st"), "en")
    )
    win = spans.agg(
        F.make_date(F.max(F.year("st")) - 4, F.lit(1), F.lit(1)).alias("w0"),
        F.make_date(F.max(F.year("st")) - 3, F.lit(1), F.lit(1)).alias("w1"),
    )
    bounds = spans.select(
        F.col("st").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        spans.select(F.col("en").alias("d"), F.lit(-1).cast("bigint").alias("delta"))
    )
    daily = bounds.groupBy("d").agg(F.sum("delta").cast("bigint").alias("dd"))
    w = Window.orderBy("d")
    lvl = daily.select(
        F.col("d").alias("s0"),
        F.lead("d").over(w).alias("s1"),
        F.sum("dd").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("level"),
    )
    clipped = (
        lvl.where(F.col("s1").isNotNull())
        .crossJoin(F.broadcast(win))
        .groupBy(F.datediff("w1", "w0").cast("bigint").alias("t_days"))
        .agg(
            F.sum(
                F.col("level")
                * F.greatest(
                    F.lit(0),
                    F.datediff(
                        F.least("s1", "w1"), F.greatest("s0", "w0")
                    ),
                )
            )
            .cast("bigint")
            .alias("area")
        )
    )
    arr = (
        spans.crossJoin(F.broadcast(win))
        .where((F.col("st") >= F.col("w0")) & (F.col("st") < F.col("w1")))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_arr"),
            F.sum(F.datediff("en", "st")).cast("bigint").alias("tot_w"),
        )
    )
    wy = win.select(F.year("w0").cast("bigint").alias("window_year"))
    j = clipped.crossJoin(F.broadcast(arr)).crossJoin(F.broadcast(wy))
    l_avg = F.col("area").cast("double") / F.col("t_days")
    lam = F.col("n_arr").cast("double") / F.col("t_days")
    wbar = F.col("tot_w").cast("double") / F.col("n_arr")
    return j.select(
        "window_year",
        "t_days",
        "n_arr",
        F.round(l_avg, 6).alias("l_timeavg"),
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(wbar, 6).alias("w_mean_days"),
        F.round(lam * wbar / l_avg, 6).alias("littles_ratio"),
    )


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (SES pair + SBA correction).
# ---------------------------------------------------------------------------
@register(
    "croston_intermittent",
    f"""
    WITH nz AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS z
      FROM orders WHERE o_totalprice > {_BIG_TICKET}
      GROUP BY o_orderdate),
    lastw AS (
      SELECT d, z FROM nz ORDER BY d DESC LIMIT {_CROSTON_W}),
    seq AS (
      SELECT d, z,
             CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS i,
             CAST(date_diff('day', lag(d) OVER (ORDER BY d), d) AS BIGINT) AS gap
      FROM lastw),
    ses AS (
      SELECT
        power(1 - {_CROSTON_ALPHA}, max(i) - 1)
          * sum(CASE WHEN i = 2 THEN z / power(1 - {_CROSTON_ALPHA}, 1)
                     WHEN i > 2 THEN {_CROSTON_ALPHA} * z
                          / power(1 - {_CROSTON_ALPHA}, i - 1) END) AS z_hat,
        power(1 - {_CROSTON_ALPHA}, max(i) - 1)
          * sum(CASE WHEN i = 2 THEN gap / power(1 - {_CROSTON_ALPHA}, 1)
                     WHEN i > 2 THEN {_CROSTON_ALPHA} * gap
                          / power(1 - {_CROSTON_ALPHA}, i - 1) END) AS p_hat,
        CAST(count(*) AS BIGINT) AS n_window
      FROM seq WHERE i >= 2)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nz) AS n_nonzero_days,
           n_window AS n_fit_points,
           round(z_hat, 6) AS z_hat,
           round(p_hat, 6) AS p_hat_days,
           round(z_hat / p_hat, 6) AS croston_rate,
           round((1 - {_CROSTON_ALPHA} / 2) * z_hat / p_hat, 6) AS sba_rate
    FROM ses
    """,
    tags=("timeseries", "forecast", "intermittent"),
)
def q_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method on big-ticket order arrivals (> $450k days --
    genuinely intermittent): SES (alpha=0.2) of the nonzero demand
    sizes and of the inter-demand day gaps over the LAST 65 nonzero
    days (ordered LIMIT -> bounded window, keeping the r^-i unroll
    inside double range), forecast rate = z_hat/p_hat per day plus the
    Syntetos-Boylan (1 - alpha/2) bias correction. Both recursions are
    the ewma prefix-sum rewrite -- the i=2 seed carries full weight
    (SES init at the first fit point)."""
    r = 1 - _CROSTON_ALPHA
    orders = read_table(spark, sf_dir, "orders")
    nz = (
        orders.where(F.col("o_totalprice") > _BIG_TICKET)
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("z"))
    )
    lastw = nz.orderBy(F.col("d").desc()).limit(_CROSTON_W)
    w = Window.orderBy("d")
    seq = lastw.select(
        "d",
        "z",
        F.row_number().over(w).cast("int").alias("i"),
        F.datediff(F.col("d"), F.lag("d").over(w)).cast("bigint").alias("gap"),
    )

    def ses(col):
        u = F.when(F.col("i") == 2, F.col(col) / F.pow(F.lit(r), 1)).when(
            F.col("i") > 2,
            _CROSTON_ALPHA * F.col(col) / F.pow(F.lit(r), F.col("i") - 1),
        )
        return F.pow(F.lit(r), F.max("i") - 1) * F.sum(u)

    fit = seq.where(F.col("i") >= 2).agg(
        ses("z").alias("z_hat"),
        ses("gap").alias("p_hat"),
        F.count(F.lit(1)).cast("bigint").alias("n_window"),
    )
    tot = nz.agg(F.count(F.lit(1)).cast("bigint").alias("n_nonzero_days"))
    return fit.crossJoin(F.broadcast(tot)).select(
        "n_nonzero_days",
        F.col("n_window").alias("n_fit_points"),
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat_days"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("croston_rate"),
        F.round(
            (1 - _CROSTON_ALPHA / 2) * F.col("z_hat") / F.col("p_hat"), 6
        ).alias("sba_rate"),
    )
