"""Extension batch 62: Page-Hinkley drift detector, Gumbel block-maxima
fit, net revenue retention, and Markov entropy rate.

Scale notes (the 100 TB story per query):
- page_hinkley_drift is the online mean-shift detector (the CUSUM
  sibling): PH_t = m_t - min_{s<=t} m_s with m_t = sum(x_i - xbar).
  Multiplying through by n keeps every term an exact integer
  (M_t = n*prefix_t - t*S), so both engines walk identical numbers;
  the prefix + running-min windows run over the ~|days| daily series
  (CALENDAR growth class).
- gumbel_block_maxima is extreme-value analysis by method of moments:
  monthly maxima of daily revenue (~80 blocks, calendar-bounded), then
  beta = sqrt(6)*sigma/pi, mu = mean - gamma*beta, and an exceedance
  probability at 1.5x the mean block max. Moments come from exact
  HUGEINT sums of cents and cents^2 -- one closing double expression.
- net_revenue_retention is the SaaS-style cohort revenue curve: cohort
  = month of first order, NRR_k = cohort revenue in month+k over its
  month-0 revenue, exact integer cents and ppm floors. Two groupBys
  plus an equi-join on the customer cohort map -- no windows at all.
- markov_entropy_rate scores session predictability: empirical
  transition entropy H_i = -sum_j p_ij log2 p_ij per from-state with
  e9-integer terms (order-free sums), and the chain's entropy rate
  sum_i (n_i/N) H_i as the 'ALL' row from the same integers. Lag runs
  per user (partitioned window), counts are two groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_EULER_GAMMA = 0.5772156649015329


# ---------------------------------------------------------------------------
# Page-Hinkley mean-shift detector on the daily revenue series.
# ---------------------------------------------------------------------------
@register(
    "page_hinkley_drift",
    """
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS HUGEINT) AS s
      FROM d),
    m AS (
      SELECT dt,
             CAST(t.n AS HUGEINT)
               * sum(CAST(x AS HUGEINT)) OVER (ORDER BY dt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - CAST(row_number() OVER (ORDER BY dt) AS HUGEINT) * t.s AS mt
      FROM d CROSS JOIN tot t),
    ph AS (
      SELECT dt,
             mt - min(mt) OVER (ORDER BY dt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_n
      FROM m),
    peak AS (
      SELECT dt AS peak_date, ph_n AS max_ph_n
      FROM ph ORDER BY ph_n DESC, dt LIMIT 1)
    SELECT t.n AS n_days,
           CAST(p.max_ph_n // t.n AS BIGINT) AS max_ph_cents,
           p.peak_date,
           (SELECT min(dt) FROM ph WHERE 2 * ph_n >= p.max_ph_n)
             AS first_half_alarm_date
    FROM peak p CROSS JOIN tot t
    """,
    tags=("timeseries", "drift", "exact-arith"),
)
def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest sustained upward mean shift: PH_t = m_t - running min,
    with m_t scaled by n so every intermediate is an exact HUGEINT
    (M_t = n*prefix_t - t*total). Reports the peak (with date tiebreak
    via ordered LIMIT) and the first day PH crossed half the eventual
    peak -- the alarm an online monitor would have raised."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("s"),
    )
    wd = Window.orderBy("dt")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    m = d.crossJoin(F.broadcast(tot)).select(
        "dt",
        "n",
        (
            F.col("n").cast(_DEC) * F.sum(F.col("x").cast(_DEC)).over(wcum)
            - F.row_number().over(wd).cast(_DEC) * F.col("s")
        ).alias("mt"),
    )
    ph = m.select(
        "dt", "n", (F.col("mt") - F.min("mt").over(wcum)).alias("ph_n")
    )
    peak = ph.orderBy(F.col("ph_n").desc(), "dt").limit(1).select(
        F.col("dt").alias("peak_date"), F.col("ph_n").alias("max_ph_n"), "n"
    )
    alarm = (
        ph.join(F.broadcast(peak.select("max_ph_n")), F.lit(True))
        .where(2 * F.col("ph_n") >= F.col("max_ph_n"))
        .agg(F.min("dt").alias("first_half_alarm_date"))
    )
    return peak.crossJoin(F.broadcast(alarm)).select(
        F.col("n").alias("n_days"),
        F.expr("CAST(max_ph_n DIV n AS BIGINT)").alias("max_ph_cents"),
        "peak_date",
        "first_half_alarm_date",
    )


# ---------------------------------------------------------------------------
# Gumbel fit on monthly block maxima (method of moments).
# ---------------------------------------------------------------------------
@register(
    "gumbel_block_maxima",
    f"""
    WITH d AS (
      SELECT o_orderdate AS dt,
             CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS x
      FROM orders GROUP BY o_orderdate),
    blocks AS (
      SELECT date_trunc('month', dt) AS mth, CAST(max(x) AS BIGINT) AS mx
      FROM d GROUP BY date_trunc('month', dt)),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(CAST(mx AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS s2
      FROM blocks),
    fit AS (
      SELECT nb,
             CAST(s1 AS DOUBLE) / nb AS mean_mx,
             sqrt((CAST(nb AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(nb AS DOUBLE) * nb)) AS sd_mx,
             CAST(3 * s1 // (2 * nb) AS BIGINT) AS thresh_cents
      FROM mom)
    SELECT nb AS n_blocks,
           round(mean_mx, 4) AS mean_max_cents,
           round(sd_mx, 4) AS sd_max_cents,
           round(sqrt(6.0) * sd_mx / pi(), 4) AS beta_cents,
           round(mean_mx - {_EULER_GAMMA} * sqrt(6.0) * sd_mx / pi(), 4)
             AS mu_cents,
           thresh_cents,
           round(1 - exp(-exp(-(thresh_cents
                                - (mean_mx - {_EULER_GAMMA} * sqrt(6.0) * sd_mx / pi()))
                              / (sqrt(6.0) * sd_mx / pi()))), 6)
             AS p_exceed_thresh
    FROM fit
    """,
    tags=("stats", "extreme-value", "exact-arith"),
)
def q_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How bad can a peak day get? Monthly maxima of daily revenue form
    the block series (~80 calendar-bounded blocks); the Gumbel MoM fit
    is beta = sqrt(6)*sigma/pi, mu = mean - gamma*beta, and the
    exceedance probability at 1.5x the mean block max closes the
    return-level question. Moments from exact HUGEINT sums of cents and
    cents^2 -- identical doubles both engines."""
    orders = read_table(spark, sf_dir, "orders")
    d = orders.groupBy(F.col("o_orderdate").alias("dt")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("x")
    )
    blocks = d.groupBy(F.date_trunc("month", "dt").alias("mth")).agg(
        F.max("x").cast("bigint").alias("mx")
    )
    mom = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(F.col("mx").cast(_DEC)).cast(_DEC).alias("s1"),
        F.sum(F.col("mx").cast(_DEC) * F.col("mx").cast(_DEC)).cast(_DEC).alias("s2"),
    )
    nbd = F.col("nb").cast("double")
    mean = F.col("s1").cast("double") / nbd
    sd = F.sqrt(
        (nbd * F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double"))
        / (nbd * nbd)
    )
    beta = F.sqrt(F.lit(6.0)) * sd / F.lit(3.141592653589793)
    mu = mean - F.lit(_EULER_GAMMA) * beta
    fit = mom.select(
        F.col("nb").alias("n_blocks"),
        F.round(mean, 4).alias("mean_max_cents"),
        F.round(sd, 4).alias("sd_max_cents"),
        F.round(beta, 4).alias("beta_cents"),
        F.round(mu, 4).alias("mu_cents"),
        F.expr("CAST(3 * s1 DIV (2 * nb) AS BIGINT)").alias("thresh_cents"),
        F.round(
            1 - F.exp(-F.exp(-(F.expr("CAST(3 * s1 DIV (2 * nb) AS BIGINT)") - mu) / beta)),
            6,
        ).alias("p_exceed_thresh"),
    )
    return fit


# ---------------------------------------------------------------------------
# Net revenue retention by first-order cohort month.
# ---------------------------------------------------------------------------
@register(
    "net_revenue_retention",
    """
    WITH first_order AS (
      SELECT o_custkey AS ck,
             CAST(min(date_part('year', o_orderdate) * 12
                      + date_part('month', o_orderdate)) AS BIGINT) AS cohort_m
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort_m,
             CAST(date_part('year', o.o_orderdate) * 12
                  + date_part('month', o.o_orderdate) AS BIGINT)
               - f.cohort_m AS k,
             CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT) AS rev_cents,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
      FROM orders o JOIN first_order f ON o.o_custkey = f.ck
      GROUP BY 1, 2),
    base AS (
      SELECT cohort_m, rev_cents AS rev0 FROM rev WHERE k = 0)
    SELECT CAST((rev.cohort_m - 1) // 12 AS BIGINT) AS cohort_year,
           CAST((rev.cohort_m - 1) % 12 + 1 AS BIGINT) AS cohort_month,
           rev.k AS month_offset,
           rev.n_active,
           rev.rev_cents,
           CAST((1000000 * rev.rev_cents) // base.rev0 AS BIGINT) AS nrr_ppm
    FROM rev JOIN base ON rev.cohort_m = base.cohort_m
    WHERE rev.k <= 5
    """,
    tags=("product", "cohort", "revenue"),
)
def q_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort revenue curve: customers are stamped with their
    first-order month; NRR_k is the cohort's month-k revenue over its
    month-0 revenue in exact ppm. Month indexes are year*12+month
    integers (no interval arithmetic to disagree on); the cohort map is
    a per-customer aggregate joined back on the key. Offsets capped at
    5 -- a bounded, dashboard-shaped output."""
    orders = read_table(spark, sf_dir, "orders")
    midx = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    first = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(midx).alias("cohort_m")
    )
    rev = (
        orders.join(first, orders.o_custkey == first.ck)
        .groupBy("cohort_m", (midx - F.col("cohort_m")).alias("k"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("bigint").alias("rev_cents"),
            F.count_distinct("o_custkey").cast("bigint").alias("n_active"),
        )
    )
    base = rev.where(F.col("k") == 0).select("cohort_m", F.col("rev_cents").alias("rev0"))
    return (
        rev.join(base, "cohort_m")
        .where(F.col("k") <= 5)
        .select(
            F.expr("CAST((cohort_m - 1) DIV 12 AS BIGINT)").alias("cohort_year"),
            F.expr("CAST((cohort_m - 1) % 12 + 1 AS BIGINT)").alias("cohort_month"),
            F.col("k").alias("month_offset"),
            "n_active",
            "rev_cents",
            F.expr("CAST((1000000 * rev_cents) DIV rev0 AS BIGINT)").alias("nrr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Markov entropy rate of the per-user event-type chain.
# ---------------------------------------------------------------------------
@register(
    "markov_entropy_rate",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    trans AS (
      SELECT prev_type AS from_state, event_type AS to_state,
             CAST(count(*) AS BIGINT) AS nij
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    outd AS (
      SELECT from_state, CAST(sum(nij) AS BIGINT) AS ni FROM trans
      GROUP BY from_state),
    terms AS (
      SELECT t.from_state, o.ni,
             CAST(round(-1000000000.0 * (CAST(t.nij AS DOUBLE) / o.ni)
                        * log2(CAST(t.nij AS DOUBLE) / o.ni), 0) AS BIGINT)
               AS h_e9
      FROM trans t JOIN outd o ON t.from_state = o.from_state),
    per_state AS (
      SELECT from_state, CAST(max(ni) AS BIGINT) AS n_out,
             CAST(sum(h_e9) AS BIGINT) AS h_e9
      FROM terms GROUP BY from_state),
    total AS (SELECT CAST(sum(n_out) AS BIGINT) AS n FROM per_state)
    SELECT from_state, n_out,
           round(h_e9 / 1000000000.0, 6) AS h_bits
    FROM per_state
    UNION ALL
    SELECT 'ALL' AS from_state, t.n AS n_out,
           round(CAST(sum(CAST(p.n_out AS HUGEINT) * p.h_e9) AS DOUBLE)
                 / t.n / 1000000000.0, 6) AS h_bits
    FROM per_state p CROSS JOIN total t GROUP BY t.n
    """,
    tags=("stats", "markov", "entropy"),
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is the next event? Per from-state transition
    entropy with each -p*log2(p) term rounded to an e9 integer BEFORE
    the (order-free) sum, plus the chain's overall entropy rate
    sum_i (n_i/N) H_i as the 'ALL' row computed from the same integers.
    The lag is a per-user partitioned window; everything after is two
    groupBys and a broadcast total."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        F.col("prev_type").alias("from_state"),
        F.col("event_type").alias("to_state"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    outd = trans.groupBy("from_state").agg(F.sum("nij").cast("bigint").alias("ni"))
    p = F.col("nij").cast("double") / F.col("ni")
    terms = trans.join(F.broadcast(outd), "from_state").select(
        "from_state",
        "ni",
        F.round(F.lit(-1000000000.0) * p * F.log2(p), 0).cast("bigint").alias("h_e9"),
    )
    per_state = terms.groupBy("from_state").agg(
        F.max("ni").cast("bigint").alias("n_out"),
        F.sum("h_e9").cast("bigint").alias("h_e9"),
    )
    total = per_state.agg(F.sum("n_out").cast("bigint").alias("n"))
    states = per_state.select(
        "from_state", "n_out", F.round(F.col("h_e9") / 1e9, 6).alias("h_bits")
    )
    overall = (
        per_state.crossJoin(F.broadcast(total))
        .groupBy("n")
        .agg(
            F.sum(F.col("n_out").cast(_DEC) * F.col("h_e9").cast(_DEC))
            .cast(_DEC)
            .alias("hw")
        )
        .select(
            F.lit("ALL").alias("from_state"),
            F.col("n").alias("n_out"),
            F.round(F.col("hw").cast("double") / F.col("n") / 1e9, 6).alias("h_bits"),
        )
    )
    return states.unionByName(overall)
