"""Extension batch 97: renewal / Markov lifetime machinery -- an
absorbing-chain customer lifetime model, the inspection paradox
demonstrated on order gaps, and error interarrival (MTBF) statistics.

- absorbing_chain_lifetime: label each customer-year Active / Dormant
  (past orders, future orders, none this year) / Churned (no orders
  this year or ever after -- retrospective, exact in batch), count
  year-over-year transitions, and invert I - Q in closed 2x2 form:
  the fundamental-matrix row sums are the expected remaining YEARS of
  engagement from each state. ltv_curve discounts cash; this models
  the STATE process generating it.
- inspection_paradox: renewal theory says the interval containing a
  random inspection time is length-biased: E[L] = E[X^2]/E[X] =
  mean (1 + CV^2). Both the prediction (exact gap moments) and the
  OBSERVED straddling-gap mean are computed -- the bias is real, not
  a textbook curiosity, and this query measures it.
- error_interarrival_stats: MTBF over the global error-event
  sequence (the allan_variance global-order idiom: with_global_rank,
  never a single-task window), with the CV that separates memoryless
  failures (CV ~ 1) from bursty ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_CHAIN_YEARS = (1993, 1994, 1995, 1996, 1997)


# ---------------------------------------------------------------------------
# Absorbing-chain expected customer lifetime.
# ---------------------------------------------------------------------------
@register(
    "absorbing_chain_lifetime",
    f"""
    WITH yrs AS (
      SELECT DISTINCT o_custkey AS ck, date_part('year', o_orderdate) AS y
      FROM orders
      WHERE date_part('year', o_orderdate) BETWEEN {_CHAIN_YEARS[0]}
        AND {_CHAIN_YEARS[-1]}),
    bounds AS (
      SELECT ck, CAST(min(y) AS BIGINT) AS fy, CAST(max(y) AS BIGINT) AS ly
      FROM yrs GROUP BY ck),
    grid AS (
      SELECT b.ck, g.y, b.fy, b.ly,
             CASE WHEN EXISTS (SELECT 1 FROM yrs v
                               WHERE v.ck = b.ck AND v.y = g.y) THEN 'A'
                  WHEN g.y > b.ly THEN 'C'
                  ELSE 'D' END AS st
      FROM bounds b
      CROSS JOIN (SELECT unnest(ARRAY{list(_CHAIN_YEARS)}) AS y) g
      WHERE g.y >= b.fy),
    trans AS (
      SELECT a.st AS s_from, b.st AS s_to, CAST(count(*) AS BIGINT) AS c
      FROM grid a JOIN grid b ON a.ck = b.ck AND b.y = a.y + 1
      WHERE a.st IN ('A', 'D')
      GROUP BY a.st, b.st),
    m AS (
      SELECT
        CAST(sum(CASE WHEN s_from = 'A' THEN c ELSE 0 END) AS DOUBLE) AS na,
        CAST(sum(CASE WHEN s_from = 'D' THEN c ELSE 0 END) AS DOUBLE) AS nd,
        CAST(sum(CASE WHEN s_from = 'A' AND s_to = 'A' THEN c ELSE 0 END)
             AS DOUBLE) AS aa,
        CAST(sum(CASE WHEN s_from = 'A' AND s_to = 'D' THEN c ELSE 0 END)
             AS DOUBLE) AS ad,
        CAST(sum(CASE WHEN s_from = 'D' AND s_to = 'A' THEN c ELSE 0 END)
             AS DOUBLE) AS da,
        CAST(sum(CASE WHEN s_from = 'D' AND s_to = 'D' THEN c ELSE 0 END)
             AS DOUBLE) AS dd
      FROM trans),
    q AS (
      SELECT na, nd, aa / na AS qaa, ad / na AS qad,
             da / nd AS qda, dd / nd AS qdd
      FROM m),
    inv AS (
      SELECT na, nd, qaa, qad, qda, qdd,
             (1.0 - qaa) * (1.0 - qdd) - qad * qda AS det
      FROM q)
    SELECT CAST(na AS BIGINT) AS n_from_active,
           CAST(nd AS BIGINT) AS n_from_dormant,
           round(qaa, 6) AS p_stay_active,
           round(qad, 6) AS p_go_dormant,
           round(qda, 6) AS p_reactivate,
           round(((1.0 - qdd) + qad) / det, 4) AS exp_years_from_active,
           round((qda + (1.0 - qaa)) / det, 4) AS exp_years_from_dormant
    FROM inv
    """,
    tags=("markov", "lifetime", "exact-arith"),
)
def q_absorbing_chain_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing Markov chain over customer-year states Active /
    Dormant / Churned (churn labeled retrospectively -- exact in
    batch): transition counts feed Q over the transient pair, and the
    closed-form fundamental matrix N = (I-Q)^-1 row sums give the
    expected remaining engaged years from each state. Caveat of the
    retrospective labels: Dormant CONDITIONS on a future active year
    (it can never absorb directly, p(D->C) = 0 by construction), so
    its expected remaining years can exceed Active's -- the estimates
    describe the labeled process, not a causal churn risk. The
    state-level answer behind every 'expected lifetime' multiplier
    in LTV."""
    orders = read_table(spark, sf_dir, "orders")
    yrs = (
        orders.where(
            F.year("o_orderdate").between(_CHAIN_YEARS[0], _CHAIN_YEARS[-1])
        )
        .select(
            F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("y")
        )
        .distinct()
    )
    bounds = yrs.groupBy("ck").agg(
        F.min("y").cast("bigint").alias("fy"),
        F.max("y").cast("bigint").alias("ly"),
    )
    grid_years = spark.createDataFrame([(y,) for y in _CHAIN_YEARS], "y bigint")
    marked = yrs.select("ck", "y", F.lit(1).alias("hit"))
    grid = (
        bounds.crossJoin(F.broadcast(grid_years))
        .where(F.col("y") >= F.col("fy"))
        .join(marked, ["ck", "y"], "left")
        .select(
            "ck",
            "y",
            F.when(F.col("hit").isNotNull(), F.lit("A"))
            .when(F.col("y") > F.col("ly"), F.lit("C"))
            .otherwise(F.lit("D"))
            .alias("st"),
        )
    )
    a = grid.select("ck", "y", F.col("st").alias("s_from"))
    b = grid.select("ck", (F.col("y") - 1).alias("y"), F.col("st").alias("s_to"))
    trans = (
        a.join(b, ["ck", "y"])
        .where(F.col("s_from").isin("A", "D"))
        .groupBy("s_from", "s_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )

    def cell(f, t):
        return F.sum(
            F.when((F.col("s_from") == f) & (F.col("s_to") == t), F.col("c")).otherwise(
                0
            )
        ).cast("double")

    m = trans.agg(
        F.sum(F.when(F.col("s_from") == "A", F.col("c")).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("s_from") == "D", F.col("c")).otherwise(0))
        .cast("double")
        .alias("nd"),
        cell("A", "A").alias("aa"),
        cell("A", "D").alias("ad"),
        cell("D", "A").alias("da"),
        cell("D", "D").alias("dd"),
    )
    q = m.select(
        "na",
        "nd",
        (F.col("aa") / F.col("na")).alias("qaa"),
        (F.col("ad") / F.col("na")).alias("qad"),
        (F.col("da") / F.col("nd")).alias("qda"),
        (F.col("dd") / F.col("nd")).alias("qdd"),
    )
    det = (1.0 - F.col("qaa")) * (1.0 - F.col("qdd")) - F.col("qad") * F.col("qda")
    inv = q.select("na", "nd", "qaa", "qad", "qda", "qdd", det.alias("det"))
    return inv.select(
        F.col("na").cast("bigint").alias("n_from_active"),
        F.col("nd").cast("bigint").alias("n_from_dormant"),
        F.round("qaa", 6).alias("p_stay_active"),
        F.round("qad", 6).alias("p_go_dormant"),
        F.round("qda", 6).alias("p_reactivate"),
        F.round(((1.0 - F.col("qdd")) + F.col("qad")) / F.col("det"), 4).alias(
            "exp_years_from_active"
        ),
        F.round((F.col("qda") + (1.0 - F.col("qaa"))) / F.col("det"), 4).alias(
            "exp_years_from_dormant"
        ),
    )


# ---------------------------------------------------------------------------
# Inspection paradox on customer order gaps.
# ---------------------------------------------------------------------------
@register(
    "inspection_paradox",
    """
    WITH seq AS (
      SELECT o_custkey AS ck, o_orderdate AS dt,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS pdt
      FROM orders),
    gaps AS (
      SELECT ck, pdt, dt, CAST(date_diff('day', pdt, dt) AS BIGINT) AS g
      FROM seq WHERE pdt IS NOT NULL AND date_diff('day', pdt, dt) > 0),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS HUGEINT) AS s,
             CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS q
      FROM gaps),
    tpoint AS (
      SELECT max(o_orderdate) - INTERVAL 180 DAY AS t FROM orders),
    straddle AS (
      SELECT CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(g) AS HUGEINT) AS ss
      FROM gaps, tpoint WHERE pdt <= t AND dt > t)
    SELECT m.n AS n_gaps,
           round(CAST(m.s AS DOUBLE) / m.n, 4) AS mean_gap_days,
           round(CAST(m.q AS DOUBLE) / CAST(m.s AS DOUBLE), 4)
             AS length_biased_pred_days,
           s2.ns AS n_straddling,
           round(CAST(s2.ss AS DOUBLE) / s2.ns, 4) AS observed_straddle_days,
           round((CAST(s2.ss AS DOUBLE) / s2.ns)
                 / (CAST(m.q AS DOUBLE) / CAST(m.s AS DOUBLE)), 4)
             AS obs_over_pred
    FROM mom m CROSS JOIN straddle s2
    """,
    tags=("renewal", "paradox", "exact-arith"),
)
def q_inspection_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inspection paradox measured: renewal theory predicts the
    gap CONTAINING a random inspection date is length-biased with
    mean E[X^2]/E[X] (= mean (1+CV^2)), not E[X]. Both sides from
    exact integers: gap moments for the prediction, and the actual
    mean of gaps straddling T = max date - 180 days. obs_over_pred
    near 1 validates the bias; the gap between mean_gap and
    length_biased_pred is why 'time since last order sampled today'
    overestimates typical cadence."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("dt"),
        F.lag("o_orderdate").over(w).alias("pdt"),
    )
    gaps = seq.where(
        F.col("pdt").isNotNull() & (F.datediff("dt", "pdt") > 0)
    ).select("ck", "pdt", "dt", F.datediff("dt", "pdt").cast("bigint").alias("g"))
    mom = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast(_DEC).alias("s"),
        F.sum(F.col("g").cast(_DEC) * F.col("g").cast(_DEC)).cast(_DEC).alias("q"),
    )
    tpoint = orders.agg(F.date_sub(F.max("o_orderdate"), 180).alias("t"))
    straddle = (
        gaps.crossJoin(F.broadcast(tpoint))
        .where((F.col("pdt") <= F.col("t")) & (F.col("dt") > F.col("t")))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ns"),
            F.sum("g").cast(_DEC).alias("ss"),
        )
    )
    out = mom.crossJoin(F.broadcast(straddle))
    lb = F.col("q").cast("double") / F.col("s").cast("double")
    obs = F.col("ss").cast("double") / F.col("ns")
    return out.select(
        F.col("n").alias("n_gaps"),
        F.round(F.col("s").cast("double") / F.col("n"), 4).alias("mean_gap_days"),
        F.round(lb, 4).alias("length_biased_pred_days"),
        F.col("ns").alias("n_straddling"),
        F.round(obs, 4).alias("observed_straddle_days"),
        F.round(obs / lb, 4).alias("obs_over_pred"),
    )


# ---------------------------------------------------------------------------
# Error-event interarrival (MTBF) statistics.
# ---------------------------------------------------------------------------
@register(
    "error_interarrival_stats",
    """
    WITH errs AS (
      SELECT epoch_us(ts) AS us, event_id FROM events
      WHERE event_type = 'error'),
    seq AS (
      SELECT us,
             CAST(row_number() OVER (ORDER BY us, event_id) AS BIGINT) AS i
      FROM errs),
    gaps AS (
      SELECT CAST(b.us - a.us AS BIGINT) AS g
      FROM seq a JOIN seq b ON b.i = a.i + 1),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS HUGEINT) AS s,
             CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS q
      FROM gaps),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events)
    SELECT t.n_errors, m.n AS n_gaps,
           round(CAST(m.s AS DOUBLE) / m.n / 1e6 / 3600.0, 4) AS mtbf_hours,
           round(sqrt((CAST(m.n AS DOUBLE) * m.q - CAST(m.s AS DOUBLE) * m.s)
                      / (CAST(m.n AS DOUBLE) * m.n))
                 / (CAST(m.s AS DOUBLE) / m.n), 6) AS gap_cv,
           round(CAST(t.n_errors AS DOUBLE) / t.n_events, 6) AS error_rate
    FROM mom m CROSS JOIN tot t
    """,
    tags=("reliability", "mtbf", "exact-arith"),
)
def q_error_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF over the global error-event sequence: interarrival gaps
    from the two-level-ranked order (the allan_variance idiom -- no
    single-task window over the fact table), exact micro-integer
    moments, CV = sd/mean. CV ~ 1 is the memoryless (Poisson)
    signature; CV >> 1 means error BURSTS, and every on-call
    escalation policy should know which one it has."""
    ev = read_table(spark, sf_dir, "events")
    errs = ev.where(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    seq = with_global_rank(
        errs, "us", [F.col("us"), F.col("event_id")], rank_col="rk"
    ).select("us", (F.col("rk") - 1).cast("bigint").alias("i"))
    nxt = seq.select((F.col("i") - 1).alias("i"), F.col("us").alias("us2"))
    gaps = seq.join(nxt, "i").select(
        (F.col("us2") - F.col("us")).cast("bigint").alias("g")
    )
    mom = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast(_DEC).alias("s"),
        F.sum(F.col("g").cast(_DEC) * F.col("g").cast(_DEC)).cast(_DEC).alias("q"),
    )
    tot = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    out = mom.crossJoin(F.broadcast(tot))
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    return out.select(
        "n_errors",
        F.col("n").alias("n_gaps"),
        F.round(mean / 1e6 / 3600.0, 4).alias("mtbf_hours"),
        F.round(sd / mean, 6).alias("gap_cv"),
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events"), 6
        ).alias("error_rate"),
    )
