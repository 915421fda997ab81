"""Extension batch 196 (round 7): staggered-adoption DID and the
bunching estimator -- two modern applied-econometrics screens.

- staggered_did_att: Callaway-Sant'Anna-style GROUP-TIME average
  treatment effects under staggered adoption. Treatment is a
  deterministic placebo (nation % 4 assigns three cohorts adopting at
  months Mmax-5 / Mmax-3 / Mmax-1; nations with nation % 4 = 0 are the
  never-treated control): ATT(g, e) = [ybar_{g, t} - ybar_{g, g-1}]
  - [ybar_{C, t} - ybar_{C, g-1}] for event times e = 0, 1. With no
  real intervention the ATTs hover near zero -- the placebo_timing_did
  convention: what the query certifies is the ESTIMATOR's arithmetic.
  A (cohort, month) cell with no orders (the sparse straggler months
  at the panel's end) drops its ATT row via the inner join --
  identically in both engines
  (never-treated controls, base period g-1, no forbidden comparisons),
  all exact integer cents means divided once per cell.
- bunching_round_notches: excess mass at round-amount notches (the
  tax-notch / threshold-gaming signature): for each $500 notch bin of
  o_totalprice, the counterfactual count is the average of the two
  flanking bins, and excess = (observed - counterfactual) /
  counterfactual. Integer counts, one division per notch; a planted-
  bunching law lives in the invariant suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
# adoption lags before the last month, per cohort (nation % 4 == 1,2,3)
_ADOPT_LAG = {1: 5, 2: 3, 3: 1}
_EVENT_TIMES = (0, 1)
_NOTCH = 50_000  # $500 notches, in cents
_BIN = 10_000    # $100 bins


@register(
    "staggered_did_att",
    f"""
    WITH panel AS (
      SELECT c.c_nationkey AS nk, c.c_nationkey % 4 AS grp,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mo,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2, 3),
    mi AS (
      SELECT mo, CAST(dense_rank() OVER (ORDER BY mo) AS BIGINT) AS t
      FROM (SELECT DISTINCT mo FROM panel)),
    mx AS (SELECT CAST(max(t) AS BIGINT) AS mmax FROM mi),
    cells AS (
      SELECT p.grp, m.t, CAST(sum(p.cents) AS HUGEINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM panel p JOIN mi m ON m.mo = p.mo
      GROUP BY p.grp, m.t),
    spec AS (
      SELECT g.grp, g.adopt_lag, x.mmax - g.adopt_lag AS gt, e.e
      FROM (VALUES (1, 5), (2, 3), (3, 1)) g(grp, adopt_lag)
      CROSS JOIN (SELECT unnest([0, 1]) AS e) e
      CROSS JOIN mx x),
    att AS (
      SELECT s.grp, s.e, s.gt,
             (CAST(ct.s AS DOUBLE) / ct.n - CAST(cb.s AS DOUBLE) / cb.n)
             - (CAST(kt.s AS DOUBLE) / kt.n - CAST(kb.s AS DOUBLE) / kb.n)
               AS att_cents,
             ct.n AS n_treated
      FROM spec s
      JOIN cells ct ON ct.grp = s.grp AND ct.t = s.gt + s.e
      JOIN cells cb ON cb.grp = s.grp AND cb.t = s.gt - 1
      JOIN cells kt ON kt.grp = 0 AND kt.t = s.gt + s.e
      JOIN cells kb ON kb.grp = 0 AND kb.t = s.gt - 1)
    SELECT grp AS cohort, e AS event_time, gt AS adopt_month_idx,
           n_treated,
           round(att_cents / 100.0, 2) + 0.0 AS att_dollars
    FROM att
    """,
    tags=("causal", "did", "staggered"),
)
def q_staggered_did_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staggered-adoption group-time ATTs (Callaway-Sant'Anna shape)
    over the nation-month revenue panel with a deterministic placebo
    assignment (nation % 4 cohorts adopting at Mmax-5/-3/-1;
    % 4 == 0 never treated): each ATT(g, e) compares the cohort's
    change from its OWN base period g-1 against the never-treated
    change over the same window -- no already-treated units ever enter
    a comparison (the forbidden-comparison bias 2x2 DID suffers under
    staggered adoption). Placebo ATTs hover near zero; the estimator's
    arithmetic is what the hash gate certifies."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    panel = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            (F.col("c_nationkey") % 4).alias("grp"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("mo"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    mi = (
        panel.select("mo")
        .distinct()
        .select(
            "mo",
            F.dense_rank().over(Window.orderBy("mo")).cast("bigint").alias("t"),
        )
    )
    mx = mi.agg(F.max("t").cast("bigint").alias("mmax"))
    cells = (
        panel.join(F.broadcast(mi), "mo")
        .groupBy("grp", "t")
        .agg(
            F.sum(F.col("cents").cast(_DEC)).cast(_DEC).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .localCheckpoint(eager=True)
    )
    spec = (
        spark.createDataFrame(
            [(g, lag, e) for g, lag in _ADOPT_LAG.items() for e in _EVENT_TIMES],
            "grp long, adopt_lag long, e long",
        )
        .crossJoin(F.broadcast(mx))
        .select("grp", "e", (F.col("mmax") - F.col("adopt_lag")).alias("gt"))
    )
    def cell(alias):
        return cells.select(
            F.col("grp").alias(f"{alias}_grp"),
            F.col("t").alias(f"{alias}_t"),
            (F.col("s").cast("double") / F.col("n")).alias(f"{alias}_m"),
            F.col("n").alias(f"{alias}_n"),
        )

    ct, cb = cell("ct"), cell("cb")
    kt, kb = cell("kt"), cell("kb")
    att = (
        spec.join(
            ct,
            (F.col("ct_grp") == F.col("grp"))
            & (F.col("ct_t") == F.col("gt") + F.col("e")),
        )
        .join(
            cb,
            (F.col("cb_grp") == F.col("grp"))
            & (F.col("cb_t") == F.col("gt") - 1),
        )
        .join(
            kt,
            (F.col("kt_grp") == 0)
            & (F.col("kt_t") == F.col("gt") + F.col("e")),
        )
        .join(
            kb,
            (F.col("kb_grp") == 0) & (F.col("kb_t") == F.col("gt") - 1),
        )
    )
    return att.select(
        F.col("grp").alias("cohort"),
        F.col("e").alias("event_time"),
        F.col("gt").alias("adopt_month_idx"),
        F.col("ct_n").alias("n_treated"),
        (
            F.round(
                (
                    (F.col("ct_m") - F.col("cb_m"))
                    - (F.col("kt_m") - F.col("kb_m"))
                )
                / 100.0,
                2,
            )
            + F.lit(0.0)
        ).alias("att_dollars"),
    )


@register(
    "bunching_round_notches",
    f"""
    WITH bins AS (
      SELECT (CAST(round(o_totalprice * 100, 0) AS BIGINT) // {_BIN})
               * {_BIN} AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1),
    notches AS (
      SELECT b, n FROM bins WHERE b % {_NOTCH} = 0 AND b > 0),
    flanks AS (
      SELECT t.b, t.n,
             lo.n AS n_lo, hi.n AS n_hi
      FROM notches t
      JOIN bins lo ON lo.b = t.b - {_BIN}
      JOIN bins hi ON hi.b = t.b + {_BIN})
    SELECT CAST(b // 100 AS BIGINT) AS notch_dollars,
           n AS observed,
           round((n_lo + n_hi) / 2.0, 1) AS counterfactual,
           round((n - (n_lo + n_hi) / 2.0)
                 / ((n_lo + n_hi) / 2.0), 6) + 0.0 AS excess_mass
    FROM flanks
    ORDER BY b
    LIMIT 20
    """,
    tags=("fraud", "bunching", "exact-arith"),
)
def q_bunching_round_notches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bunching estimator at $500 notches of the order amount: bin
    amounts at $100, and for each $500-multiple bin compare the
    observed count against the flanking-bin average counterfactual --
    excess_mass >> 0 is the threshold-gaming signature (amounts steered
    just onto a salient round figure; the distributional cousin of
    round_amount_bias's digit view). Integer counts, one division per
    notch; first 20 notches by amount."""
    orders = read_table(spark, sf_dir, "orders")
    bins = (
        orders.select(
            F.expr(
                f"(CAST(round(o_totalprice * 100, 0) AS BIGINT)"
                f" DIV {_BIN}) * {_BIN}"
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    notches = bins.where((F.col("b") % _NOTCH == 0) & (F.col("b") > 0))
    lo = bins.select((F.col("b") + _BIN).alias("b"), F.col("n").alias("n_lo"))
    hi = bins.select((F.col("b") - _BIN).alias("b"), F.col("n").alias("n_hi"))
    flanks = notches.join(lo, "b").join(hi, "b")
    cf = (F.col("n_lo") + F.col("n_hi")) / 2.0
    return (
        flanks.select(
            F.expr(f"CAST(b DIV 100 AS BIGINT)").alias("notch_dollars"),
            F.col("n").alias("observed"),
            F.round(cf, 1).alias("counterfactual"),
            (F.round((F.col("n") - cf) / cf, 6) + F.lit(0.0)).alias(
                "excess_mass"
            ),
        )
        .orderBy("notch_dollars")
        .limit(20)
    )
