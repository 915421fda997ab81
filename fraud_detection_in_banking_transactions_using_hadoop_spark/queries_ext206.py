"""Extension batch 206 (round 8): Markov-chain attribution with
removal effects -- the data-driven alternative to the positional
(attribution_models) and Shapley (shapley_attribution) tiers, closing
the marketing-attribution triad.

Model: each user's event sequence up to their first purchase is a walk
on the channel states {START, click, view, signup, error}; 'purchase'
absorbs into CONV, sequence end absorbs into NULL. The conversion
probability is the absorption probability from START; channel c's
REMOVAL EFFECT is the relative drop in that probability when every
transition into c is redirected to NULL (Anderl et al.'s framework).

Exactness architecture (the r8 bounded-fold discipline): the
transition-count matrix is a DISTRIBUTED windowed aggregate over user
journeys, but it is <= 5x6 integer cells -- so absorption runs as 40
rounds of the e12-QUANTIZED integer recursion
    a_i <- (1e12 * n(i,CONV) + sum_j n(i,j) * a_j) DIV n_i
(truncation identical in both engines, the spectral/WW discipline),
once for the full chain and once per removed channel. Spark folds the
collected counts driver-side; DuckDB unrolls the same 5 x 40 matvec
CTEs. Integer states after every round are bit-identical, so removal
effects and attribution shares hash-match exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CHANNELS = ("click", "error", "signup", "view")  # transient, sorted
_K = 40  # matvec rounds (absorption series truncation, both engines)
_Q = 10**12

_COUNTS_SQL = """
    seq0 AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM events),
    seq AS MATERIALIZED (
      SELECT user_id, event_type, rn,
             min(CASE WHEN event_type = 'purchase' THEN rn END)
               OVER (PARTITION BY user_id) AS conv_rn,
             max(rn) OVER (PARTITION BY user_id) AS max_rn
      FROM seq0),
    jrny AS (
      SELECT user_id, event_type, rn FROM seq
      WHERE conv_rn IS NULL OR rn <= conv_rn),
    steps AS (
      SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
               ORDER BY rn), 'START') AS i,
             CASE WHEN event_type = 'purchase' THEN 'CONV'
                  ELSE event_type END AS j
      FROM jrny),
    tails AS (
      SELECT event_type AS i, 'NULL' AS j
      FROM seq WHERE conv_rn IS NULL AND rn = max_rn),
    cnt AS MATERIALIZED (
      SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT i, j FROM steps
        UNION ALL
        SELECT i, j FROM tails) u
      GROUP BY i, j)
"""


_STATES = ("START",) + _CHANNELS


def _markov_sql() -> str:
    """One recursive CTE per the Holt/Kalman pattern: the 5-state
    absorption vector pivots into columns, so each of the 40 rounds is
    pure scalar arithmetic on one row per variant -- no aggregation
    over the recursive relation, no 200-CTE planner blowup."""
    vars_rows = ", ".join(
        ["('full', CAST(NULL AS VARCHAR))"]
        + [f"('{c}', '{c}')" for c in _CHANNELS]
    )
    coef_cols = []
    for i in _STATES:
        for j in _CHANNELS:
            coef_cols.append(
                f"CAST(coalesce(sum(CASE WHEN c.i = '{i}' AND c.j = '{j}'"
                f" AND (v.removed IS NULL OR c.j <> v.removed)"
                f" THEN c.n END), 0) AS BIGINT) AS n_{i}_{j}"
            )
        coef_cols.append(
            f"CAST(coalesce(sum(CASE WHEN c.i = '{i}' AND c.j = 'CONV'"
            f" THEN c.n END), 0) AS BIGINT) AS nc_{i}"
        )
        coef_cols.append(
            f"CAST(coalesce(sum(CASE WHEN c.i = '{i}' THEN c.n END), 0)"
            f" AS BIGINT) AS t_{i}"
        )
    seed_q = ", ".join(f"CAST(0 AS BIGINT) AS q_{i}" for i in _STATES)
    step_q = ", ".join(
        "CAST(({q} * c.nc_{i} + {terms}) // greatest(c.t_{i}, 1)"
        " AS BIGINT) AS q_{i}".format(
            q=_Q,
            i=i,
            terms=" + ".join(
                f"CAST(c.n_{i}_{j} AS HUGEINT) * f.q_{j}"
                for j in _CHANNELS
            ),
        )
        for i in _STATES
    )
    rem_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel,"
        f" (SELECT q_START FROM fold WHERE variant = '{c}' AND k = {_K})"
        f" AS pq"
        for c in _CHANNELS
    )
    return f"""
    WITH RECURSIVE {_COUNTS_SQL},
    vars(variant, removed) AS (VALUES {vars_rows}),
    coefv AS MATERIALIZED (
      SELECT v.variant, {", ".join(coef_cols)}
      FROM vars v CROSS JOIN cnt c
      GROUP BY v.variant),
    fold AS (
      SELECT variant, 0 AS k, {seed_q} FROM coefv
      UNION ALL
      SELECT f.variant, f.k + 1, {step_q}
      FROM fold f JOIN coefv c ON c.variant = f.variant
      WHERE f.k < {_K}),
    eff AS (
      SELECT r.channel,
             (SELECT q_START FROM fold
              WHERE variant = 'full' AND k = {_K}) AS full_q,
             r.pq AS removed_q
      FROM ({rem_rows}) r),
    tot_eff AS (
      SELECT CAST(sum(full_q - removed_q) AS BIGINT) AS s FROM eff)
    SELECT e.channel,
           round(CAST(e.full_q AS DOUBLE) / 1e12, 6) AS p_conversion,
           round(CAST(e.removed_q AS DOUBLE) / 1e12, 6) AS p_removed,
           CASE WHEN e.full_q = 0 THEN NULL
                ELSE round(CAST(e.full_q - e.removed_q AS DOUBLE)
                           / e.full_q, 6) + 0.0
           END AS removal_effect,
           CASE WHEN t.s = 0 THEN NULL
                ELSE round(CAST(e.full_q - e.removed_q AS DOUBLE) / t.s, 6)
                     + 0.0
           END AS attribution_share
    FROM eff e CROSS JOIN tot_eff t
    """


@register(
    "markov_removal_attribution",
    _markov_sql(),
    tags=("marketing", "attribution", "markov", "exact-arith"),
)
def q_markov_removal_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution over user journeys to first
    purchase: per channel, the conversion probability of the full
    chain, of the chain with the channel removed (transitions into it
    redirected to NULL), the relative drop, and the normalized
    attribution share. The transition counts aggregate distributed;
    the <=5x6 absorption recursions fold driver-side in the exact
    integer arithmetic the oracle unrolls."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).withColumn(
        "conv_rn",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).over(wu),
    )
    jrny = seq.where(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    )
    wj = Window.partitionBy("user_id").orderBy("rn")
    steps = jrny.select(
        F.coalesce(
            F.lag("event_type").over(wj), F.lit("START")
        ).alias("i"),
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("j"),
    )
    tails = (
        jrny.where(F.col("conv_rn").isNull())
        .withColumn("mx", F.max("rn").over(wu))
        .where(F.col("rn") == F.col("mx"))
        .select(F.col("event_type").alias("i"), F.lit("NULL").alias("j"))
    )
    cnt_rows = collect_nonempty(
        steps.unionByName(tails)
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n")),
        "markov attribution transition counts",
    )
    cnt = {(r["i"], r["j"]): r["n"] for r in cnt_rows}
    states = list(_STATES)  # fixed literal states, as in the oracle
    tot = {s: sum(n for (i, _j), n in cnt.items() if i == s) for s in states}
    conv = {s: cnt.get((s, "CONV"), 0) for s in states}

    def absorb(removed: str | None) -> int:
        a = {s: 0 for s in states}
        for _ in range(_K):
            new = {}
            for s in states:
                acc = _Q * conv[s]
                for j in _CHANNELS:
                    if j == removed:
                        continue
                    acc += cnt.get((s, j), 0) * a[j]
                new[s] = acc // max(tot[s], 1)
            a = new
        return a["START"]

    full_q = absorb(None)
    rows = []
    drops = {}
    for c in _CHANNELS:
        rq = absorb(c)
        drops[c] = full_q - rq
    s_eff = sum(drops.values())
    for c in _CHANNELS:
        rq = full_q - drops[c]
        rows.append(
            (
                c,
                round(full_q / 1e12, 6),
                round(rq / 1e12, 6),
                None if full_q == 0 else round(drops[c] / full_q, 6) + 0.0,
                None
                if s_eff == 0
                else round(drops[c] / s_eff, 6) + 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel STRING, p_conversion DOUBLE, p_removed DOUBLE,"
        " removal_effect DOUBLE, attribution_share DOUBLE",
    )
