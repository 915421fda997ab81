"""Extension batch 150 (round 6): rank aggregation / social choice
over the fixed 25-nation dimension -- Borda + Copeland consensus
ranking across three business metrics (with the Condorcet-winner
check), the Kendall tau DISTANCE between each metric pair's rankings
(how much "best market" depends on the metric chosen; complements
rank_biased_overlap's top-weighted view), and Bradley-Terry strengths
fitted from monthly head-to-head revenue wins (the paired-comparison
model behind chess Elo and search-result preference learning).

Cross-engine discipline:
- All rankings are exact integer ranks over the 25-row nation
  aggregate (dense ties impossible: cent totals collide with
  probability ~0, and the nation key is the tiebreak).
- Bradley-Terry: each fixed-point term n_ij/(pi_i + pi_j) is
  e12-quantized before the per-nation sum, and the normalization sum
  is e9-quantized -- the 3 iteration states match bit-for-bit.

Scale notes: everything aggregates to |nations| = 25 rows (or 25x25
pairs x |months| -- calendar-bounded) before any ranking logic; the
BT iterations run on a 300-row pair table (EAGER checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_BT_ROUNDS = 3

# nation-level metric table shared by the first two queries: revenue
# cents, order count, distinct customers (via customer dim join)
_METRICS_SQL = """
    met AS (
      SELECT c.c_nationkey AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey),
    ranks AS (
      SELECT nation,
             CAST(rank() OVER (ORDER BY rev DESC, nation) AS BIGINT) AS r_rev,
             CAST(rank() OVER (ORDER BY n_orders DESC, nation) AS BIGINT)
               AS r_ord,
             CAST(rank() OVER (ORDER BY n_cust DESC, nation) AS BIGINT)
               AS r_cust
      FROM met)
"""


def _spark_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    met = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_cust"),
        )
    )
    return met.select(
        "nation",
        F.rank()
        .over(Window.orderBy(F.col("rev").desc(), "nation"))
        .cast("bigint")
        .alias("r_rev"),
        F.rank()
        .over(Window.orderBy(F.col("n_orders").desc(), "nation"))
        .cast("bigint")
        .alias("r_ord"),
        F.rank()
        .over(Window.orderBy(F.col("n_cust").desc(), "nation"))
        .cast("bigint")
        .alias("r_cust"),
    )


@register(
    "borda_copeland_nations",
    f"""
    WITH {_METRICS_SQL},
    borda AS (
      SELECT nation,
             CAST((26 - r_rev) + (26 - r_ord) + (26 - r_cust) AS BIGINT)
               AS borda_score
      FROM ranks),
    pairs AS (
      SELECT a.nation AS i, b.nation AS j,
             CASE WHEN (CASE WHEN a.r_rev < b.r_rev THEN 1 ELSE 0 END
                      + CASE WHEN a.r_ord < b.r_ord THEN 1 ELSE 0 END
                      + CASE WHEN a.r_cust < b.r_cust THEN 1 ELSE 0 END) >= 2
                  THEN 1 ELSE 0 END AS wins
      FROM ranks a JOIN ranks b ON a.nation <> b.nation),
    cope AS (
      SELECT i AS nation, CAST(sum(wins) AS BIGINT) AS copeland_wins
      FROM pairs GROUP BY i)
    SELECT b.nation, b.borda_score, c.copeland_wins,
           c.copeland_wins = 24 AS is_condorcet_winner
    FROM borda b JOIN cope c ON b.nation = c.nation
    ORDER BY b.borda_score DESC, c.copeland_wins DESC, b.nation
    """,
    tags=("ranking", "social-choice"),
)
def q_borda_copeland_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consensus market ranking across three metrics (revenue, order
    count, customer reach): Borda score = sum of (26 - rank) over the
    metrics; Copeland wins = number of rivals beaten on a MAJORITY of
    metrics; a nation with all 24 pairwise majorities is the Condorcet
    winner (Borda can disagree with it -- the classic paradox this
    table makes visible). All ranks exact over the 25-row aggregate;
    the pairwise table is a constant 600 rows."""
    ranks = _spark_metrics(spark, sf_dir)
    borda = ranks.select(
        "nation",
        (
            (26 - F.col("r_rev")) + (26 - F.col("r_ord")) + (26 - F.col("r_cust"))
        )
        .cast("bigint")
        .alias("borda_score"),
    )
    a = ranks.alias("a")
    b = ranks.alias("b")
    maj = (
        F.when(F.col("a.r_rev") < F.col("b.r_rev"), 1).otherwise(0)
        + F.when(F.col("a.r_ord") < F.col("b.r_ord"), 1).otherwise(0)
        + F.when(F.col("a.r_cust") < F.col("b.r_cust"), 1).otherwise(0)
    )
    pairs = a.join(
        F.broadcast(b), F.col("a.nation") != F.col("b.nation")
    ).select(
        F.col("a.nation").alias("i"),
        F.when(maj >= 2, 1).otherwise(0).alias("wins"),
    )
    cope = pairs.groupBy(F.col("i").alias("nation")).agg(
        F.sum("wins").cast("bigint").alias("copeland_wins")
    )
    return (
        borda.join(cope, "nation")
        .select(
            "nation",
            "borda_score",
            "copeland_wins",
            (F.col("copeland_wins") == 24).alias("is_condorcet_winner"),
        )
        .orderBy(
            F.col("borda_score").desc(), F.col("copeland_wins").desc(), "nation"
        )
    )


@register(
    "kendall_distance_rankings",
    f"""
    WITH {_METRICS_SQL},
    pairs AS (
      SELECT a.nation AS i, b.nation AS j,
             CASE WHEN (a.r_rev - b.r_rev) * (a.r_ord - b.r_ord) < 0
                  THEN 1 ELSE 0 END AS d_rev_ord,
             CASE WHEN (a.r_rev - b.r_rev) * (a.r_cust - b.r_cust) < 0
                  THEN 1 ELSE 0 END AS d_rev_cust,
             CASE WHEN (a.r_ord - b.r_ord) * (a.r_cust - b.r_cust) < 0
                  THEN 1 ELSE 0 END AS d_ord_cust
      FROM ranks a JOIN ranks b ON a.nation < b.nation)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(d_rev_ord) AS BIGINT) AS kd_revenue_vs_orders,
           CAST(sum(d_rev_cust) AS BIGINT) AS kd_revenue_vs_customers,
           CAST(sum(d_ord_cust) AS BIGINT) AS kd_orders_vs_customers,
           round(1.0 - 2.0 * sum(d_rev_ord) / count(*), 6) + 0.0
             AS tau_revenue_vs_orders,
           round(1.0 - 2.0 * sum(d_rev_cust) / count(*), 6) + 0.0
             AS tau_revenue_vs_customers,
           round(1.0 - 2.0 * sum(d_ord_cust) / count(*), 6) + 0.0
             AS tau_orders_vs_customers
    FROM pairs
    """,
    tags=("ranking", "correlation"),
)
def q_kendall_distance_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau distance (discordant-pair count) between each pair
    of the three nation rankings, plus the implied tau = 1 - 2K/C(n,2)
    -- the bubble-sort-swap metric for 'how different are these two
    league tables'. Exact integer ranks, 300 constant pairs, pure
    integer discordance counting."""
    ranks = _spark_metrics(spark, sf_dir)
    a = ranks.alias("a")
    b = ranks.alias("b")

    def disc(ra: str, rb: str):
        return F.when(
            (F.col(f"a.{ra}") - F.col(f"b.{ra}"))
            * (F.col(f"a.{rb}") - F.col(f"b.{rb}"))
            < 0,
            1,
        ).otherwise(0)

    pairs = a.join(
        F.broadcast(b), F.col("a.nation") < F.col("b.nation")
    ).select(
        disc("r_rev", "r_ord").alias("d_rev_ord"),
        disc("r_rev", "r_cust").alias("d_rev_cust"),
        disc("r_ord", "r_cust").alias("d_ord_cust"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("d_rev_ord").cast("bigint").alias("kd_revenue_vs_orders"),
        F.sum("d_rev_cust").cast("bigint").alias("kd_revenue_vs_customers"),
        F.sum("d_ord_cust").cast("bigint").alias("kd_orders_vs_customers"),
    )
    return agg.select(
        "n_pairs",
        "kd_revenue_vs_orders",
        "kd_revenue_vs_customers",
        "kd_orders_vs_customers",
        (
            F.round(
                1.0 - 2.0 * F.col("kd_revenue_vs_orders") / F.col("n_pairs"), 6
            )
            + F.lit(0.0)
        ).alias("tau_revenue_vs_orders"),
        (
            F.round(
                1.0
                - 2.0 * F.col("kd_revenue_vs_customers") / F.col("n_pairs"),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_revenue_vs_customers"),
        (
            F.round(
                1.0 - 2.0 * F.col("kd_orders_vs_customers") / F.col("n_pairs"),
                6,
            )
            + F.lit(0.0)
        ).alias("tau_orders_vs_customers"),
    )


def _bt_round_sql(i: int) -> str:
    t = (
        "CAST(g.n_games AS DOUBLE)"
        " / (pa.pi + pb.pi)"
    )
    return f"""
    btd{i} AS (
      SELECT g.i,
             CAST(sum(CAST(floor(({t}) * 1e12 + 0.5) AS BIGINT)) AS HUGEINT)
               AS den_e12
      FROM games g
      JOIN bt{i} pa ON pa.nation = g.i
      JOIN bt{i} pb ON pb.nation = g.j
      GROUP BY g.i),
    btu{i} AS (
      SELECT w.nation,
             CAST(w.wins AS DOUBLE)
               / (CAST(d.den_e12 AS DOUBLE) / 1e12) AS pi_raw
      FROM wins w JOIN btd{i} d ON d.i = w.nation),
    btn{i} AS (
      SELECT CAST(sum(CAST(floor(pi_raw * 1e9 + 0.5) AS BIGINT)) AS HUGEINT)
               AS tot_e9
      FROM btu{i}),
    bt{i + 1} AS (
      SELECT u.nation,
             u.pi_raw * 25.0 / (CAST(t.tot_e9 AS DOUBLE) / 1e9) AS pi
      FROM btu{i} u CROSS JOIN btn{i} t)
    """


_BT_SQL = f"""
    WITH mrev AS (
      SELECT c.c_nationkey AS nation,
             date_trunc('month', o.o_orderdate) AS m,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    games AS MATERIALIZED (
      SELECT a.nation AS i, b.nation AS j,
             CAST(count(*) AS BIGINT) AS n_games,
             CAST(sum(CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wins
      FROM mrev a JOIN mrev b ON a.m = b.m AND a.nation <> b.nation
        AND a.rev <> b.rev
      GROUP BY 1, 2),
    wins AS MATERIALIZED (
      SELECT i AS nation, CAST(sum(n_wins) AS BIGINT) AS wins
      FROM games GROUP BY i),
    bt0 AS (SELECT nation, CAST(1.0 AS DOUBLE) AS pi FROM wins),
    {",".join(_bt_round_sql(k).strip() for k in range(_BT_ROUNDS))}
    SELECT w.nation, w.wins AS total_wins,
           round(p.pi, 6) AS bt_strength
    FROM bt{_BT_ROUNDS} p JOIN wins w ON w.nation = p.nation
    ORDER BY round(p.pi, 6) DESC, w.nation
    """


@register(
    "bradley_terry_nations",
    _BT_SQL,
    tags=("ranking", "ml", "paired-comparison"),
)
def q_bradley_terry_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths from monthly revenue head-to-heads:
    nation i 'beats' j in any month its revenue is strictly higher;
    3 minorization fixed-point rounds pi_i <- W_i / sum_j n_ij /
    (pi_i + pi_j), normalized to mean 1 each round. The model turns
    W-L records against UNEVEN schedules into comparable strengths --
    exactly what raw win counts can't do. Fixed-point terms are
    e12-quantized (normalization e9) so both engines iterate
    identically; the game table is |nations|^2 x months, calendar-
    bounded."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    mrev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    a = mrev.alias("a")
    b = mrev.alias("b")
    games_df = (
        a.join(
            b,
            (F.col("a.m") == F.col("b.m"))
            & (F.col("a.nation") != F.col("b.nation"))
            & (F.col("a.rev") != F.col("b.rev")),
        )
        .groupBy(F.col("a.nation").alias("i"), F.col("b.nation").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_games"),
            F.sum(
                F.when(F.col("a.rev") > F.col("b.rev"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_wins"),
        )
    )

    # --- bounded-state driver fold (r9, closes the COVERAGE.md
    # reclassification item): per-round state is the 25-entry strength
    # vector and the input the <=600-cell game table, both O(1), so the
    # three MM rounds fold driver-side. Contrary to the r8 negative
    # note, the engine formulation is NOT order-sensitive: the only
    # cross-term sums are over e12/e9-quantized INTEGERS (t_e12,
    # tot_e9), and every double op below mirrors the SQL text
    # left-to-right on exact inputs (den_e12 < 2^53, tot_e9 < 2^53), so
    # Python IEEE doubles reproduce the engine rounds bit-for-bit --
    # pinned by test_ext150_invariants.test_bt_fold_matches_engine_rounds.
    import math
    from decimal import ROUND_HALF_UP, Decimal

    games = collect_nonempty(games_df, "bradley-terry game table")
    wins: dict[int, int] = {}
    for r in games:
        wins[r["i"]] = wins.get(r["i"], 0) + r["n_wins"]
    pi = {n: 1.0 for n in wins}
    for _ in range(_BT_ROUNDS):
        den_e12: dict[int, int] = {}
        for r in games:
            i, j = r["i"], r["j"]
            if i in pi and j in pi:
                t = math.floor(
                    float(r["n_games"]) / (pi[i] + pi[j]) * 1e12 + 0.5
                )
                den_e12[i] = den_e12.get(i, 0) + t
        pi_raw = {
            n: float(wins[n]) / (float(den_e12[n]) / 1e12) for n in den_e12
        }
        tot_e9 = sum(
            int(math.floor(v * 1e9 + 0.5)) for v in pi_raw.values()
        )
        pi = {
            n: v * 25.0 / (float(tot_e9) / 1e9) for n, v in pi_raw.items()
        }

    def _round6(x: float) -> float:
        # Spark's round(): HALF_UP on the shortest decimal repr
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    rows = [(n, wins[n], _round6(pi[n])) for n in pi]
    return (
        spark.createDataFrame(
            rows, "nation int, total_wins long, bt_strength double"
        )
        .orderBy(F.col("bt_strength").desc(), "nation")
    )
