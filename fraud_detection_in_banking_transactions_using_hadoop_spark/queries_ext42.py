"""Extension batch 42: Luhn card validation, D'Hondt seat allocation,
and randomized-response debiasing.

Scale notes (the 100 TB story per query):
- luhn_check_summary is the card-network checksum at the heart of the
  reference's domain: deterministic 16-digit PANs are synthesized per
  customer (md5 nibbles + a computed Luhn check digit), a deterministic
  subset is corrupted by a single-digit bump, and the map-side Luhn
  validator (double every second digit from the right, digit-sum mod
  10) must flag EXACTLY the corrupted cards -- single-digit errors are
  always detected, which the invariant test pins. Pure integer
  expressions, one summary aggregate.
- dhondt_allocation is the highest-quotient proportional allocator
  (the Jefferson/D'Hondt method parliaments and shard-assignment
  schemes share): the quotient grid v/k is a map-side explode, ranked
  by exact integer e6 quotients with deterministic tiebreaks, and
  seats are the per-party count inside the top-S ordered limit.
  Companion to the Hamilton largest-remainder allocator.
- randomized_response_debias is local differential privacy's classic
  mechanism run end-to-end: a deterministic hash coin decides
  truth-vs-noise per respondent, and the aggregate inverts the
  mechanism exactly -- p_hat = (8k - n)/(6n) in integer ppm --
  recovering the true rate the raw noisy share hides. Both the noisy
  and debiased estimates sit next to the ground truth in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Luhn checksum over synthesized PANs with deterministic corruption.
# ---------------------------------------------------------------------------
# digit i (1..15) of the PAN = i-th md5 hex nibble of the custkey, mod 10
_D_SQL = " , ".join(
    f"('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), {i}, 1))::BIGINT % 10"
    for i in range(1, 16)
)


@register(
    "luhn_check_summary",
    f"""
    WITH digits AS (
      SELECT c_custkey, [{_D_SQL}] AS d15 FROM customer
    ),
    summed AS (
      -- Luhn weights for positions 1..15 of a 16-digit PAN (check digit
      -- at position 16): odd positions are doubled (digit-sum applied)
      SELECT c_custkey, d15,
             CAST(list_sum(list_transform(range(1, 16),
               i -> CASE WHEN i % 2 = 1
                    THEN CASE WHEN 2 * d15[i] > 9 THEN 2 * d15[i] - 9
                         ELSE 2 * d15[i] END
                    ELSE d15[i] END)) AS BIGINT) AS s
      FROM digits
    ),
    cards AS (
      SELECT c_custkey, d15, (10 - s % 10) % 10 AS check_digit,
             CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS corrupted
      FROM summed
    ),
    validated AS (
      SELECT c_custkey, corrupted,
             -- re-validate after corrupting digit 5 by +1 (mod 10) on
             -- the flagged subset; digit 5 is an odd position (doubled)
             CAST(list_sum(list_transform(range(1, 16),
               i -> CASE WHEN i % 2 = 1
                    THEN CASE WHEN 2 * (CASE WHEN i = 5 AND corrupted = 1
                                        THEN (d15[i] + 1) % 10
                                        ELSE d15[i] END) > 9
                         THEN 2 * (CASE WHEN i = 5 AND corrupted = 1
                                   THEN (d15[i] + 1) % 10 ELSE d15[i] END) - 9
                         ELSE 2 * (CASE WHEN i = 5 AND corrupted = 1
                                   THEN (d15[i] + 1) % 10 ELSE d15[i] END)
                         END
                    ELSE d15[i] END)) + check_digit AS BIGINT) AS total
      FROM cards
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cards,
           CAST(sum(corrupted) AS BIGINT) AS n_corrupted,
           CAST(sum(CASE WHEN total % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           CAST(sum(CASE WHEN total % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_invalid
    FROM validated
    """,
    tags=("fraud", "checksum", "luhn"),
)
def q_luhn_check_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a PAN per customer (15 md5-nibble digits + computed
    Luhn check digit), corrupt digit 5 by +1 on custkey % 7 == 0, and
    validate map-side: Luhn detects every single-digit error, so
    n_invalid must equal n_corrupted (invariant-pinned). All integer
    expressions, one closing aggregate."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    nib = lambda i: (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), i, 1), 16, 10)
        .cast("bigint")
        % 10
    )
    d = [nib(i) for i in range(1, 16)]

    def luhn_part(digits):
        # positions 1..15 (check digit at 16): odd positions doubled
        total = F.lit(0)
        for i, dig in enumerate(digits, start=1):
            if i % 2 == 1:
                dbl = 2 * dig
                total = total + F.when(dbl > 9, dbl - 9).otherwise(dbl)
            else:
                total = total + dig
        return total

    s = luhn_part(d)
    check = (10 - s % 10) % 10
    corrupted = F.when(F.col("c_custkey") % 7 == 0, 1).otherwise(0)
    d_corr = list(d)
    d_corr[4] = F.when(corrupted == 1, (d[4] + 1) % 10).otherwise(d[4])
    total = luhn_part(d_corr) + check
    base = cust.select(
        corrupted.alias("corrupted"), (total % 10).alias("rem")
    )
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cards"),
        F.sum("corrupted").cast("bigint").alias("n_corrupted"),
        F.sum(F.when(F.col("rem") == 0, 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(F.when(F.col("rem") != 0, 1).otherwise(0)).cast("bigint").alias("n_invalid"),
    )


# ---------------------------------------------------------------------------
# D'Hondt highest-quotient seat allocation.
# ---------------------------------------------------------------------------
_SEATS = 50


@register(
    "dhondt_allocation",
    f"""
    WITH votes AS (
      SELECT c_nationkey AS party, CAST(count(*) AS BIGINT) AS v
      FROM customer GROUP BY c_nationkey
    ),
    grid AS (
      SELECT party, v, k.k,
             (1000000 * v) // k.k AS quotient_e6
      FROM votes, (SELECT unnest(range(1, {_SEATS} + 1)) AS k) k
    ),
    top AS (
      SELECT party FROM grid
      ORDER BY quotient_e6 DESC, party, k LIMIT {_SEATS}
    )
    SELECT v.party, v.v AS votes,
           CAST(coalesce(t.seats, 0) AS BIGINT) AS seats
    FROM votes v
    LEFT JOIN (SELECT party, count(*) AS seats FROM top GROUP BY party) t
      ON v.party = t.party
    """,
    tags=("allocation", "dhondt", "A1"),
)
def q_dhondt_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50 seats by highest quotients v/k (k = 1..50): the quotient grid
    is a map-side explode, ranked by the EXACT integer e6 quotient with
    (party, k) tiebreaks, and seats are per-party counts inside the
    top-50 ordered limit. The proportional allocator that complements
    Hamilton's largest remainder."""
    votes = read_table(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("party")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    grid = votes.select(
        "party",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(_SEATS))).alias("k"),
    ).select("party", "v", "k", F.expr("(1000000 * v) DIV k").alias("quotient_e6"))
    top = grid.orderBy(F.col("quotient_e6").desc(), "party", "k").limit(_SEATS)
    seats = top.groupBy("party").agg(F.count(F.lit(1)).alias("seats"))
    return votes.join(seats, "party", "left").select(
        "party",
        F.col("v").alias("votes"),
        F.coalesce(F.col("seats"), F.lit(0)).cast("bigint").alias("seats"),
    )


# ---------------------------------------------------------------------------
# Randomized response (local DP) with exact debiasing.
# ---------------------------------------------------------------------------
@register(
    "randomized_response_debias",
    """
    WITH resp AS (
      SELECT CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS truth,
             CASE WHEN ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'coin1'),
                        1, 8))::BIGINT % 4 < 3
                  THEN CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END
                  ELSE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || 'coin2'),
                        1, 8))::BIGINT % 2
             END AS report
      FROM customer
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(truth) AS BIGINT) AS k_true,
           CAST(sum(report) AS BIGINT) AS k_reported,
           CAST((1000000 * sum(truth)) // count(*) AS BIGINT) AS true_ppm,
           CAST((1000000 * sum(report)) // count(*) AS BIGINT)
             AS reported_ppm,
           CAST((1000000 * (8 * sum(report) - count(*))) // (6 * count(*))
                AS BIGINT) AS debiased_ppm
    FROM resp
    """,
    tags=("privacy", "ldp", "randomized-response"),
)
def q_randomized_response_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner's randomized response with deterministic hash coins: with
    probability 3/4 the respondent reports the truth (balance > 5000),
    else a fair coin. The mechanism inverts exactly: p_hat = (8k - n)
    / (6n) in integer ppm, shown beside the raw noisy share and the
    ground truth -- the local-DP estimator end-to-end, fully
    reproducible."""
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    truth = F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)
    coin1 = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("coin1"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 4
    )
    coin2 = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit("coin2"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    resp = cust.select(
        truth.alias("truth"),
        F.when(coin1 < 3, truth).otherwise(coin2).alias("report"),
    )
    return resp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("truth").cast("bigint").alias("k_true"),
        F.sum("report").cast("bigint").alias("k_reported"),
        F.expr("CAST((1000000 * sum(truth)) DIV count(*) AS BIGINT)").alias("true_ppm"),
        F.expr("CAST((1000000 * sum(report)) DIV count(*) AS BIGINT)").alias(
            "reported_ppm"
        ),
        F.expr(
            "CAST((1000000 * (8 * sum(report) - count(*))) DIV (6 * count(*)) AS BIGINT)"
        ).alias("debiased_ppm"),
    )
