"""Extension batch 40: Yule's K lexical richness, the Theil
inequality index, and a duplicate-payment audit screen.

Scale notes (the 100 TB story per query):
- yules_k_richness is the classic vocabulary-richness statistic over
  the word-frequency SPECTRUM: tokens -> per-(source, type) counts ->
  per-(source, multiplicity) spectrum (two groupBys, each map-side
  combinable), then K = 1e4*(sum m^2 V_m - N)/N^2 from exact
  integers. The spectrum is tiny regardless of corpus size.
- theil_index completes the inequality family (Gini/Lorenz/HHI):
  T = sum (x_i/X) ln(x_i/mu) over customer spend, each term an e9
  integer computed map-side from the exact spend and two broadcast
  scalars -- one customer groupBy plus one 1-row broadcast, fully
  decomposable (unlike Gini) so regional T's roll up.
- duplicate_payment_screen is the accounts-payable classic: orders by
  the SAME customer for the IDENTICAL amount within 3 days. The pair
  join is an equi-join on (customer, exact cents) -- naturally tiny
  fan-out per key -- with the day-window predicate applied inside;
  deterministic pair orientation by orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Yule's K per source from the word-frequency spectrum.
# ---------------------------------------------------------------------------
@register(
    "yules_k_richness",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    types AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS m
      FROM toks GROUP BY source, tok
    ),
    spectrum AS (
      SELECT source, m, CAST(count(*) AS BIGINT) AS vm
      FROM types GROUP BY source, m
    )
    SELECT source,
           CAST(sum(m * vm) AS BIGINT) AS n_tokens,
           CAST(sum(vm) AS BIGINT) AS n_types,
           round(10000.0 * (CAST(sum(m * m * vm) AS BIGINT)
                            - CAST(sum(m * vm) AS BIGINT))
                 / (CAST(sum(m * vm) AS DOUBLE) * sum(m * vm)), 6) AS yules_k
    FROM spectrum GROUP BY source
    """,
    tags=("text", "lexical", "richness"),
)
def q_yules_k_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K = 1e4*(sum m^2 V_m - N)/N^2 from the per-source frequency
    spectrum -- two map-side-combinable groupBys collapse the corpus
    to a handful of (multiplicity, type-count) rows, and every input
    to the closing double is an exact integer. Higher K = more
    repetitive vocabulary."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    types = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    spectrum = types.groupBy("source", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("vm")
    )
    n = F.sum(F.col("m") * F.col("vm")).cast("bigint")
    m2 = F.sum(F.col("m") * F.col("m") * F.col("vm")).cast("bigint")
    return spectrum.groupBy("source").agg(
        n.alias("n_tokens"),
        F.sum("vm").cast("bigint").alias("n_types"),
        F.round(
            10000.0 * (m2 - n) / (n.cast("double") * n),
            6,
        ).alias("yules_k"),
    )


# ---------------------------------------------------------------------------
# Theil T inequality index of customer spend.
# ---------------------------------------------------------------------------
@register(
    "theil_index",
    f"""
    WITH spend AS (
      SELECT o_custkey, CAST(sum({_CENTS}) AS BIGINT) AS x
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(sum(x) AS BIGINT) AS xx,
                   CAST(count(*) AS BIGINT) AS n FROM spend),
    terms AS (
      SELECT CAST(round(1000000000.0 * (CAST(s.x AS DOUBLE) / t.xx)
               * ln(CAST(s.x AS DOUBLE) * t.n / t.xx), 0) AS BIGINT) AS t_e9
      FROM spend s CROSS JOIN tot t WHERE s.x > 0
    )
    SELECT (SELECT n FROM tot) AS n_customers,
           CAST(sum(t_e9) AS BIGINT) AS theil_e9,
           round(CAST(sum(t_e9) AS DOUBLE) / 1000000000.0
                 / ln((SELECT CAST(n AS DOUBLE) FROM tot)), 6)
             AS theil_normalized
    FROM terms
    """,
    tags=("stats", "inequality", "decomposable"),
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T = sum (x/X) ln(x n / X) over customer spend: each term an e9
    integer computed map-side against two broadcast scalars, so the
    sum is exact and order-free; normalized by ln(n) to [0, 1]. The
    decomposable inequality measure (Gini isn't) -- regional T's roll
    up additively at 100 TB."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("x")
    )
    tot = spend.agg(
        F.sum("x").cast("bigint").alias("xx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    term = F.round(
        F.lit(1000000000.0)
        * (F.col("x").cast("double") / F.col("xx"))
        * F.log(F.col("x").cast("double") * F.col("n") / F.col("xx")),
        0,
    ).cast("bigint")
    return (
        spend.crossJoin(F.broadcast(tot))
        .where(F.col("x") > 0)
        .agg(
            F.max("n").alias("n_customers"),
            F.sum(term).cast("bigint").alias("theil_e9"),
            F.round(
                F.sum(term).cast("double")
                / 1000000000.0
                / F.log(F.max("n").cast("double")),
                6,
            ).alias("theil_normalized"),
        )
        .select(
            F.col("n_customers").cast("bigint").alias("n_customers"),
            "theil_e9",
            "theil_normalized",
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-payment screen: same customer, identical amount, <=3 days.
# ---------------------------------------------------------------------------
@register(
    "duplicate_payment_screen",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(round(value * 100, 0) AS BIGINT) // 100 AS dollars,
             epoch_us(ts) AS t
      FROM events
    )
    SELECT a.user_id, a.event_type, a.dollars,
           a.event_id AS event_a, b.event_id AS event_b,
           CAST(abs(a.t - b.t) AS BIGINT) AS gap_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
     AND a.dollars = b.dollars AND a.event_id < b.event_id
     AND abs(a.t - b.t) <= 86400000000
    """,
    tags=("fraud", "audit", "dedup"),
)
def q_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-submission candidates on the event stream: pairs by the
    same user, same action type, same whole-dollar amount within 24h.
    The self-join is an equi-join on (user, type, dollars) -- per-key
    fan-out is naturally tiny -- with the time window inside the join
    predicate and event_id orientation for deterministic pairs; gaps
    in integer microseconds."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT) DIV 100").alias("dollars"),
        F.unix_micros("ts").alias("t"),
    )
    a, b = e.alias("a"), e.alias("b")
    gap = F.abs(F.col("a.t") - F.col("b.t"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.dollars") == F.col("b.dollars"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (gap <= 86400000000),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_type").alias("event_type"),
            F.col("a.dollars").alias("dollars"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            gap.cast("bigint").alias("gap_us"),
        )
    )
