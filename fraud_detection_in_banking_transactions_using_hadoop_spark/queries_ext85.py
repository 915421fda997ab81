"""Extension batch 85: the Ansari-Bradley scale test and sequential
pattern support mining (pairs + triples).

- ansari_bradley: brown_forsythe/bartlett test variance PARAMETRICALLY
  or semi-robustly; AB is the fully rank-based scale test. Scores
  a_r = min(r, N+1-r) sum in closed form over each tie block (the
  doubled block sum is exact integer algebra on [lo, hi] split at the
  center), so the statistic, its mean, and the tie-corrected variance
  all close over exact integers (per-value floor-divisions carry a
  <= 1 error on ~1e12 sums -- identical both engines).
- sequence_support_pairs / _triples: which event-type ORDERINGS do
  users actually follow? A user supports (a -> b) iff min ts(a) <
  max ts(b) -- an O(1) per-user closed form, no pair join; (a -> b ->
  c) iff some b-event falls STRICTLY between min ts(a) and max ts(c)
  -- one equi-join of the event table against the per-user type
  min/max frame. The PrefixSpan support-counting core without the
  exponential candidate tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Ansari-Bradley scale test: purchase vs click event values.
# ---------------------------------------------------------------------------
@register(
    "ansari_bradley",
    """
    WITH vals AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE event_type IN ('purchase', 'click')),
    spine AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(arm) AS BIGINT) AS c1
      FROM vals GROUP BY v),
    pre AS (
      SELECT v, c, c1,
             coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             (SELECT CAST(sum(c) AS BIGINT) FROM spine) AS n
      FROM spine),
    blocks AS (
      SELECT c, c1, n,
             below + 1 AS lo, below + c AS hi,
             least(below + c, (n + 1) // 2) AS t,
             greatest(below + 1, least(below + c, (n + 1) // 2) + 1) AS u
      FROM pre),
    bs AS (
      SELECT c, c1, n,
             (CASE WHEN t >= lo THEN t * (t + 1) - (lo - 1) * lo ELSE 0 END
              + CASE WHEN hi >= u
                THEN 2 * (n + 1) * (hi - u + 1) - (hi * (hi + 1) - (u - 1) * u)
                ELSE 0 END) AS bs2
      FROM blocks),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(c1) AS HUGEINT) AS n1,
             CAST(sum(c - c1) AS HUGEINT) AS n0,
             CAST(sum((CAST(c1 AS HUGEINT) * bs2) // c) AS HUGEINT) AS ab2,
             CAST(sum(bs2) AS HUGEINT) AS sa2,
             CAST(sum((CAST(bs2 AS HUGEINT) * bs2) // (4 * c)) AS HUGEINT)
               AS saa
      FROM bs),
    z AS (
      SELECT n, n1, n0, ab2,
             CAST(ab2 AS DOUBLE) / 2.0
               - CAST(n1 AS DOUBLE) * sa2 / (2.0 * n) AS num,
             CAST(n1 AS DOUBLE) * n0
               * (CAST(n AS DOUBLE) * saa
                  - CAST(sa2 AS DOUBLE) / 2.0 * (CAST(sa2 AS DOUBLE) / 2.0))
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS var_ab
      FROM agg)
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n0 AS BIGINT) AS n_click,
           CAST(ab2 AS BIGINT) AS ab_x2,
           round(num / sqrt(var_ab), 6) + 0.0 AS z_score
    FROM z
    """,
    tags=("stats", "scale-test", "exact-arith"),
)
def q_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley: do purchase values have different DISPERSION
    than click values (same-center alternative the location tests
    can't see)? Scores min(r, N+1-r) sum per tie block via exact
    closed-form integer algebra (split the [lo, hi] rank block at the
    center); the doubled statistic, its mean n1 sum(a)/N and the
    tie-corrected variance n1 n0 (N sum(a^2) - sum(a)^2)/(N^2(N-1))
    all close over exact integer aggregates. Small AB = sample 1
    concentrated in the tails = MORE spread."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.where(F.col("event_type").isin("purchase", "click")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("arm"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    spine = vals.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("arm").cast("bigint").alias("c1"),
    )
    ntot = spine.agg(F.sum("c").cast("bigint").alias("n"))
    pre = (
        with_global_rank(spine, "v", [F.col("v")], prefix_sum={"cc": "c"})
        .select("c", "c1", (F.col("cc") - F.col("c")).alias("below"))
        .crossJoin(F.broadcast(ntot))
    )
    lo = F.col("below") + 1
    hi = F.col("below") + F.col("c")
    t = F.least(hi, F.expr("(n + 1) DIV 2"))
    blocks = pre.select(
        "c",
        "c1",
        "n",
        lo.alias("lo"),
        hi.alias("hi"),
        t.alias("t"),
        F.greatest(lo, t + 1).alias("u"),
    )
    bs2 = (
        F.when(
            F.col("t") >= F.col("lo"),
            F.col("t") * (F.col("t") + 1) - (F.col("lo") - 1) * F.col("lo"),
        ).otherwise(F.lit(0))
        + F.when(
            F.col("hi") >= F.col("u"),
            2 * (F.col("n") + 1) * (F.col("hi") - F.col("u") + 1)
            - (F.col("hi") * (F.col("hi") + 1) - (F.col("u") - 1) * F.col("u")),
        ).otherwise(F.lit(0))
    )
    bs = blocks.select("c", "c1", "n", bs2.alias("bs2"))
    agg = bs.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("c1").cast(_DEC).alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast(_DEC).alias("n0"),
        F.sum(F.expr("CAST((CAST(c1 AS DECIMAL(38,0)) * bs2) DIV c AS DECIMAL(38,0))"))
        .cast(_DEC)
        .alias("ab2"),
        F.sum("bs2").cast(_DEC).alias("sa2"),
        F.sum(
            F.expr(
                "CAST((CAST(bs2 AS DECIMAL(38,0)) * bs2) DIV (4 * c)"
                " AS DECIMAL(38,0))"
            )
        )
        .cast(_DEC)
        .alias("saa"),
    )
    nd = F.col("n").cast("double")
    num = F.col("ab2").cast("double") / 2.0 - F.col("n1").cast("double") * F.col(
        "sa2"
    ) / (2.0 * F.col("n"))
    var_ab = (
        F.col("n1").cast("double")
        * F.col("n0")
        * (
            nd * F.col("saa").cast("double")
            - F.col("sa2").cast("double") / 2.0 * (F.col("sa2").cast("double") / 2.0)
        )
        / (nd * F.col("n") * (F.col("n") - 1))
    )
    z = agg.select("n", "n1", "n0", "ab2", num.alias("num"), var_ab.alias("var_ab"))
    return z.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n0").cast("bigint").alias("n_click"),
        F.col("ab2").cast("bigint").alias("ab_x2"),
        (F.round(F.col("num") / F.sqrt("var_ab"), 6) + 0.0).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Sequential pattern support: type pairs.
# ---------------------------------------------------------------------------
@register(
    "sequence_support_pairs",
    """
    WITH mm AS (
      SELECT user_id, event_type AS t,
             min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
      FROM events GROUP BY user_id, event_type),
    total AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM mm),
    sup AS (
      SELECT a.t AS type_a, b.t AS type_b,
             CAST(count(*) AS BIGINT) AS n_users
      FROM mm a JOIN mm b ON a.user_id = b.user_id
      WHERE a.mn < b.mx
      GROUP BY a.t, b.t)
    SELECT type_a, type_b, n_users,
           round(CAST(n_users AS DOUBLE) / (SELECT nu FROM total), 6)
             AS support_rate
    FROM sup ORDER BY type_a, type_b
    """,
    tags=("sequence", "mining", "exact-arith"),
)
def q_sequence_support_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support of every ordered event-type pair (a -> b): a user
    supports it iff their FIRST a precedes their LAST b -- an O(1)
    closed form over the per-(user, type) min/max frame, so the count
    is one self-equi-join on user_id of a users x types table (no
    event-pair join). The diagonal (a -> a) demands two distinct
    events by min < max. This is the PrefixSpan L2 support table."""
    ev = read_table(spark, sf_dir, "events")
    mm = ev.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    total = mm.agg(F.countDistinct("user_id").cast("bigint").alias("nu"))
    a, b = mm.alias("a"), mm.alias("b")
    sup = (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .where(F.col("a.mn") < F.col("b.mx"))
        .groupBy(F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    return (
        sup.crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("nu"), 6).alias(
                "support_rate"
            ),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Sequential pattern support: type triples (top 20).
# ---------------------------------------------------------------------------
@register(
    "sequence_support_triples",
    """
    WITH mm AS (
      SELECT user_id, event_type AS t,
             min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
      FROM events GROUP BY user_id, event_type),
    mids AS (
      SELECT DISTINCT e.user_id, a.t AS type_a, e.event_type AS type_b,
             c.t AS type_c
      FROM events e
      JOIN mm a ON a.user_id = e.user_id
      JOIN mm c ON c.user_id = e.user_id
      WHERE epoch_us(e.ts) > a.mn AND epoch_us(e.ts) < c.mx),
    total AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM mm),
    sup AS (
      SELECT type_a, type_b, type_c, CAST(count(*) AS BIGINT) AS n_users
      FROM mids GROUP BY type_a, type_b, type_c)
    SELECT type_a, type_b, type_c, n_users,
           round(CAST(n_users AS DOUBLE) / (SELECT nu FROM total), 6)
             AS support_rate
    FROM sup
    ORDER BY n_users DESC, type_a, type_b, type_c LIMIT 20
    """,
    tags=("sequence", "mining", "exact-arith"),
)
def q_sequence_support_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support of ordered type triples (a -> b -> c): a user supports
    it iff SOME b-event falls strictly between their first a and last
    c -- one pass of the event table joined (equi on user_id) against
    the per-user type min/max frame, then a distinct + count. Linear
    in events x types^2, never events^2. Top-20 motifs with full
    name tiebreaks."""
    ev = read_table(spark, sf_dir, "events")
    mm = ev.groupBy("user_id", F.col("event_type").alias("t")).agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    e = ev.select(
        "user_id", F.col("event_type").alias("type_b"), F.unix_micros("ts").alias("us")
    )
    a = mm.select("user_id", F.col("t").alias("type_a"), "mn")
    c = mm.select("user_id", F.col("t").alias("type_c"), "mx")
    mids = (
        e.join(a, "user_id")
        .where(F.col("us") > F.col("mn"))
        .join(c, "user_id")
        .where(F.col("us") < F.col("mx"))
        .select("user_id", "type_a", "type_b", "type_c")
        .distinct()
    )
    total = mm.agg(F.countDistinct("user_id").cast("bigint").alias("nu"))
    sup = mids.groupBy("type_a", "type_b", "type_c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return (
        sup.crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "type_c",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("nu"), 6).alias(
                "support_rate"
            ),
        )
        .orderBy(F.col("n_users").desc(), "type_a", "type_b", "type_c")
        .limit(20)
    )
