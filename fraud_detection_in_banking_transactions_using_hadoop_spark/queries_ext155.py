"""Extension batch 155 (round 6): reciprocal-rank-fusion quality
scoring for the document corpus (the standard way retrieval and
dataset-curation pipelines combine incomparable signals -- ranks, not
raw scores, so no signal's scale dominates), TOPSIS multi-criteria
ranking of nations with entropy-derived weights (the
distance-to-ideal method that complements Borda/Copeland's ordinal
aggregation with a cardinal one), and the near-duplicate payments
screen (amounts within a dollar on DIFFERENT days -- the fuzzy twin
of duplicate_amount_audit's exact-collision audit, caught via a
banded self-join, never all-pairs).

Cross-engine discipline:
- RRF: each signal's rank comes off a with_global_rank pass (exact,
  doc_id tiebreak); per-signal 1/(60+r) terms are e12-quantized so
  the fused score is an exact integer sum.
- TOPSIS: entropy weights and ideal distances are double chains over
  exact integer metric sums (3-term expressions, deterministic).
- near-dup: candidate pairs come from dollar-bucket equi-joins
  (each amount probes its own and the next bucket), so the join is
  banded like the LSH tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_RRF_K = 60


@register(
    "rrf_quality_fusion",
    f"""
    WITH sig AS (
      SELECT doc_id,
             CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
               AS s_len,
             CAST(len(regexp_extract_all(text, '[a-z]{{7,}}')) AS BIGINT)
               AS s_long,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS s_langfreq
      FROM documents),
    r1 AS (SELECT doc_id, rank() OVER (ORDER BY s_len DESC, doc_id) AS r
           FROM sig),
    r2 AS (SELECT doc_id, rank() OVER (ORDER BY s_long DESC, doc_id) AS r
           FROM sig),
    r3 AS (SELECT doc_id, rank() OVER (ORDER BY s_langfreq DESC, doc_id) AS r
           FROM sig),
    fused AS (
      SELECT r1.doc_id,
             CAST(floor(1e12 / ({_RRF_K} + r1.r) + 0.5) AS BIGINT)
             + CAST(floor(1e12 / ({_RRF_K} + r2.r) + 0.5) AS BIGINT)
             + CAST(floor(1e12 / ({_RRF_K} + r3.r) + 0.5) AS BIGINT)
               AS rrf_e12
      FROM r1 JOIN r2 ON r1.doc_id = r2.doc_id
      JOIN r3 ON r1.doc_id = r3.doc_id)
    SELECT doc_id, round(rrf_e12 / 1e12, 9) AS rrf_score
    FROM fused
    ORDER BY rrf_e12 DESC, doc_id
    LIMIT 20
    """,
    tags=("text", "quality", "rank-fusion"),
)
def q_rrf_quality_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of three incomparable document-quality
    signals (letter volume, long-word count, language-family
    frequency): score = sum 1/(60 + rank_i). RRF needs only RANKS, so
    a signal with a wild scale can't swamp the others -- the reason
    it's the default fusion in retrieval stacks. Every rank rides
    operators/rank.with_global_rank (doc_id tiebreak), the reciprocal
    terms are e12-quantized integers, and the top-20 curation queue is
    ordered by the exact fused integer."""
    docs = read_table(spark, sf_dir, "documents")
    lang_freq = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_langfreq")
    )
    sig = docs.join(F.broadcast(lang_freq), "lang").select(
        "doc_id",
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
        .cast("bigint")
        .alias("s_len"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]{7,}', 0)"))
        .cast("bigint")
        .alias("s_long"),
        "s_langfreq",
    )

    def leg(col: str) -> DataFrame:
        ranked = with_global_rank(
            sig.select("doc_id", col),
            col,
            [F.desc(col), F.col("doc_id").asc()],
            ascending=False,
            rank_col="rk",
        )
        return ranked.select(
            "doc_id",
            F.floor(F.lit(1e12) / (_RRF_K + F.col("rk")) + 0.5)
            .cast("bigint")
            .alias(f"t_{col}"),
        )

    fused = (
        leg("s_len")
        .join(leg("s_long"), "doc_id")
        .join(leg("s_langfreq"), "doc_id")
        .select(
            "doc_id",
            (
                F.col("t_s_len") + F.col("t_s_long") + F.col("t_s_langfreq")
            ).alias("rrf_e12"),
        )
    )
    return (
        fused.orderBy(F.col("rrf_e12").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round(F.col("rrf_e12") / 1e12, 9).alias("rrf_score"))
    )


@register(
    "topsis_nation_ranking",
    """
    WITH met AS (
      SELECT c.c_nationkey AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey),
    tots AS (
      SELECT CAST(sum(rev) AS HUGEINT) AS t_rev,
             CAST(sum(n_orders) AS HUGEINT) AS t_ord,
             CAST(sum(n_cust) AS HUGEINT) AS t_cust,
             CAST(count(*) AS BIGINT) AS k
      FROM met),
    sh AS (
      SELECT m.nation,
             CAST(m.rev AS DOUBLE) / CAST(t.t_rev AS DOUBLE) AS p1,
             CAST(m.n_orders AS DOUBLE) / CAST(t.t_ord AS DOUBLE) AS p2,
             CAST(m.n_cust AS DOUBLE) / CAST(t.t_cust AS DOUBLE) AS p3,
             t.k
      FROM met m CROSS JOIN tots t),
    ent AS (
      SELECT 1.0 + sum(p1 * ln(p1)) / ln(CAST(max(k) AS DOUBLE)) AS d1,
             1.0 + sum(p2 * ln(p2)) / ln(CAST(max(k) AS DOUBLE)) AS d2,
             1.0 + sum(p3 * ln(p3)) / ln(CAST(max(k) AS DOUBLE)) AS d3
      FROM sh),
    wts AS (
      SELECT d1 / (d1 + d2 + d3) AS w1, d2 / (d1 + d2 + d3) AS w2,
             d3 / (d1 + d2 + d3) AS w3
      FROM ent),
    lims AS (
      SELECT max(p1) AS p1x, min(p1) AS p1n, max(p2) AS p2x, min(p2) AS p2n,
             max(p3) AS p3x, min(p3) AS p3n
      FROM sh),
    scored AS (
      SELECT s.nation,
             sqrt(w.w1 * w.w1 * (s.p1 - l.p1x) * (s.p1 - l.p1x)
                + w.w2 * w.w2 * (s.p2 - l.p2x) * (s.p2 - l.p2x)
                + w.w3 * w.w3 * (s.p3 - l.p3x) * (s.p3 - l.p3x)) AS d_plus,
             sqrt(w.w1 * w.w1 * (s.p1 - l.p1n) * (s.p1 - l.p1n)
                + w.w2 * w.w2 * (s.p2 - l.p2n) * (s.p2 - l.p2n)
                + w.w3 * w.w3 * (s.p3 - l.p3n) * (s.p3 - l.p3n)) AS d_minus
      FROM sh s CROSS JOIN wts w CROSS JOIN lims l)
    SELECT nation,
           round(d_plus, 6) AS dist_to_ideal,
           round(d_minus, 6) AS dist_to_worst,
           round(CASE WHEN d_plus + d_minus = 0 THEN 0.5
                 ELSE d_minus / (d_plus + d_minus) END, 6) AS topsis_closeness
    FROM scored
    ORDER BY CASE WHEN d_plus + d_minus = 0 THEN 0.5
                  ELSE d_minus / (d_plus + d_minus) END DESC, nation
    """,
    tags=("ranking", "mcdm"),
)
def q_topsis_nation_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS over the 25-nation market table with ENTROPY weights:
    each metric's weight is its Shannon-dispersion (metrics where
    nations differ most count most), and each nation's closeness =
    d- / (d+ + d-) to the weighted ideal/anti-ideal points. The
    cardinal companion to borda_copeland_nations: TOPSIS sees by HOW
    MUCH a nation leads, not just that it does. All shares from exact
    integer totals; distances are fixed 3-term chains."""
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
    tots = met.agg(
        F.sum("rev").cast(_DEC).alias("t_rev"),
        F.sum("n_orders").cast(_DEC).alias("t_ord"),
        F.sum("n_cust").cast(_DEC).alias("t_cust"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    sh = met.crossJoin(F.broadcast(tots)).select(
        "nation",
        (F.col("rev").cast("double") / F.col("t_rev").cast("double")).alias("p1"),
        (
            F.col("n_orders").cast("double") / F.col("t_ord").cast("double")
        ).alias("p2"),
        (F.col("n_cust").cast("double") / F.col("t_cust").cast("double")).alias(
            "p3"
        ),
        "k",
    )
    ent = sh.agg(
        (
            1.0
            + F.sum(F.col("p1") * F.log("p1"))
            / F.log(F.max("k").cast("double"))
        ).alias("d1"),
        (
            1.0
            + F.sum(F.col("p2") * F.log("p2"))
            / F.log(F.max("k").cast("double"))
        ).alias("d2"),
        (
            1.0
            + F.sum(F.col("p3") * F.log("p3"))
            / F.log(F.max("k").cast("double"))
        ).alias("d3"),
    )
    wts = ent.select(
        (F.col("d1") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w1"),
        (F.col("d2") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w2"),
        (F.col("d3") / (F.col("d1") + F.col("d2") + F.col("d3"))).alias("w3"),
    )
    lims = sh.agg(
        F.max("p1").alias("p1x"),
        F.min("p1").alias("p1n"),
        F.max("p2").alias("p2x"),
        F.min("p2").alias("p2n"),
        F.max("p3").alias("p3x"),
        F.min("p3").alias("p3n"),
    )
    scored = (
        sh.crossJoin(F.broadcast(wts))
        .crossJoin(F.broadcast(lims))
        .select(
            "nation",
            F.sqrt(
                F.col("w1") * F.col("w1") * (F.col("p1") - F.col("p1x")) * (F.col("p1") - F.col("p1x"))
                + F.col("w2") * F.col("w2") * (F.col("p2") - F.col("p2x")) * (F.col("p2") - F.col("p2x"))
                + F.col("w3") * F.col("w3") * (F.col("p3") - F.col("p3x")) * (F.col("p3") - F.col("p3x"))
            ).alias("d_plus"),
            F.sqrt(
                F.col("w1") * F.col("w1") * (F.col("p1") - F.col("p1n")) * (F.col("p1") - F.col("p1n"))
                + F.col("w2") * F.col("w2") * (F.col("p2") - F.col("p2n")) * (F.col("p2") - F.col("p2n"))
                + F.col("w3") * F.col("w3") * (F.col("p3") - F.col("p3n")) * (F.col("p3") - F.col("p3n"))
            ).alias("d_minus"),
        )
    )
    closeness = F.when(F.col("d_plus") + F.col("d_minus") == 0, 0.5).otherwise(
        F.col("d_minus") / (F.col("d_plus") + F.col("d_minus"))
    )
    return scored.select(
        "nation",
        F.round(F.col("d_plus"), 6).alias("dist_to_ideal"),
        F.round(F.col("d_minus"), 6).alias("dist_to_worst"),
        F.round(closeness, 6).alias("topsis_closeness"),
    ).orderBy(closeness.desc(), "nation")


@register(
    "near_duplicate_payments",
    """
    WITH t AS (
      SELECT o_orderkey AS ok, o_custkey AS cust,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders),
    probe AS (
      SELECT ok, cust, cents, d, cents // 100 + b.off AS bucket
      FROM t, (SELECT unnest([-1, 0, 1]) AS off) b),
    cand AS (
      SELECT a.cust, a.ok AS ok_a, bb.ok AS ok_b,
             abs(a.cents - bb.cents) AS gap_cents,
             abs(date_diff('day', a.d, bb.d)) AS gap_days
      FROM probe a
      JOIN (SELECT ok, cust, cents, d, cents // 100 AS bucket FROM t) bb
        ON a.cust = bb.cust AND a.bucket = bb.bucket AND a.ok < bb.ok
      WHERE abs(a.cents - bb.cents) <= 100
        AND a.cents <> bb.cents
        AND a.d <> bb.d),
    dedup AS (SELECT DISTINCT cust, ok_a, ok_b, gap_cents, gap_days FROM cand)
    SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs,
           CAST(count(DISTINCT cust) AS BIGINT) AS n_flagged_customers,
           CAST(coalesce(min(gap_cents), 0) AS BIGINT) AS min_gap_cents,
           round(avg(CAST(gap_days AS DOUBLE)), 6) AS avg_gap_days
    FROM dedup
    """,
    tags=("fraud", "forensic", "near-dup"),
)
def q_near_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate payments: same customer, amounts within $1 but
    NOT identical, on different days -- the keying-error / double-
    billing shape the exact-collision audit misses. Candidates come
    from dollar-bucket equi-joins (each order probes its own bucket
    and both neighbors, so a gap straddling a bucket edge is caught
    regardless of which side holds the smaller key -- the banded-LSH
    idiom), then the exact gap filter; pairs
    are deduped on the (a < b) key. Never an all-pairs join."""
    orders = read_table(spark, sf_dir, "orders")
    t = orders.select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("cust"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    probe = t.select(
        "ok",
        "cust",
        "cents",
        "d",
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"),
    ).select(
        "ok",
        "cust",
        "cents",
        "d",
        (F.expr("cents DIV 100") + F.col("off")).alias("bucket"),
    )
    base = t.select(
        F.col("ok").alias("ok_b"),
        F.col("cust").alias("cust_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
        F.expr("cents DIV 100").alias("bucket"),
    )
    cand = (
        probe.join(
            base,
            (F.col("cust") == F.col("cust_b"))
            & (probe.bucket == base.bucket)
            & (F.col("ok") < F.col("ok_b")),
        )
        .where(
            (F.abs(F.col("cents") - F.col("cents_b")) <= 100)
            & (F.col("cents") != F.col("cents_b"))
            & (F.col("d") != F.col("d_b"))
        )
        .select(
            "cust",
            F.col("ok").alias("ok_a"),
            "ok_b",
            F.abs(F.col("cents") - F.col("cents_b")).alias("gap_cents"),
            F.abs(F.datediff(F.col("d"), F.col("d_b"))).alias("gap_days"),
        )
        .distinct()
    )
    return cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_near_dup_pairs"),
        F.countDistinct("cust").cast("bigint").alias("n_flagged_customers"),
        F.coalesce(F.min("gap_cents"), F.lit(0))
        .cast("bigint")
        .alias("min_gap_cents"),
        F.round(F.avg(F.col("gap_days").cast("double")), 6).alias(
            "avg_gap_days"
        ),
    )
