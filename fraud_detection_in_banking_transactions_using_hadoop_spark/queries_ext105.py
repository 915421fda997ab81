"""Extension batch 105: operational product metrics -- error recovery
time, the sessionization-timeout knee, and time-weighted concurrency
percentiles.

- error_recovery_time: after a user hits an error, do they come back
  and purchase -- and how fast? Per error event, the NEXT purchase by
  the same user via a per-user pair join (events per user are
  bounded; never a global pair join), recovery rate plus the exact
  spine median of recovery minutes.
- session_timeout_knee: sessionize hardcodes a 30-minute timeout;
  this query DERIVES one -- log2 buckets of inter-event gaps, and the
  knee = the bucket maximizing the second difference of log-counts
  (e9-integer terms, bucket tiebreak). The bimodal gap histogram
  (within-session vs between-session) is why a knee exists at all.
- concurrency_time_percentiles: peak_concurrency reports the max;
  capacity planning needs the time-weighted p50/p90/p99 of how many
  orders are simultaneously open -- +-1 boundary events, interval
  durations in exact micros, and the percentile read off the
  duration-weighted level spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"


# ---------------------------------------------------------------------------
# Error -> next-purchase recovery time.
# ---------------------------------------------------------------------------
@register(
    "error_recovery_time",
    """
    WITH errs AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'error'),
    purch AS (
      SELECT user_id, epoch_us(ts) AS us FROM events
      WHERE event_type = 'purchase'),
    rec AS (
      SELECT e.user_id, e.event_id,
             min(p.us - e.us) AS gap_us
      FROM errs e LEFT JOIN purch p
        ON p.user_id = e.user_id AND p.us > e.us
      GROUP BY e.user_id, e.event_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_errors,
             CAST(sum(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_recovered,
             CAST(sum(CASE WHEN gap_us IS NOT NULL
                           THEN gap_us ELSE 0 END) AS HUGEINT) AS s
      FROM rec),
    spine AS (
      SELECT gap_us // 60000000 AS mins, CAST(count(*) AS BIGINT) AS c
      FROM rec WHERE gap_us IS NOT NULL GROUP BY gap_us // 60000000),
    ranked AS (
      SELECT mins, sum(c) OVER (ORDER BY mins
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    med AS (
      SELECT min(mins) AS m FROM ranked
      WHERE 2 * cc >= (SELECT CAST(sum(c) AS BIGINT) FROM spine))
    SELECT s.n_errors, s.n_recovered,
           round(CAST(s.n_recovered AS DOUBLE) / s.n_errors, 6)
             AS recovery_rate,
           round(CAST(s.s AS DOUBLE) / s.n_recovered / 60000000.0, 2)
             AS mean_recovery_minutes,
           (SELECT CAST(m AS BIGINT) FROM med) AS median_recovery_minutes
    FROM stats s
    """,
    tags=("product", "reliability", "exact-arith"),
)
def q_error_recovery_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the time to the user's NEXT purchase
    (per-user pair join on the bounded per-user event sets; LEFT join
    so never-recovered errors count in the rate): recovery rate, mean
    recovery minutes from exact micro sums, and the exact
    minute-spine median. The 'did the error cost us the customer'
    number an SRE review pairs with error_interarrival_stats."""
    ev = read_table(spark, sf_dir, "events")
    errs = ev.where(F.col("event_type") == "error").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.unix_micros("ts").alias("pus")
    )
    rec = (
        errs.join(
            purch,
            (F.col("pu") == F.col("user_id")) & (F.col("pus") > F.col("us")),
            "left",
        )
        .groupBy("user_id", "event_id")
        .agg(F.min(F.col("pus") - F.col("us")).alias("gap_us"))
    )
    stats = rec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_errors"),
        F.sum(F.when(F.col("gap_us").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_recovered"),
        F.sum(F.when(F.col("gap_us").isNotNull(), F.col("gap_us")).otherwise(0))
        .cast(_DEC)
        .alias("s"),
    )
    spine = (
        rec.where(F.col("gap_us").isNotNull())
        .groupBy(F.expr("gap_us DIV 60000000").alias("mins"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ntot = spine.agg(F.sum("c").cast("bigint").alias("nn"))
    med = (
        with_global_rank(spine, "mins", [F.col("mins")], prefix_sum={"cc": "c"})
        .crossJoin(F.broadcast(ntot))
        .where(2 * F.col("cc") >= F.col("nn"))
        .agg(F.min("mins").cast("bigint").alias("m"))
    )
    return stats.crossJoin(F.broadcast(med)).select(
        "n_errors",
        "n_recovered",
        F.round(
            F.col("n_recovered").cast("double") / F.col("n_errors"), 6
        ).alias("recovery_rate"),
        F.round(
            F.col("s").cast("double") / F.col("n_recovered") / 60000000.0, 2
        ).alias("mean_recovery_minutes"),
        F.col("m").alias("median_recovery_minutes"),
    )


# ---------------------------------------------------------------------------
# Sessionization-timeout knee from the inter-event gap histogram.
# ---------------------------------------------------------------------------
@register(
    "session_timeout_knee",
    """
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS pus
      FROM events),
    gaps AS (
      SELECT CAST(floor(log2((us - pus) / 60000000.0 + 1.0)) AS BIGINT) AS b
      FROM seq WHERE pus IS NOT NULL AND us > pus),
    hist AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM gaps GROUP BY b),
    lc AS (
      SELECT b, c,
             CAST(floor(1e9 * ln(CAST(c AS DOUBLE)) + 0.5) AS BIGINT) AS l_e9
      FROM hist),
    curv AS (
      SELECT a.b,
             (p.l_e9 - a.l_e9) - (a.l_e9 - n.l_e9) AS d2
      FROM lc a
      JOIN lc p ON p.b = a.b + 1
      JOIN lc n ON n.b = a.b - 1)
    SELECT CAST(b AS BIGINT) AS knee_bucket,
           CAST(round(pow(2.0, b) - 1.0, 0) AS BIGINT) AS bucket_lo_minutes,
           CAST(round(pow(2.0, b + 1) - 1.0, 0) AS BIGINT) AS bucket_hi_minutes,
           round(d2 / 1e9, 4) AS log_count_curvature
    FROM curv ORDER BY d2 DESC, b LIMIT 1
    """,
    tags=("product", "sessionization", "exact-arith"),
)
def q_session_timeout_knee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the sessionization timeout instead of hardcoding it:
    per-user inter-event gaps land in log2 minute buckets, the
    per-bucket log-counts floor to e9 integers, and the knee is the
    bucket maximizing the second difference (curvature) of the
    log-histogram -- where within-session gaps end and between-visit
    gaps begin. The empirical justification for sessionize's timeout
    parameter."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("pus"),
    )
    gaps = seq.where(F.col("pus").isNotNull() & (F.col("us") > F.col("pus"))).select(
        F.floor(
            F.log2((F.col("us") - F.col("pus")) / 60000000.0 + 1.0)
        )
        .cast("bigint")
        .alias("b")
    )
    hist = gaps.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lc = hist.select(
        "b",
        "c",
        F.floor(F.lit(1e9) * F.log(F.col("c").cast("double")) + 0.5)
        .cast("bigint")
        .alias("l_e9"),
    )
    a = lc.alias("a")
    p = lc.select((F.col("b") - 1).alias("b"), F.col("l_e9").alias("lp"))
    nn = lc.select((F.col("b") + 1).alias("b"), F.col("l_e9").alias("ln2"))
    curv = (
        a.join(p, "b")
        .join(nn, "b")
        .select(
            "b",
            ((F.col("lp") - F.col("l_e9")) - (F.col("l_e9") - F.col("ln2"))).alias(
                "d2"
            ),
        )
    )
    return (
        curv.orderBy(F.col("d2").desc(), "b")
        .limit(1)
        .select(
            F.col("b").cast("bigint").alias("knee_bucket"),
            F.round(F.pow(F.lit(2.0), F.col("b")) - 1.0, 0)
            .cast("bigint")
            .alias("bucket_lo_minutes"),
            F.round(F.pow(F.lit(2.0), F.col("b") + 1) - 1.0, 0)
            .cast("bigint")
            .alias("bucket_hi_minutes"),
            F.round(F.col("d2") / 1e9, 4).alias("log_count_curvature"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted concurrency percentiles of open orders.
# ---------------------------------------------------------------------------
@register(
    "concurrency_time_percentiles",
    """
    WITH spans AS (
      SELECT o.o_orderdate AS st, max(l.l_shipdate) AS en
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING max(l.l_shipdate) > o.o_orderdate),
    bounds AS (
      SELECT st AS d, CAST(1 AS BIGINT) AS delta FROM spans
      UNION ALL
      SELECT en AS d, CAST(-1 AS BIGINT) AS delta FROM spans),
    daily AS (
      SELECT d, CAST(sum(delta) AS BIGINT) AS dd FROM bounds GROUP BY d),
    lvl AS (
      SELECT d,
             sum(dd) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level,
             CAST(date_diff('day', d,
               lead(d) OVER (ORDER BY d)) AS BIGINT) AS dur
      FROM daily),
    seg AS (
      SELECT level, CAST(sum(dur) AS BIGINT) AS w
      FROM lvl WHERE dur IS NOT NULL GROUP BY level),
    ranked AS (
      SELECT level,
             sum(w) OVER (ORDER BY level
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      FROM seg),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM seg)
    SELECT (SELECT tw FROM tot) AS total_days,
           (SELECT CAST(min(level) AS BIGINT) FROM ranked, tot
            WHERE 100 * cw >= 50 * tw) AS p50_open,
           (SELECT CAST(min(level) AS BIGINT) FROM ranked, tot
            WHERE 100 * cw >= 90 * tw) AS p90_open,
           (SELECT CAST(min(level) AS BIGINT) FROM ranked, tot
            WHERE 100 * cw >= 99 * tw) AS p99_open,
           (SELECT CAST(max(level) AS BIGINT) FROM seg) AS max_open
    """,
    tags=("ops", "concurrency", "exact-arith"),
)
def q_concurrency_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted percentiles of simultaneously-open orders
    (order date to last ship date): +-1 boundary deltas collapse to
    daily net changes, the running level holds constant between
    boundary days (duration = exact day gaps), and the p50/p90/p99
    read off the duration-weighted level spine. peak_concurrency's
    max says how bad it got; the p99-vs-p50 spread says how UNUSUAL
    that was -- the difference between sizing for peak and sizing
    for p99."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("en"))
        .where(F.col("en") > F.col("o_orderdate"))
        .select(F.col("o_orderdate").alias("st"), "en")
    )
    bounds = spans.select(
        F.col("st").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        spans.select(F.col("en").alias("d"), F.lit(-1).cast("bigint").alias("delta"))
    )
    daily = bounds.groupBy("d").agg(F.sum("delta").cast("bigint").alias("dd"))
    w = Window.orderBy("d")
    lvl = daily.select(
        "d",
        F.sum("dd").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("level"),
        F.datediff(F.lead("d").over(w), F.col("d")).cast("bigint").alias("dur"),
    )
    seg = (
        lvl.where(F.col("dur").isNotNull())
        .groupBy("level")
        .agg(F.sum("dur").cast("bigint").alias("w"))
    )
    ranked = with_global_rank(
        seg, "level", [F.col("level")], prefix_sum={"cw": "w"}
    ).select("level", "cw")
    tot = seg.agg(F.sum("w").cast("bigint").alias("tw"))
    rt = ranked.crossJoin(F.broadcast(tot))

    def pct(p):
        return (
            rt.where(100 * F.col("cw") >= p * F.col("tw"))
            .agg(F.min("level").cast("bigint").alias(f"p{p}"))
        )

    mx = seg.agg(F.max("level").cast("bigint").alias("mx"))
    return (
        tot.crossJoin(F.broadcast(pct(50)))
        .crossJoin(F.broadcast(pct(90)))
        .crossJoin(F.broadcast(pct(99)))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("tw").alias("total_days"),
            F.col("p50").alias("p50_open"),
            F.col("p90").alias("p90_open"),
            F.col("p99").alias("p99_open"),
            F.col("mx").alias("max_open"),
        )
    )
