"""Extension batch 7: warehouse/temporal operator families the earlier
batches didn't cover -- SCD Type-2 history build (run-length collapse),
additive seasonal decomposition, interval-interval overlap join via
month bucketing, equal-frequency quantile binning, and sequence
pattern matching (MATCH_RECOGNIZE-style counts without the clause).

Scale notes:
- SCD2 is the gaps-and-islands template: change-flag via lag, run id
  via prefix sum of flags, one exchange on the entity key shared by
  every window in the chain.
- Seasonal decomposition keeps EVERYTHING integral until one final
  division: the 7-day centered trend is sum-of-7-cents (x7, never
  divided), detrended = 7*x - trend_x7 stays an exact BIGINT, and the
  per-weekday seasonal mean divides once at the end (CLAUDE.md
  float-parity rule -- no cross-engine double accumulation).
- The interval overlap join is the bucket-ownership pattern: each
  interval explodes into the months it spans, candidate pairs meet in
  an equi-join on (group, month), and a pair is COUNTED only in the
  month containing the later start -- any overlapping pair shares that
  month (the later start lies inside both intervals), so exactly one
  bucket owns each pair: no distinct needed, no n^2. The DuckDB oracle
  runs the literal quadratic within-group join, so the rewrite itself
  is what the hash gate checks.
- Quantile binning keeps exact ntile semantics but ranks through
  operators/rank.with_global_rank (approx-percentile bucket edges +
  per-bucket offsets + partitioned row_number) -- no single-partition
  window at any scale.
- Pattern matching encodes each user's ordered event-type initials as
  one string (sort_array(collect_list(struct)) -- deterministic, no
  window shuffle) and counts regex matches; both engines use leftmost
  non-overlapping semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import (
    ntile_from_rank,
    with_global_rank,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# SCD Type-2 history: per-customer spend-tier segment with
# [valid_from, valid_to) versions built by collapsing consecutive
# equal-segment runs.
# ---------------------------------------------------------------------------
@register(
    "scd2_segment_history",
    """
    WITH daily AS (
      SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ),
    seg AS (
      SELECT cust, d,
             CASE WHEN sum(cents) OVER (PARTITION BY cust ORDER BY d) < 20000000
                  THEN 'bronze'
                  WHEN sum(cents) OVER (PARTITION BY cust ORDER BY d) < 60000000
                  THEN 'silver' ELSE 'gold' END AS segment
      FROM daily
    ),
    chg AS (
      SELECT cust, d, segment,
             CASE WHEN segment = lag(segment) OVER (PARTITION BY cust ORDER BY d)
                  THEN 0 ELSE 1 END AS is_chg
      FROM seg
    ),
    runs AS (
      SELECT cust, d, segment,
             sum(is_chg) OVER (PARTITION BY cust ORDER BY d) AS version
      FROM chg
    ),
    hist AS (
      SELECT cust, segment, version,
             strftime(min(d), '%Y-%m-%d') AS valid_from,
             CAST(count(*) AS BIGINT) AS n_days
      FROM runs GROUP BY cust, segment, version
    )
    SELECT CAST(cust AS BIGINT) AS cust, segment,
           CAST(version AS BIGINT) AS version, valid_from,
           coalesce(lead(valid_from) OVER (PARTITION BY cust ORDER BY version),
                    '9999-12-31') AS valid_to,
           n_days
    FROM hist
    """,
    tags=("scd2", "gaps-and-islands", "W1"),
)
def q_scd2_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an order fact: the
    running cumulative spend classifies each active day into a tier,
    consecutive equal tiers collapse into one version row
    (change-flag lag + prefix-sum run id), and valid_to is the next
    version's valid_from (open-ended sentinel for the current row).
    Every window partitions on cust, so the whole chain rides ONE
    exchange."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents"))
    wd = Window.partitionBy("cust").orderBy("d")
    cum = F.sum("cents").over(wd)
    seg = daily.select(
        "cust",
        "d",
        F.when(cum < 20_000_000, "bronze")
        .when(cum < 60_000_000, "silver")
        .otherwise("gold")
        .alias("segment"),
    )
    chg = seg.select(
        "cust",
        "d",
        "segment",
        F.when(F.col("segment") == F.lag("segment").over(wd), 0).otherwise(1).alias("is_chg"),
    )
    runs = chg.select("cust", "d", "segment", F.sum("is_chg").over(wd).alias("version"))
    hist = runs.groupBy("cust", "segment", "version").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    wv = Window.partitionBy("cust").orderBy("version")
    return hist.select(
        F.col("cust").cast("bigint").alias("cust"),
        "segment",
        F.col("version").cast("bigint").alias("version"),
        "valid_from",
        F.coalesce(F.lead("valid_from").over(wv), F.lit("9999-12-31")).alias("valid_to"),
        "n_days",
    )


# ---------------------------------------------------------------------------
# Additive seasonal decomposition of daily revenue: 7-point centered
# moving trend, per-ISO-weekday seasonal index from the detrended
# series -- all integer arithmetic until the final division.
# ---------------------------------------------------------------------------
@register(
    "seasonal_decompose",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    t AS (
      SELECT d, cents,
             sum(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend_x7,
             count(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS w
      FROM daily
    ),
    det AS (
      SELECT CAST(isodow(d) AS INTEGER) AS dow, 7 * cents - trend_x7 AS det_x7
      FROM t WHERE w = 7
    )
    SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(det_x7) AS DOUBLE) / (7.0 * count(*)) / 100.0, 6)
             AS seasonal_dollars
    FROM det GROUP BY dow
    """,
    tags=("timeseries", "seasonal", "exact-arith"),
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition over the observed daily series:
    trend = centered 7-point moving average, seasonal = mean of the
    detrended values per ISO weekday (Mon=1..Sun=7), edges without a
    full window dropped. The trick making this oracle-exact: the trend
    is kept as an UNDIVIDED sum-of-7 (trend_x7) so detrended_x7 =
    7*cents - trend_x7 is an exact integer; floats appear only in the
    single final division. The global-order window runs over
    |distinct days|, not |rows|."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    wf = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "cents",
        F.sum("cents").over(wf).alias("trend_x7"),
        F.count(F.lit(1)).over(wf).alias("w"),
    )
    det = t.where(F.col("w") == 7).select(
        (F.weekday("d") + F.lit(1)).cast("integer").alias("dow"),
        (F.lit(7) * F.col("cents") - F.col("trend_x7")).alias("det_x7"),
    )
    return det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(
            F.sum("det_x7").cast("double")
            / (F.lit(7.0) * F.count(F.lit(1)))
            / F.lit(100.0),
            6,
        ).alias("seasonal_dollars"),
    )


# ---------------------------------------------------------------------------
# Interval-interval overlap join: within each (supplier, part) group,
# pairs of shipments whose [shipdate, shipdate + quantity days] windows
# overlap. Spark side uses month-bucket explode + ownership dedupe; the
# oracle is the literal quadratic within-group join.
# ---------------------------------------------------------------------------
@register(
    "interval_overlap_pairs",
    """
    WITH iv AS (
      SELECT l_suppkey AS supp, l_partkey AS part,
             l_orderkey * 100 + l_linenumber AS line_key,
             CAST(l_shipdate AS DATE) AS start_d,
             CAST(l_shipdate AS DATE) + CAST(l_quantity AS INTEGER) AS end_d,
             row_number() OVER (PARTITION BY l_suppkey, l_partkey
                                ORDER BY l_shipdate, l_quantity,
                                         l_orderkey * 100 + l_linenumber) AS rn
      FROM lineitem
    )
    SELECT a.supp AS supp, a.part AS part,
           a.line_key AS key_a, b.line_key AS key_b,
           CAST(date_diff('day', greatest(a.start_d, b.start_d),
                          least(a.end_d, b.end_d)) + 1 AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.supp = b.supp AND a.part = b.part AND a.rn < b.rn
     AND a.start_d <= b.end_d AND b.start_d <= a.end_d
    """,
    tags=("interval-join", "J1", "bucketing"),
)
def q_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping shipment-window pairs per (supplier, part). The scale
    path: each interval explodes into the calendar months it spans
    (sequence of month starts -- intervals are <= ~51 days, so 1-3
    rows), candidates meet in an EQUI-join on (supp, part, month), and
    the ownership rule -- count the pair only in the month of the later
    start, which any overlapping pair shares because the later start
    lies inside both intervals -- makes each pair appear exactly once
    with no distinct. Work scales with per-month density instead of
    group^2 (the oracle deliberately runs the quadratic form, so the
    hash gate verifies the rewrite)."""
    li = read_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) COLLIDES in the testdata, so the pair
    # dedupe key is a within-group row_number over a total order
    wrn = Window.partitionBy("l_suppkey", "l_partkey").orderBy(
        "l_shipdate", "l_quantity", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    iv = li.select(
        F.col("l_suppkey").alias("supp"),
        F.col("l_partkey").alias("part"),
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("line_key"),
        F.col("l_shipdate").cast("date").alias("start_d"),
        F.date_add(F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")).alias(
            "end_d"
        ),
        F.row_number().over(wrn).alias("rn"),
    )
    exploded = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col("start_d")).cast("date"),
                F.date_trunc("month", F.col("end_d")).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("bucket"),
        # both sides of the self-join below read this frame, and its
        # lineage carries the per-group row_number window -- pin it once
        # (the CLAUDE.md LSH-self-join rule; r13 optimization round)
    ).localCheckpoint(eager=True)
    a = exploded.alias("a")
    b = exploded.alias("b")
    later_start = F.greatest(F.col("a.start_d"), F.col("b.start_d"))
    return (
        a.join(
            b,
            (F.col("a.supp") == F.col("b.supp"))
            & (F.col("a.part") == F.col("b.part"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.rn") < F.col("b.rn")),
        )
        .where(
            (F.col("a.start_d") <= F.col("b.end_d"))
            & (F.col("b.start_d") <= F.col("a.end_d"))
            # ownership: only the bucket containing the later start counts
            & (F.col("a.bucket") == F.date_trunc("month", later_start).cast("date"))
        )
        .select(
            F.col("a.supp").alias("supp"),
            F.col("a.part").alias("part"),
            F.col("a.line_key").alias("key_a"),
            F.col("b.line_key").alias("key_b"),
            (
                F.datediff(
                    F.least(F.col("a.end_d"), F.col("b.end_d")), later_start
                )
                + 1
            )
            .cast("bigint")
            .alias("overlap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Equal-frequency binning (decile discretization) of order totals with
# per-bin profile -- the feature-engineering "quantile bucketizer".
# ---------------------------------------------------------------------------
@register(
    "quantile_binning",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT CAST(decile AS INTEGER) AS decile, CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4)
                 / count(*), 6) AS mean_price
    FROM ranked GROUP BY decile
    """,
    tags=("binning", "feature", "W2"),
)
def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketizer with EXACT ntile semantics but no global sort:
    operators/rank.with_global_rank buckets by approx-percentile edges,
    prefix-sums the B bucket counts, and row_numbers within buckets
    (o_orderkey tiebreak, CLAUDE.md window rule); the closed-form NTILE
    maps ranks to deciles. Per-bin mean derives from the exact integer
    cent sum, divided once and rounded per the float-parity rule."""
    orders = read_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice")
    gr = with_global_rank(
        base,
        "o_totalprice",
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        rank_col="_i",
    )
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = gr.crossJoin(F.broadcast(n_row)).select(
        "o_totalprice", ntile_from_rank(F.col("_i"), F.col("_n"), 10).alias("decile")
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0, 4
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_price"),
    ).select(F.col("decile").cast("integer").alias("decile"), "n", "lo", "hi", "mean_price")


# ---------------------------------------------------------------------------
# Sequence pattern matching: encode each user's ordered event-type
# initials as a string and count regex motifs (view-burst-then-purchase,
# error-retry runs) -- MATCH_RECOGNIZE semantics as portable algebra.
# ---------------------------------------------------------------------------
@register(
    "pattern_match_sequences",
    """
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(length(s) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(s, 'v+p')) AS BIGINT) AS view_to_purchase,
           CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS error_runs,
           CAST(len(regexp_extract_all(s, 'svc*p')) AS BIGINT) AS signup_funnels
    FROM seq
    """,
    tags=("sequence", "pattern", "match-recognize"),
)
def q_pattern_match_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral motif counts. The per-user event string is
    built with sort_array(collect_list(struct(ts, event_id, initial)))
    -- deterministic total order from the ts-monotone event_id key, one
    grouped exchange, no window -- then three regexp_count's evaluate
    the motifs with leftmost non-overlapping semantics in both engines.
    The string per user is bounded by events-per-user, the same bound
    MATCH_RECOGNIZE state machines need; at 100 TB you'd shard
    super-heavy users first."""
    ev = read_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("s")
    )
    return seq.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.length("s").cast("bigint").alias("n_events"),
        F.regexp_count("s", F.lit("v+p")).cast("bigint").alias("view_to_purchase"),
        F.regexp_count("s", F.lit("ee+")).cast("bigint").alias("error_runs"),
        F.regexp_count("s", F.lit("svc*p")).cast("bigint").alias("signup_funnels"),
    )
