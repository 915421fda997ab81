"""Extension batch 6: statistical fraud screens and sketch/graph
operators the earlier batches didn't cover -- Benford's-law digit
audit, a count-min-sketch heavy-hitter estimate, a grid-bucketed
spatial neighbor join, synchronous label propagation, and an exact
integer-arithmetic autocorrelation function.

Scale notes:
- Benford is two aggregates over orders (map-side combinable) plus a
  per-priority window; the digit extraction is a string op on a
  DECIMAL render, so the same bytes come out of Spark and DuckDB.
- The count-min sketch is the real thing: a fixed d x w = 4 x 256
  cell grid built by ONE combine-enabled aggregate over the fact
  table (the sketch is ~1 KB regardless of input size), then a
  broadcast join of the 1024-row sketch against the distinct keys.
  At 100 TB the sketch build is a single map-side-partial pass; no
  per-key state ever shuffles beyond the 1024 cells.
- The grid neighbor join replaces the O(n^2) all-pairs distance scan
  with an equi-join on coarse cell ids: each point joins only the
  3 x 3 neighborhood of its cell (one explode of 9 offsets on the
  left side), so work scales with local density, not n^2.
- Label propagation unrolls 3 synchronous min-label rounds as 3
  equi-join + groupBy-min stages -- the batch Pregel template; no
  driver loop, one lazy plan.
- The ACF computes Pearson r from EXACT integer sums (revenue in
  cents as DECIMAL(38,0) in Spark, HUGEINT in the DuckDB oracle) so
  the only float ops are the final ratio -- identical inputs, one
  identical expression, cross-engine stable at round(6). Float
  accumulation order never matters because nothing is accumulated in
  floats. Lags are generated map-side via explode (no nested-loop
  join for the lag spine).

Reference parity: the reference's fraud screens are rule thresholds
(FDProcBatch.txt); Benford and CMS extend the same screen family with
distribution-level and sketch-level checks, as SURVEY.md section 2's
"beyond-reference analytics" block calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Benford first-digit audit: observed first-significant-digit counts of
# order totals per priority class vs the Benford expectation
# log10(1 + 1/d), with the per-digit chi-square contribution.
# ---------------------------------------------------------------------------
@register(
    "benford_digit_audit",
    """
    WITH digits AS (
      SELECT o_orderpriority AS priority,
             CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders
    ),
    counts AS (
      SELECT priority, digit, CAST(count(*) AS BIGINT) AS observed
      FROM digits GROUP BY priority, digit
    )
    SELECT priority, CAST(digit AS INTEGER) AS digit, observed,
           CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT) AS n_total,
           round(sum(observed) OVER (PARTITION BY priority)
                 * log10(1.0 + 1.0 / digit), 6) AS expected,
           round(pow(observed - sum(observed) OVER (PARTITION BY priority)
                               * log10(1.0 + 1.0 / digit), 2)
                 / (sum(observed) OVER (PARTITION BY priority)
                    * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
    FROM counts
    """,
    tags=("A1", "fraud", "benford"),
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford screen over order totals. The digit comes
    from the string render of a DECIMAL(18,2) cast (identical bytes in
    both engines; no float log10 near power-of-ten boundaries). One
    groupBy builds the (priority, digit) counts; the priority totals
    come from a window over the already-grouped 45-row result, so the
    second pass is free. Expected counts and chi-square terms are pure
    expressions of exact integers -- cross-engine stable."""
    orders = read_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("integer")
    counts = (
        orders.select(F.col("o_orderpriority").alias("priority"), digit.alias("digit"))
        .groupBy("priority", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )
    w = Window.partitionBy("priority")
    n_total = F.sum("observed").over(w).cast("bigint")
    expected = n_total * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.select(
        "priority",
        F.col("digit").cast("integer").alias("digit"),
        "observed",
        n_total.alias("n_total"),
        F.round(expected, 6).alias("expected"),
        F.round(F.pow(F.col("observed") - expected, F.lit(2)) / expected, 6).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: estimate per-part lineitem counts
# from a 4 x 256 CMS and report the top 20 estimates next to the exact
# counts. The sketch is deterministic (multiplicative integer bucket
# hashes), so the oracle can rebuild it bit-for-bit.
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_cms",
    """
    WITH hashed AS (
      SELECT l_partkey AS k, r.i AS row_id,
             (((l_partkey % 2147483647) * (999983 + 104729 * r.i) + 12289 * r.i)
              % 2147483647) % 256 AS bucket
      FROM lineitem, (SELECT unnest(range(0, 4)) AS i) r
    ),
    cells AS (
      SELECT row_id, bucket, CAST(count(*) AS BIGINT) AS c
      FROM hashed GROUP BY row_id, bucket
    ),
    keyhash AS (
      SELECT k, r.i AS row_id,
             (((k % 2147483647) * (999983 + 104729 * r.i) + 12289 * r.i)
              % 2147483647) % 256 AS bucket
      FROM (SELECT DISTINCT l_partkey AS k FROM lineitem),
           (SELECT unnest(range(0, 4)) AS i) r
    ),
    est AS (
      SELECT kh.k, min(ce.c) AS est_cnt
      FROM keyhash kh JOIN cells ce USING (row_id, bucket)
      GROUP BY kh.k
    ),
    exact AS (
      SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(e.k AS BIGINT) AS part_key, CAST(e.est_cnt AS BIGINT) AS est_cnt,
           x.exact_cnt
    FROM est e JOIN exact x USING (k)
    ORDER BY est_cnt DESC, part_key
    LIMIT 20
    """,
    tags=("sketch", "cms", "heavy-hitters"),
)
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows, w=256 buckets) over lineitem part
    keys. The sketch build explodes each row into its 4 (row, bucket)
    cells and aggregates -- partial aggregation collapses the stream to
    at most 1024 cells per task before any shuffle, so the sketch costs
    one map pass at any scale. Estimates come from broadcasting the
    1024-row sketch back onto the distinct keys and taking min over the
    4 probed cells; CMS guarantees est >= exact. The row hashes are
    multiplicative mod-Mersenne (((k mod p) * A_i + B_i) mod p) mod w
    with p = 2^31-1 -- pure integer arithmetic inside whole-stage
    codegen (~4x cheaper than an md5 idiom on the hot fact-table pass;
    the pre-mod keeps every product under 2^62 so ANSI mode can't
    overflow) and DuckDB reproduces it digit-for-digit."""
    li = read_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    rows = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("row_id")

    def bucket(key_col, row_col):
        p = F.lit(2147483647).cast("bigint")
        a = F.lit(999983) + F.lit(104729) * row_col
        b = F.lit(12289) * row_col
        return (((key_col % p) * a + b) % p) % 256

    hashed = li.select("k", rows).select(
        "k", "row_id", bucket(F.col("k"), F.col("row_id")).alias("bucket")
    )
    cells = hashed.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    keys = li.distinct()
    keyhash = keys.select("k", rows).select(
        "k", "row_id", bucket(F.col("k"), F.col("row_id")).alias("bucket")
    )
    est = (
        keyhash.join(F.broadcast(cells), ["row_id", "bucket"])
        .groupBy("k")
        .agg(F.min("c").alias("est_cnt"))
    )
    exact = li.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    return (
        est.join(exact, "k")
        .select(
            F.col("k").cast("bigint").alias("part_key"),
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            "exact_cnt",
        )
        .orderBy(F.desc("est_cnt"), "part_key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial neighbor join: pairs of embeddings whose first
# two coordinates lie within euclidean distance 0.05, found via an
# equi-join on coarse grid cells instead of an O(n^2) cross join.
# ---------------------------------------------------------------------------
@register(
    "grid_neighbor_pairs",
    """
    WITH pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y,
             CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05) AS BIGINT) AS cx,
             CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05) AS BIGINT) AS cy
      FROM embeddings
    ),
    probes AS (
      SELECT p.vec_id, p.x, p.y, p.cx + dx.d AS cx, p.cy + dy.d AS cy
      FROM pts p,
           (SELECT unnest(range(-1, 2)) AS d) dx,
           (SELECT unnest(range(-1, 2)) AS d) dy
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6) AS dist
    FROM probes a JOIN pts b USING (cx, cy)
    WHERE a.vec_id < b.vec_id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < 0.05 * 0.05
    """,
    tags=("spatial", "grid-join", "similarity"),
)
def q_grid_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-radius near-neighbor pairs in the 2-D projection of the
    embedding table. Each point explodes into its 3x3 cell
    neighborhood on the probe side (cell = radius, so any pair within
    r shares a probe cell) and the match is a plain equi-join on
    (cx, cy) -- the standard grid trick that makes the cost local
    density * n instead of n^2, and shuffles on cell id so it scales
    out. a.vec_id < b.vec_id dedupes the symmetric pair. Distances on
    float32-exact coords, one double expression, round(6)."""
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    ).select(
        "*",
        F.floor(F.col("x") / 0.05).cast("bigint").alias("cx"),
        F.floor(F.col("y") / 0.05).cast("bigint").alias("cy"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probes = pts.select(
        "vec_id",
        "x",
        "y",
        "cx",
        "cy",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in offsets
                ]
            )
        ).alias("o"),
    ).select(
        "vec_id",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    a = probes.alias("a")
    b = pts.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(b, (F.col("a.cx") == F.col("b.cx")) & (F.col("a.cy") == F.col("b.cy")))
        .where((F.col("a.vec_id") < F.col("b.vec_id")) & (d2 < 0.05 * 0.05))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# Synchronous label propagation (3 unrolled rounds) over the
# co-purchase graph restricted to small part keys: every node starts
# with its own id as label and adopts the min label in its closed
# neighborhood each round. Connected components converge from below.
# ---------------------------------------------------------------------------
@register(
    "label_propagation",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < 200
    ),
    e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
    ),
    l0 AS (SELECT DISTINCT x AS node, x AS lbl FROM e),
    l1 AS (
      SELECT l.node, least(min(l.lbl), min(n.lbl)) AS lbl
      FROM l0 l JOIN e ON e.x = l.node JOIN l0 n ON n.node = e.y
      GROUP BY l.node
    ),
    l2 AS (
      SELECT l.node, least(min(l.lbl), min(n.lbl)) AS lbl
      FROM l1 l JOIN e ON e.x = l.node JOIN l1 n ON n.node = e.y
      GROUP BY l.node
    ),
    l3 AS (
      SELECT l.node, least(min(l.lbl), min(n.lbl)) AS lbl
      FROM l2 l JOIN e ON e.x = l.node JOIN l2 n ON n.node = e.y
      GROUP BY l.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS lbl FROM l3
    """,
    tags=("graph", "label-propagation"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous min-label rounds over the symmetric
    co-purchase edge set (parts sharing an order, keys < 200 to bound
    the demo graph). Each round is edge-join + groupBy-min -- the
    Pregel superstep as batch algebra; unrolling a fixed k keeps one
    lazy plan with no driver-side iteration. min over the CLOSED
    neighborhood (least of own and neighbor min) guarantees monotone
    convergence toward connected components. The full CC operator
    (operators/graph.py) does the same with large-star/small-star
    until fixpoint; this is the bounded-round variant the oracle can
    mirror exactly."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 200)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
    )
    # Every round references the edge set once and the label frame
    # twice, so without a cut the lineage doubles per round.
    # localCheckpoint truncates it; eager + no persist handle avoids
    # the session-lifetime cache leak the round-2 advisor flagged on
    # lsh_candidate_pairs (this query is in the plan test's EAGER set).
    e = e.localCheckpoint(eager=True)
    labels = e.select(F.col("x").alias("node"), F.col("x").alias("lbl")).distinct()
    for _ in range(3):
        l = labels.alias("l")
        n = labels.alias("n")
        labels = (
            l.join(e.alias("e"), F.col("e.x") == F.col("l.node"))
            .join(n, F.col("n.node") == F.col("e.y"))
            .groupBy(F.col("l.node").alias("node"))
            .agg(
                F.least(F.min(F.col("l.lbl")), F.min(F.col("n.lbl"))).alias("lbl")
            )
        )
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("lbl").cast("bigint").alias("lbl"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation of daily revenue at lags 1..7, computed from exact
# integer sums (cents) so the only floating-point step is the final
# Pearson ratio.
# ---------------------------------------------------------------------------
@register(
    "autocorr_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
    ),
    s AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn, cents FROM daily
    ),
    lagged AS (
      SELECT rn, cents, unnest(range(1, 8)) AS lag_k FROM s
    ),
    pairs AS (
      SELECT a.lag_k, CAST(a.cents AS HUGEINT) AS x, CAST(b.cents AS HUGEINT) AS y
      FROM lagged a JOIN s b ON b.rn = a.rn - a.lag_k
    ),
    sums AS (
      SELECT lag_k, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY lag_k
    )
    SELECT CAST(lag_k AS INTEGER) AS lag_k, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
    FROM sums
    """,
    tags=("timeseries", "acf", "exact-arith"),
)
def q_autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Pearson correlation between the daily-revenue series and
    its lag-k shift, k = 1..7. Revenue is summed in integer cents; the
    five sufficient statistics (sx, sy, sxy, sxx, syy) accumulate as
    DECIMAL(38,0) (HUGEINT in the oracle) so they are EXACT -- no
    float-summation-order hazard -- and the single double expression at
    the end is computed from identical integers in both engines
    (CLAUDE.md float-parity rule). The lag spine is an explode on the
    row-numbered series (map-side; no nested-loop join), and the shift
    is an equi-join on rn - lag_k. One global window for row_number is
    fine: the series is |distinct days|, not |rows|."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    s = daily.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn"), "cents"
    )
    lagged = s.select(
        "rn",
        "cents",
        F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("lag_k"),
    )
    a = lagged.alias("a")
    b = s.alias("b")
    dec = "decimal(38,0)"
    pairs = a.join(b, F.col("b.rn") == F.col("a.rn") - F.col("a.lag_k")).select(
        F.col("a.lag_k").alias("lag_k"),
        F.col("a.cents").cast(dec).alias("x"),
        F.col("b.cents").cast(dec).alias("y"),
    )
    sums = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        F.col("lag_k").cast("integer").alias("lag_k"),
        F.col("n").cast("bigint").alias("n"),
        F.round(num / den, 6).alias("acf"),
    )
