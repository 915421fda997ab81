"""Extension batch 9: leakage-free point-in-time joins, Pareto
concentration, a partitioned Bloom-filter semi-join, PMI collocations,
and new-vs-returning user accounting.

Scale notes:
- The point-in-time join avoids the range join entirely: dimension
  versions and fact rows UNION into one stream, and a last-non-null
  window over (entity, date, kind) assigns each fact the latest version
  that started STRICTLY BEFORE it (same-day versions sort after the
  fact row, so today's own activity can't leak into today's feature --
  the training-data leakage rule). One exchange on the entity key; the
  oracle runs the literal inequality-join + arg_max formulation, so the
  hash gate checks the rewrite.
- Pareto/ABC analysis is two windows on one ordered exchange (desc
  cumulative sum + grand total); the output is only the head that
  crosses the 80% line.
- The Bloom semi-join materializes the filter as ROWS of set bit
  positions (3 x 512 partitioned layout) built by one aggregate, then
  broadcasts those <=1536 rows; candidates pass iff all 3 probes hit
  (HAVING count = k). False positives are expected and COUNTED --
  the sketch's contract, deterministic because the hash is md5.
  At 100 TB this is the pre-filter in front of an expensive join; the
  exact check behind it here quantifies the tradeoff.
- PMI keeps every probability as a ratio of exact integer counts and
  evaluates one log expression at the end.
- New-vs-returning: first-seen day per user (one aggregate), then the
  daily split and the cumulative registered-user curve ride a single
  global-date window over |days| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Point-in-time (as-of) join of orders against the customer spend-tier
# version table, STRICTLY-BEFORE semantics: an order sees the segment
# its customer had before that day's activity.
# ---------------------------------------------------------------------------
@register(
    "point_in_time_join",
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
    versions AS (
      SELECT cust, segment,
             sum(is_chg) OVER (PARTITION BY cust ORDER BY d) AS version,
             d AS day0
      FROM chg
    ),
    vstart AS (
      SELECT cust, segment, version, min(day0) AS valid_from
      FROM versions GROUP BY cust, segment, version
    )
    SELECT o.o_orderkey AS order_key, CAST(o.o_custkey AS BIGINT) AS cust,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
           coalesce(arg_max(v.segment, v.version), 'new') AS segment_asof
    FROM orders o
    LEFT JOIN vstart v
      ON v.cust = o.o_custkey AND v.valid_from < CAST(o.o_orderdate AS DATE)
    GROUP BY o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE)
    """,
    tags=("pit-join", "asof", "leakage-free"),
)
def q_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free feature lookup: each order is tagged with the
    spend-tier version valid strictly before its order date ('new' if
    none). The Spark side is the union-window rewrite -- version-start
    rows (kind=1) and order rows (kind=0) interleave per customer,
    ordered by (date, kind) so same-day versions sort AFTER orders, and
    last_value(segment) IGNORE NULLS carries the feature forward: no
    inequality join, one cust exchange. The oracle is the literal
    valid_from < order_date join + arg_max, checking the rewrite."""
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
    vstart = (
        chg.select("cust", "d", "segment", F.sum("is_chg").over(wd).alias("version"))
        .groupBy("cust", "segment", "version")
        .agg(F.min("d").alias("valid_from"))
    )
    v_rows = vstart.select(
        "cust",
        F.col("valid_from").alias("d"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("order_key"),
        "segment",
    )
    o_rows = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("order_key"),
        F.lit(None).cast("string").alias("segment"),
    )
    wpit = (
        Window.partitionBy("cust")
        .orderBy("d", "kind", "order_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = v_rows.unionByName(o_rows).select(
        "cust",
        "d",
        "kind",
        "order_key",
        F.last("segment", ignorenulls=True).over(wpit).alias("segment_asof"),
    )
    return tagged.where(F.col("kind") == 0).select(
        F.col("order_key").alias("order_key"),
        F.col("cust").cast("bigint").alias("cust"),
        F.date_format("d", "yyyy-MM-dd").alias("order_day"),
        F.coalesce("segment_asof", F.lit("new")).alias("segment_asof"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC concentration: the smallest prefix of parts (by revenue
# desc) covering 80% of total revenue, with cumulative shares.
# ---------------------------------------------------------------------------
@register(
    "pareto_80_20",
    """
    WITH rev AS (
      SELECT l_partkey AS part,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT part, cents,
             CAST(row_number() OVER (ORDER BY cents DESC, part) AS BIGINT) AS rk,
             sum(cents) OVER (ORDER BY cents DESC, part) AS cum_cents,
             sum(cents) OVER () AS total
      FROM rev
    )
    SELECT rk, CAST(part AS BIGINT) AS part, CAST(cents AS BIGINT) AS cents,
           round(CAST(cum_cents AS DOUBLE) / total, 6) AS cum_share
    FROM ranked
    WHERE cum_cents - cents < CAST(total AS DOUBLE) * 0.8
    """,
    tags=("pareto", "W1", "concentration"),
)
def q_pareto_80_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration head: parts are ranked by exact cent
    revenue and kept while the cumulative total BEFORE each part is
    still under the 80% line (so the crossing part is included). The
    rank AND the running revenue both come from the distributed
    two-level plan (operators/rank with prefix_sum) -- no
    single-partition window even though the input is |parts|-grain;
    the grand total rides a 1-row broadcast."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank

    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias("cents")
    )
    gr = with_global_rank(
        rev,
        "cents",
        [F.desc("cents"), F.col("part").asc()],
        ascending=False,
        rank_col="rk",
        prefix_sum={"cum_cents": "cents"},
    )
    total_row = rev.agg(F.sum("cents").alias("total"))
    ranked = gr.crossJoin(F.broadcast(total_row))
    return ranked.where(
        (F.col("cum_cents") - F.col("cents"))
        < F.col("total").cast("double") * 0.8
    ).select(
        "rk",
        F.col("part").cast("bigint").alias("part"),
        F.col("cents").cast("bigint").alias("cents"),
        F.round(F.col("cum_cents").cast("double") / F.col("total"), 6).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Partitioned Bloom-filter semi-join: probe order customers against a
# 3 x 512-bit Bloom filter of high-balance customers; count true
# members vs false positives (the sketch contract, quantified).
# ---------------------------------------------------------------------------
@register(
    "bloom_filter_semijoin",
    """
    WITH vip AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
    bits AS (
      SELECT DISTINCT h.i AS row_i,
             ('0x' || substr(md5(k || ':' || h.i), 1, 8))::BIGINT % 512 AS pos
      FROM vip, (SELECT unnest(range(0, 3)) AS i) h
    ),
    cand AS (SELECT DISTINCT o_custkey AS k FROM orders),
    probe AS (
      SELECT c.k, h.i AS row_i,
             ('0x' || substr(md5(c.k || ':' || h.i), 1, 8))::BIGINT % 512 AS pos
      FROM cand c, (SELECT unnest(range(0, 3)) AS i) h
    ),
    pass AS (
      SELECT p.k FROM probe p JOIN bits b USING (row_i, pos)
      GROUP BY p.k HAVING count(*) = 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pass,
           CAST(count(v.k) AS BIGINT) AS n_true_members,
           CAST(count(*) - count(v.k) AS BIGINT) AS n_false_positives
    FROM pass LEFT JOIN vip v USING (k)
    """,
    tags=("sketch", "bloom", "semi-join"),
)
def q_bloom_filter_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join: the high-balance member set becomes a
    partitioned Bloom filter (3 hash rows x 512 buckets) stored as
    ROWS of distinct set positions -- one aggregate, <=1536 rows
    regardless of member count -- broadcast onto the probe side; a
    candidate passes iff all 3 of its probe positions are set. md5
    hashing makes the filter bit-identical in DuckDB, so even the
    FALSE POSITIVES match exactly: the query reports pass/true/fp
    counts, quantifying the pre-filter's selectivity before a real
    join would run behind it."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    hrows = F.explode(F.array(*[F.lit(i) for i in range(3)])).alias("row_i")

    def pos(key_col, row_col):
        h = F.md5(F.concat_ws(":", key_col.cast("string"), row_col.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 512

    vip = cust.where(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("k"))
    bits = (
        vip.select("k", hrows)
        .select("row_i", pos(F.col("k"), F.col("row_i")).alias("pos"))
        .distinct()
    )
    cand = orders.select(F.col("o_custkey").alias("k")).distinct()
    probe = cand.select("k", hrows).select(
        "k", "row_i", pos(F.col("k"), F.col("row_i")).alias("pos")
    )
    passed = (
        probe.join(F.broadcast(bits), ["row_i", "pos"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .where(F.col("nhit") == 3)
        .select("k")
    )
    return (
        passed.join(vip.withColumn("is_vip", F.lit(1)), "k", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pass"),
            F.count("is_vip").cast("bigint").alias("n_true_members"),
            (F.count(F.lit(1)) - F.count("is_vip")).cast("bigint").alias("n_false_positives"),
        )
    )


# ---------------------------------------------------------------------------
# PMI collocations: pointwise mutual information of adjacent token
# pairs across documents (exact integer counts, one log at the end).
# ---------------------------------------------------------------------------
@register(
    "pmi_collocations",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bigrams AS (
      SELECT ts[i.i] AS a, ts[i.i + 1] AS b
      FROM toks, (SELECT unnest(range(1, len(ts))) AS i) i
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c1
      FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY tok
    ),
    big AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c2
      FROM bigrams GROUP BY a, b HAVING count(*) >= 5
    ),
    tot AS (
      SELECT (SELECT sum(c1) FROM uni) AS n_uni,
             (SELECT CAST(count(*) AS BIGINT) FROM bigrams) AS n_big
    )
    SELECT big.a, big.b, big.c2 AS pair_count,
           ua.c1 AS count_a, ub.c1 AS count_b,
           round(ln((CAST(big.c2 AS DOUBLE) / t.n_big)
                    / ((CAST(ua.c1 AS DOUBLE) / t.n_uni)
                       * (CAST(ub.c1 AS DOUBLE) / t.n_uni))), 6) AS pmi
    FROM big JOIN uni ua ON ua.tok = big.a
             JOIN uni ub ON ub.tok = big.b
             CROSS JOIN tot t
    """,
    tags=("nlp", "pmi", "collocation"),
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation strength for adjacent token pairs seen >= 5 times:
    pmi = ln(p(ab) / (p(a) p(b))). Bigram extraction is map-side
    (explode of index range + element_at -- the codegen-friendly
    shingle path, no window); unigram and bigram counts are exact
    integers, joined back via two hash joins against the (small)
    vocabulary, and the probabilities exist only inside the single
    final ln(). The totals ride a 1-row broadcast (whitelisted
    scalar nested-loop pattern)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("ts"))
    bigrams = toks.select(
        F.posexplode(F.expr("slice(ts, 1, size(ts) - 1)")).alias("i", "a"), "ts"
    ).select("a", F.element_at("ts", F.col("i") + 2).alias("b"))
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    )
    big = (
        bigrams.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .where(F.col("c2") >= 5)
    )
    tot = bigrams.agg(F.count(F.lit(1)).cast("bigint").alias("n_big")).crossJoin(
        uni.agg(F.sum("c1").cast("bigint").alias("n_uni"))
    )
    ua = uni.alias("ua")
    ub = uni.alias("ub")
    joined = (
        big.join(ua, F.col("a") == F.col("ua.tok"))
        .join(ub, F.col("b") == F.col("ub.tok"))
        .crossJoin(F.broadcast(tot))
    )
    p_ab = F.col("c2").cast("double") / F.col("n_big")
    p_a = F.col("ua.c1").cast("double") / F.col("n_uni")
    p_b = F.col("ub.c1").cast("double") / F.col("n_uni")
    return joined.select(
        "a",
        "b",
        F.col("c2").alias("pair_count"),
        F.col("ua.c1").alias("count_a"),
        F.col("ub.c1").alias("count_b"),
        F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# New vs returning users per day + cumulative registered curve.
# ---------------------------------------------------------------------------
@register(
    "new_vs_returning",
    """
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    first_seen AS (
      SELECT user_id, min(d) AS d0 FROM pairs GROUP BY user_id
    ),
    daily AS (
      SELECT p.d,
             CAST(count(*) AS BIGINT) AS dau,
             CAST(sum(CASE WHEN f.d0 = p.d THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      FROM pairs p JOIN first_seen f USING (user_id)
      GROUP BY p.d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, dau, n_new,
           dau - n_new AS n_returning,
           CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM daily
    """,
    tags=("analytics", "cohort", "W4"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-seen vs returning, with
    the cumulative acquired-user curve. First-seen day is one aggregate
    over the distinct (day, user) pairs; the join back is on user_id
    (broadcastable -- |users| << |events| at scale); the cumulative
    curve is a window over |days| rows."""
    ev = read_table(spark, sf_dir, "events")
    pairs = ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    first_seen = pairs.groupBy("user_id").agg(F.min("d").alias("d0"))
    daily = (
        pairs.join(F.broadcast(first_seen), "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dau"),
            F.sum(F.when(F.col("d0") == F.col("d"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "dau",
        "n_new",
        (F.col("dau") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_users"),
    )
