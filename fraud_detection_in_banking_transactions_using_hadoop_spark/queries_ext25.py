"""Extension batch 25: credit-risk encodings (WOE/IV), distribution
drift (PSI), an exact-integer bootstrap CI, dormancy-reactivation
screening, permutation entropy, and tokenizer fertility.

Scale notes (the 100 TB story per query):
- woe_information_value / psi_price_drift are the credit-scoring and
  model-monitoring standards. Both reduce the fact table to a tiny
  bucket summary (one groupBy) before any float math; the log terms
  then run on exact-integer ratios (e9-int / round-6 per-term pattern
  proven by mutual_information), so the shuffled data volume is one
  row per bucket regardless of corpus size.
- bootstrap_ci_revenue is a fully deterministic iid bootstrap: the
  (replicate, draw) grid is generated map-side from the bounded daily
  spine (|days| x 200 rows, constant in SF beyond the calendar), draws
  are a multiplicative integer hash mod n (no rand()), and every
  statistic stays in exact BIGINT cents -- the same no-rand discipline
  as train_test_split. Resampling joins shuffle on the day index only.
- dormancy_reactivation is the account-takeover screen: per-user
  ordered gaps (partitioned window, event_id tiebreak), the LATEST
  dormant gap >= 24h, then a bounded per-user range join counting the
  12h post-reactivation burst. Everything is integer microseconds.
- permutation_entropy quantifies how "patterned" the daily revenue
  series is (ordinal-pattern distribution of consecutive triples).
  Lead windows run on the bounded daily spine; pattern counts are
  exact integers and each -p*ln(p) term is an e9 integer, so no
  cross-engine float-sum ordering issues.
- tokenizer_fertility is the per-language compression dashboard every
  multilingual pre-training pipeline tracks (chars/token,
  tokens/doc): one map-side tokenize + one lang groupBy, integer
  fixed-point outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Weight of Evidence / Information Value of order priority vs the
# "order had a returned line" label.
# ---------------------------------------------------------------------------
@register(
    "woe_information_value",
    """
    WITH lab AS (
      SELECT o.o_orderpriority,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS bad
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    per AS (
      SELECT o_orderpriority,
             CAST(sum(1 - bad) AS BIGINT) AS n_good,
             CAST(sum(bad) AS BIGINT) AS n_bad
      FROM lab GROUP BY o_orderpriority
    ),
    tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS g,
                   CAST(sum(n_bad) AS BIGINT) AS b FROM per)
    SELECT p.o_orderpriority, p.n_good, p.n_bad,
           CASE WHEN p.n_good = 0 OR p.n_bad = 0 THEN NULL
                ELSE round(ln((CAST(p.n_good AS DOUBLE) / t.g)
                              / (CAST(p.n_bad AS DOUBLE) / t.b)), 6)
           END AS woe,
           CASE WHEN p.n_good = 0 OR p.n_bad = 0 THEN NULL
                ELSE CAST(round(1000000000.0
                       * (CAST(p.n_good AS DOUBLE) / t.g
                          - CAST(p.n_bad AS DOUBLE) / t.b)
                       * ln((CAST(p.n_good AS DOUBLE) / t.g)
                            / (CAST(p.n_bad AS DOUBLE) / t.b)), 0) AS BIGINT)
           END AS iv_term_e9
    FROM per p CROSS JOIN tot t
    """,
    tags=("stats", "credit", "encoding"),
)
def q_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE_b = ln((good_b/G)/(bad_b/B)) per priority bucket, with the
    per-bucket IV contribution as an e9 integer (summable exactly;
    IV = sum(iv_term_e9)/1e9). Label = order contains a returned
    lineitem (distinct semi-side left join). The fact table collapses
    to 5 bucket rows before any float math; totals broadcast
    (whitelisted 1-row crossJoin)."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    lab = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        "o_orderpriority",
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("bad"),
    )
    per = lab.groupBy("o_orderpriority").agg(
        F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
        F.sum("bad").cast("bigint").alias("n_bad"),
    )
    tot = per.agg(
        F.sum("n_good").cast("bigint").alias("g"),
        F.sum("n_bad").cast("bigint").alias("b"),
    )
    pg = F.col("n_good").cast("double") / F.col("g")
    pb = F.col("n_bad").cast("double") / F.col("b")
    woe = F.log(pg / pb)
    degenerate = (F.col("n_good") == 0) | (F.col("n_bad") == 0)
    return per.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_good",
        "n_bad",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(woe, 6))
        .alias("woe"),
        F.when(degenerate, F.lit(None).cast("bigint"))
        .otherwise(F.round(F.lit(1000000000.0) * (pg - pb) * woe, 0).cast("bigint"))
        .alias("iv_term_e9"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index of the order-value distribution between
# the early and late halves of the order history.
# ---------------------------------------------------------------------------
_PSI_SPLIT = "1998-07-01"
_PSI_BIN_CENTS = 2000000  # $20k bands


@register(
    "psi_price_drift",
    f"""
    WITH o AS (
      SELECT least({_CENTS} // {_PSI_BIN_CENTS}, 25) AS bin,
             CASE WHEN o_orderdate < DATE '{_PSI_SPLIT}' THEN 0 ELSE 1 END
               AS period
      FROM orders
    ),
    per AS (
      SELECT bin,
             CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_base,
             CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_curr
      FROM o GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
                   CAST(sum(n_curr) AS BIGINT) AS tc,
                   CAST(count(*) AS BIGINT) AS nb FROM per)
    SELECT p.bin, p.n_base, p.n_curr,
           CAST(round(1000000000.0
             * (CAST(p.n_base + 1 AS DOUBLE) / (t.tb + t.nb)
                - CAST(p.n_curr + 1 AS DOUBLE) / (t.tc + t.nb))
             * ln((CAST(p.n_base + 1 AS DOUBLE) / (t.tb + t.nb))
                  / (CAST(p.n_curr + 1 AS DOUBLE) / (t.tc + t.nb))), 0)
             AS BIGINT) AS psi_term_e9
    FROM per p CROSS JOIN tot t
    """,
    tags=("stats", "drift", "monitoring"),
)
def q_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI over $20k order-value bands, add-one smoothed so empty bins
    on one side never hit ln(0): PSI = sum(psi_term_e9)/1e9. The fact
    table collapses to <=26 band rows (one groupBy) before the float
    terms; each term is an e9 integer so the total sums exactly.
    Totals broadcast (whitelisted 1-row crossJoin)."""
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select(
        F.least(
            F.expr(f"{_CENTS} DIV {_PSI_BIN_CENTS}"), F.lit(25).cast("bigint")
        ).alias("bin"),
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("date"), 0)
        .otherwise(1)
        .alias("period"),
    )
    per = o.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).cast("bigint").alias("n_base"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("bigint").alias("n_curr"),
    )
    tot = per.agg(
        F.sum("n_base").cast("bigint").alias("tb"),
        F.sum("n_curr").cast("bigint").alias("tc"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    p = (F.col("n_base") + 1).cast("double") / (F.col("tb") + F.col("nb"))
    q = (F.col("n_curr") + 1).cast("double") / (F.col("tc") + F.col("nb"))
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_curr",
        F.round(F.lit(1000000000.0) * (p - q) * F.log(p / q), 0)
        .cast("bigint")
        .alias("psi_term_e9"),
    )


# ---------------------------------------------------------------------------
# Deterministic iid bootstrap CI of mean daily revenue, exact cents.
# ---------------------------------------------------------------------------
_BOOT_B = 200


@register(
    "bootstrap_ci_revenue",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    idx AS (SELECT d, c, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT)
                   AS i FROM days),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
    grid AS (SELECT r.r, idx.i
             FROM idx CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS r) r),
    picks AS (
      SELECT g.r,
             ((g.r * 104729 + g.i * 999983 + 12289) % 2147483647) % nn.n
               AS pick
      FROM grid g CROSS JOIN nn
    ),
    reps AS (SELECT p.r, CAST(sum(idx.c) AS BIGINT) AS s
             FROM picks p JOIN idx ON idx.i = p.pick GROUP BY p.r),
    means AS (SELECT r, s // (SELECT n FROM nn) AS m FROM reps),
    ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rn FROM means)
    SELECT (SELECT n FROM nn) AS n_days,
           (SELECT CAST(sum(c) AS BIGINT) FROM idx) // (SELECT n FROM nn)
             AS point_mean_cents,
           max(CASE WHEN rn = 5 THEN m END) AS lo_cents,
           max(CASE WHEN rn = 195 THEN m END) AS hi_cents
    FROM ranked
    """,
    tags=("stats", "bootstrap", "uncertainty"),
)
def q_bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """200-replicate iid bootstrap of mean daily revenue. Draws are a
    multiplicative integer hash of (replicate, draw-index) mod n -- no
    rand(), so both engines draw the SAME resamples and the CI is
    bit-exact in BIGINT cents. The grid is |days| x 200 rows built
    map-side off the bounded daily spine (constant in SF beyond the
    calendar); the only shuffles are the day-index equi-join and the
    200-group agg. Empirical 2.5%/97.5% = order statistics 5 and 195
    of the replicate means (unique (m, r) tiebreak)."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    idx = days.withColumn(
        "i", (F.row_number().over(Window.orderBy("d")) - 1).cast("bigint")
    )
    nn = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = idx.select(
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
        F.col("i"),
    ).select(F.col("r").cast("bigint").alias("r"), "i")
    picks = grid.crossJoin(F.broadcast(nn)).select(
        "r",
        (
            ((F.col("r") * 104729 + F.col("i") * 999983 + 12289) % 2147483647)
            % F.col("n")
        ).alias("pick"),
    )
    reps = (
        picks.join(idx.select(F.col("i").alias("pick"), "c"), "pick")
        .groupBy("r")
        .agg(F.sum("c").cast("bigint").alias("s"))
    )
    means = reps.crossJoin(F.broadcast(nn)).select(
        "r", F.expr("s DIV n").alias("m")
    )
    ranked = means.withColumn("rn", F.row_number().over(Window.orderBy("m", "r")))
    point = idx.agg(F.sum("c").cast("bigint").alias("tot")).crossJoin(
        F.broadcast(nn)
    ).select(F.expr("tot DIV n").alias("point_mean_cents"), F.col("n").alias("n_days"))
    ci = ranked.agg(
        F.max(F.when(F.col("rn") == 5, F.col("m"))).alias("lo_cents"),
        F.max(F.when(F.col("rn") == 195, F.col("m"))).alias("hi_cents"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_days", "point_mean_cents", "lo_cents", "hi_cents"
    )


# ---------------------------------------------------------------------------
# Dormancy -> reactivation burst screen over the event stream.
# ---------------------------------------------------------------------------
_DORMANT_US = 24 * 3600 * 1000000  # >= 24h silent
_BURST_US = 12 * 3600 * 1000000  # burst window after reactivation
_BURST_N = 3


@register(
    "dormancy_reactivation",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    gaps AS (
      SELECT user_id, nxt - t AS gap_us, nxt AS react_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t DESC, event_id DESC) AS rn
      FROM ev WHERE nxt - t >= {_DORMANT_US}
    ),
    react AS (SELECT user_id, gap_us, react_us FROM gaps WHERE rn = 1),
    burst AS (
      SELECT r.user_id, r.gap_us, r.react_us,
             CAST(count(*) AS BIGINT) AS n_burst
      FROM react r JOIN events e
        ON e.user_id = r.user_id
       AND epoch_us(e.ts) > r.react_us
       AND epoch_us(e.ts) <= r.react_us + {_BURST_US}
      GROUP BY r.user_id, r.gap_us, r.react_us
    )
    SELECT r.user_id, r.gap_us, r.react_us,
           coalesce(b.n_burst, 0) AS n_burst,
           CAST(CASE WHEN coalesce(b.n_burst, 0) >= {_BURST_N}
                THEN 1 ELSE 0 END AS INTEGER) AS is_burst
    FROM react r LEFT JOIN burst b ON r.user_id = b.user_id
    """,
    tags=("fraud", "behavior", "W1"),
)
def q_dormancy_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest >= 24h silent gap per user (partitioned lead window,
    event_id tiebreak -- ts-monotone per CLAUDE.md), then the count of
    events in the 12h after the account wakes up; >= 3 flags a
    reactivation burst (takeover / mule pattern). All comparisons in
    integer microseconds; the burst count is a per-user equi-join with
    a range predicate (one user_id shuffle)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t"), F.col("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("nxt", F.lead("t").over(w))
        .where(F.col("nxt") - F.col("t") >= _DORMANT_US)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("t").desc(), F.col("event_id").desc()
                )
            ),
        )
    )
    react = gaps.where(F.col("rn") == 1).select(
        "user_id",
        (F.col("nxt") - F.col("t")).alias("gap_us"),
        F.col("nxt").alias("react_us"),
    )
    e2 = read_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("u2"), F.unix_micros("ts").alias("t2")
    )
    burst = (
        react.join(
            e2,
            (F.col("u2") == F.col("user_id"))
            & (F.col("t2") > F.col("react_us"))
            & (F.col("t2") <= F.col("react_us") + _BURST_US),
        )
        .groupBy("user_id", "gap_us", "react_us")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_burst"))
    )
    return (
        react.join(burst, ["user_id", "gap_us", "react_us"], "left")
        .select(
            "user_id",
            "gap_us",
            "react_us",
            F.coalesce(F.col("n_burst"), F.lit(0)).cast("bigint").alias("n_burst"),
            F.when(F.coalesce(F.col("n_burst"), F.lit(0)) >= _BURST_N, 1)
            .otherwise(0)
            .cast("integer")
            .alias("is_burst"),
        )
    )


# ---------------------------------------------------------------------------
# Permutation entropy of the daily revenue series (ordinal patterns of
# consecutive triples).
# ---------------------------------------------------------------------------
@register(
    "permutation_entropy",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS c
      FROM orders GROUP BY o_orderdate
    ),
    tri AS (
      SELECT c AS a,
             lead(c, 1) OVER (ORDER BY d) AS b,
             lead(c, 2) OVER (ORDER BY d) AS e
      FROM days
    ),
    pat AS (
      SELECT 4 * (CASE WHEN a >= b THEN 1 ELSE 0 END)
           + 2 * (CASE WHEN b >= e THEN 1 ELSE 0 END)
           + (CASE WHEN a >= e THEN 1 ELSE 0 END) AS pattern_id
      FROM tri WHERE e IS NOT NULL
    ),
    cnt AS (SELECT pattern_id, CAST(count(*) AS BIGINT) AS n FROM pat
            GROUP BY pattern_id),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt)
    SELECT c.pattern_id, c.n,
           CAST((1000000 * c.n) // t.t AS BIGINT) AS share_ppm,
           CAST(round(-1000000000.0 * (CAST(c.n AS DOUBLE) / t.t)
                      * ln(CAST(c.n AS DOUBLE) / t.t), 0) AS BIGINT)
             AS entropy_term_e9
    FROM cnt c CROSS JOIN tot t
    """,
    tags=("stats", "timeseries", "entropy"),
)
def q_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern histogram of consecutive daily-revenue triples
    (>=-comparison triple encodes the pattern; ties merge
    deterministically). Permutation entropy = sum(entropy_term_e9)/1e9
    -- each -p*ln(p) term is an e9 integer so the sum is exact. The
    lead windows run on the bounded daily spine (whitelisted); counts
    are exact integers."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d")
    tri = days.select(
        F.col("c").alias("a"),
        F.lead("c", 1).over(w).alias("b"),
        F.lead("c", 2).over(w).alias("e"),
    ).where(F.col("e").isNotNull())
    pat = tri.select(
        (
            4 * F.when(F.col("a") >= F.col("b"), 1).otherwise(0)
            + 2 * F.when(F.col("b") >= F.col("e"), 1).otherwise(0)
            + F.when(F.col("a") >= F.col("e"), 1).otherwise(0)
        ).alias("pattern_id")
    )
    cnt = pat.groupBy("pattern_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "pattern_id",
        "n",
        F.expr("CAST((1000000 * n) DIV t AS BIGINT)").alias("share_ppm"),
        F.round(F.lit(-1000000000.0) * p * F.log(p), 0)
        .cast("bigint")
        .alias("entropy_term_e9"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility: per-language chars/token and tokens/doc.
# ---------------------------------------------------------------------------
@register(
    "tokenizer_fertility",
    """
    WITH d AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(length(text) AS BIGINT) AS n_chr
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_chr) AS BIGINT) AS n_chars,
           CAST((1000000 * sum(n_chr)) // sum(n_tok) AS BIGINT)
             AS chars_per_token_e6,
           CAST((1000 * sum(n_tok)) // count(*) AS BIGINT)
             AS tokens_per_doc_e3
    FROM d GROUP BY lang
    """,
    tags=("llm", "tokenizer", "A1"),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-tokenizer fertility per language: chars/token (e6
    fixed-point) and tokens/doc (e3) -- the multilingual budget
    dashboard. Map-side tokenize + one lang groupBy; integer division
    keeps both engines exact."""
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("n_chr"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_chr").cast("bigint").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.expr("CAST((1000000 * n_chars) DIV n_tokens AS BIGINT)").alias(
                "chars_per_token_e6"
            ),
            F.expr("CAST((1000 * n_tokens) DIV n_docs AS BIGINT)").alias(
                "tokens_per_doc_e3"
            ),
        )
    )
