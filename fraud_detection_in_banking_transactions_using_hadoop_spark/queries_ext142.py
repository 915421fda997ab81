"""Extension batch 142 (round 6): card-testing burst detection (the
classic fraud pattern the 3-rule scorer misses: a run of tiny
authorization probes followed by the real charge), the MinHash-LSH
S-curve tuning table (the design query behind operators/dedup's
16-hash banding -- which (bands, rows) split puts the collision
threshold where the pipeline wants it), and the n-gram vocabulary
coverage curve (how much of the token stream the top-k vocabulary
captures -- the tokenizer-budget design input).

Scale notes (the 100 TB story):
- card_testing_burst: all logic rides PER-USER time-RANGE window
  frames on exact integer micros (range_frame_window precedent) --
  partitioned windows only, one shuffle on user_id; the output is a
  bounded top-20 review queue.
- lsh_s_curve_tuning: a pure 5x5 constant design grid (divisor pairs
  of H=16 x similarity grid) -- nothing scans data; the collision
  probability 1-(1-s^r)^b and the s50 threshold (1/b)^(1/r) are the
  public LSH formulas.
- ngram_coverage_curve: vocabulary spine (DOMAIN-bounded -- tokens
  saturate), ranked by count desc on with_global_rank with exact
  prefix sums; coverage ppm is an exact integer DIV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# thresholds calibrated to the synthetic event cadence (purchases are
# ~1.4 days apart per user, so "burst" windows are days, not minutes)
_SMALL_CENTS = 2500      # probe threshold: < $25
_BIG_CENTS = 12000       # real-charge threshold: >= $120
_PROBE_WIN_US = 259_200_000_000   # 72 h
_CHARGE_WIN_US = 345_600_000_000  # 96 h
_N_HASHES = 16  # operators/dedup.py minhash_signatures default


@register(
    "card_testing_burst",
    f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'),
    flagged AS (
      SELECT user_id, us, cents,
             sum(CASE WHEN cents < {_SMALL_CENTS} THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_PROBE_WIN_US} PRECEDING AND CURRENT ROW)
               AS n_small_probe,
             max(CASE WHEN cents >= {_BIG_CENTS} THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN CURRENT ROW AND {_CHARGE_WIN_US} FOLLOWING)
               AS big_follows
      FROM p),
    hits AS (
      SELECT user_id, us FROM flagged
      WHERE cents < {_SMALL_CENTS} AND n_small_probe >= 3 AND big_follows = 1),
    per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_flag_events,
             CAST(min(us) // 1000000 AS BIGINT) AS first_flag_epoch_s
      FROM hits GROUP BY user_id)
    SELECT user_id AS card_id, n_flag_events, first_flag_epoch_s
    FROM per_user
    ORDER BY n_flag_events DESC, user_id
    LIMIT 20
    """,
    tags=("fraud", "pattern", "window"),
)
def q_card_testing_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-testing detector: a small purchase that has >= 3 small
    purchases within the trailing probe window on the same card AND a
    large charge within the following charge window -- the probe-then-
    cash-out shape (windows sized to this data's day-scale purchase
    cadence; on real card streams they shrink to minutes). Exact integer micros RANGE frames, partitioned by
    user (never a global window); top-20 review queue ordered by flag
    count."""
    events = read_table(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    wb = Window.partitionBy("user_id").orderBy("us")
    flagged = p.select(
        "user_id",
        "us",
        "cents",
        F.sum(F.when(F.col("cents") < _SMALL_CENTS, 1).otherwise(0))
        .over(wb.rangeBetween(-_PROBE_WIN_US, 0))
        .alias("n_small_probe"),
        F.max(F.when(F.col("cents") >= _BIG_CENTS, 1).otherwise(0))
        .over(wb.rangeBetween(0, _CHARGE_WIN_US))
        .alias("big_follows"),
    )
    hits = flagged.where(
        (F.col("cents") < _SMALL_CENTS)
        & (F.col("n_small_probe") >= 3)
        & (F.col("big_follows") == 1)
    )
    per_user = hits.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_flag_events"),
        F.expr("CAST(min(us) DIV 1000000 AS BIGINT)").alias(
            "first_flag_epoch_s"
        ),
    )
    return (
        per_user.orderBy(F.col("n_flag_events").desc(), "user_id")
        .limit(20)
        .select(
            F.col("user_id").alias("card_id"),
            "n_flag_events",
            "first_flag_epoch_s",
        )
    )


@register(
    "lsh_s_curve_tuning",
    f"""
    WITH pairs AS (
      SELECT unnest([1, 2, 4, 8, 16]) AS r),
    cfg AS (
      SELECT r, CAST({_N_HASHES} / r AS INTEGER) AS b FROM pairs),
    grid AS (
      SELECT unnest([CAST(0.3 AS DOUBLE), 0.5, 0.7, 0.8, 0.9]) AS s),
    curve AS (
      SELECT c.b, c.r, g.s,
             1.0 - pow(1.0 - pow(g.s, CAST(c.r AS DOUBLE)),
                       CAST(c.b AS DOUBLE)) AS p_collide
      FROM cfg c CROSS JOIN grid g)
    SELECT b AS n_bands, r AS rows_per_band, s AS jaccard_s,
           round(p_collide, 6) AS p_candidate,
           round(pow(1.0 / CAST(b AS DOUBLE), 1.0 / CAST(r AS DOUBLE)), 6)
             AS s50_threshold
    FROM curve
    ORDER BY r, s
    """,
    tags=("dedup", "lsh", "design"),
)
def q_lsh_s_curve_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding design table for the pipeline's H = 16 minhashes:
    for every divisor split (b bands x r rows), the candidate-pair
    probability 1 - (1 - s^r)^b over a similarity grid and the s50
    threshold (1/b)^(1/r) where collision probability crosses ~50%.
    Reading the table: (4x4) puts s50 at ~0.71 -- the setting
    minhash_lsh_pairs ships with; (8x2) recalls down to ~0.35 at 3x
    the candidate volume. Pure constant arithmetic -- the design query
    is data-free by construction."""
    rs = spark.range(1).select(
        F.explode(F.array(*[F.lit(r) for r in (1, 2, 4, 8, 16)])).alias("r")
    )
    cfg = rs.select("r", (F.lit(_N_HASHES) / F.col("r")).cast("integer").alias("b"))
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(s) for s in (0.3, 0.5, 0.7, 0.8, 0.9)])
        ).alias("s")
    )
    curve = cfg.crossJoin(F.broadcast(grid)).select(
        "b",
        "r",
        "s",
        (
            1.0
            - F.pow(
                1.0 - F.pow(F.col("s"), F.col("r").cast("double")),
                F.col("b").cast("double"),
            )
        ).alias("p_collide"),
    )
    return curve.select(
        F.col("b").alias("n_bands"),
        F.col("r").alias("rows_per_band"),
        F.col("s").alias("jaccard_s"),
        F.round(F.col("p_collide"), 6).alias("p_candidate"),
        F.round(
            F.pow(1.0 / F.col("b").cast("double"), 1.0 / F.col("r").cast("double")),
            6,
        ).alias("s50_threshold"),
    ).orderBy("rows_per_band", "jaccard_s")


@register(
    "ngram_coverage_curve",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS tok
      FROM documents),
    vocab AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS vocab_size FROM vocab),
    ranked AS (
      SELECT tok, c,
             row_number() OVER (ORDER BY c DESC, tok) AS rk,
             sum(c) OVER (ORDER BY c DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM vocab),
    ks AS (SELECT unnest([10, 50, 100, 500, 1000]) AS k),
    curve AS (
      SELECT k.k,
             max(CASE WHEN r.rk = least(CAST(k.k AS BIGINT), t.vocab_size)
                 THEN r.cum END) AS cum_k
      FROM ks k CROSS JOIN tot t JOIN ranked r
        ON r.rk = least(CAST(k.k AS BIGINT), t.vocab_size)
      GROUP BY k.k)
    SELECT c.k AS top_k, t.vocab_size, t.total AS n_tokens,
           CAST(1000000 * c.cum_k // t.total AS BIGINT) AS coverage_ppm
    FROM curve c CROSS JOIN tot t
    ORDER BY c.k
    """,
    tags=("text", "tokenizer", "design"),
)
def q_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction (ppm, exact integer)
    of the whole token stream the top-k most frequent tokens cover,
    for k in {10, 50, 100, 500, 1000}. The tokenizer-budget design
    input: where the curve flattens is where a bigger vocab stops
    paying. Ranking rides with_global_rank (count desc, token
    tiebreak) with an exact prefix sum; each k is an equi-join on the
    rank ordinal -- no top-k scan repeats."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = vocab.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    ranked = with_global_rank(
        vocab,
        "c",
        [F.desc("c"), F.col("tok").asc()],
        ascending=False,
        rank_col="rk",
        prefix_sum={"cum": "c"},
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (10, 50, 100, 500, 1000)])).alias(
            "k"
        )
    )
    kj = ks.crossJoin(F.broadcast(tot)).select(
        "k",
        "total",
        "vocab_size",
        F.least(F.col("k").cast("bigint"), F.col("vocab_size")).alias("rk"),
    )
    curve = kj.join(ranked.select("rk", "cum"), "rk")
    return curve.select(
        F.col("k").alias("top_k"),
        "vocab_size",
        F.col("total").alias("n_tokens"),
        F.expr("CAST(1000000 * cum DIV total AS BIGINT)").alias("coverage_ppm"),
    ).orderBy("top_k")
