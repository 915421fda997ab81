"""Extension batch 63: regression discontinuity, Huber robust location,
and TextRank keyphrases.

Scale notes (the 100 TB story per query):
- regression_discontinuity estimates a treatment jump at a price
  cutoff: separate OLS fits on [c-h, c) and [c, c+h] with the effect =
  intercept gap at the cutoff. All five OLS sufficient statistics per
  side accumulate as exact DECIMAL(38,0)/HUGEINT integers (u = cents
  offset from cutoff, y = line count), so both engines divide identical
  numerators -- two grouped aggregates, no windows.
- huber_location_2step is the robust location M-estimator: start at
  the exact spine median, scale = MAD (a second spine median over
  |x - m0|), then two IRLS steps with Huber weights; each weighted term
  is rounded to an e6 integer BEFORE the sum (order-free), so the
  iterate sequence is engine-independent. Both medians run on
  operators/rank.with_global_rank (the o_totalprice cent spine is
  ~O(rows), README) -- no single-task window.
- textrank_keywords runs PageRank (operators/graph.pagerank, the
  proven iterative-join template: per-iteration join + groupBy on node
  id, localCheckpoint lineage cuts) over the adjacent-token
  co-occurrence graph and returns the top-20 keyphrase tokens. The
  oracle unrolls all 5 power iterations as CTEs, teleport spelled
  (1.0 - 0.85)/n exactly like the engine (float-parity note in
  operators/graph.pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_RD_CUT = 15_000_000  # cents: $150k cutoff
_RD_BW = 5_000_000  # cents: $50k bandwidth each side
_HUBER_K = 1.345


# ---------------------------------------------------------------------------
# Regression discontinuity at a price cutoff.
# ---------------------------------------------------------------------------
@register(
    "regression_discontinuity",
    f"""
    WITH obs AS (
      SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) - {_RD_CUT} AS u,
             CAST(count(l.l_orderkey) AS BIGINT) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE round(o.o_totalprice * 100, 0) >= {_RD_CUT - _RD_BW}
        AND round(o.o_totalprice * 100, 0) < {_RD_CUT + _RD_BW}
      GROUP BY o.o_orderkey, o.o_totalprice),
    sides AS (
      SELECT CASE WHEN u < 0 THEN 'left' ELSE 'right' END AS side,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(u AS HUGEINT)) AS HUGEINT) AS su,
             CAST(sum(CAST(u AS HUGEINT) * u) AS HUGEINT) AS suu,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(u AS HUGEINT) * y) AS HUGEINT) AS suy
      FROM obs GROUP BY 1),
    fit AS (
      SELECT side, n,
             (CAST(n AS DOUBLE) * CAST(suy AS DOUBLE)
              - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) AS b
      FROM sides),
    ab AS (
      SELECT f.side, f.n, f.b,
             (CAST(s.sy AS DOUBLE) - f.b * CAST(s.su AS DOUBLE)) / s.n AS a
      FROM fit f JOIN sides s ON s.side = f.side)
    SELECT l.n AS n_left, r.n AS n_right,
           round(l.a, 6) AS intercept_left,
           round(r.a, 6) AS intercept_right,
           round(l.b * 1000000, 6) AS slope_left_per_10kusd,
           round(r.b * 1000000, 6) AS slope_right_per_10kusd,
           round(r.a - l.a, 6) AS rd_effect
    FROM ab l JOIN ab r ON l.side = 'left' AND r.side = 'right'
    """,
    tags=("causal", "regression", "exact-arith"),
)
def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order size (line count) jump at the $150k price point?
    Local linear RD: per side, OLS of y on (price - cutoff) over a $50k
    bandwidth; effect = right intercept - left intercept at the cutoff.
    Sufficient statistics are exact integer sums (cents offsets x line
    counts), so the closing divisions see identical numerators in both
    engines; slopes are reported per $10k for readability."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    cents = F.round(F.col("o_totalprice") * 100, 0)
    obs = (
        orders.where((cents >= _RD_CUT - _RD_BW) & (cents < _RD_CUT + _RD_BW))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("l_orderkey").cast("bigint").alias("y"))
        .select(
            (cents.cast("bigint") - _RD_CUT).alias("u"),
            "y",
        )
    )
    sides = obs.groupBy(
        F.when(F.col("u") < 0, "left").otherwise("right").alias("side")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("u").cast(_DEC)).cast(_DEC).alias("su"),
        F.sum(F.col("u").cast(_DEC) * F.col("u").cast(_DEC)).cast(_DEC).alias("suu"),
        F.sum(F.col("y").cast(_DEC)).cast(_DEC).alias("sy"),
        F.sum(F.col("u").cast(_DEC) * F.col("y").cast(_DEC)).cast(_DEC).alias("suy"),
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.col("suy").cast("double") - F.col("su").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("suu").cast("double") - F.col("su").cast("double") * F.col("su").cast("double")
    )
    ab = sides.select(
        "side",
        "n",
        b.alias("b"),
        ((F.col("sy").cast("double") - b * F.col("su").cast("double")) / F.col("n")).alias("a"),
    )
    l = ab.where(F.col("side") == "left").alias("l")
    r = ab.where(F.col("side") == "right").alias("r")
    return l.crossJoin(F.broadcast(r)).select(
        F.col("l.n").alias("n_left"),
        F.col("r.n").alias("n_right"),
        F.round("l.a", 6).alias("intercept_left"),
        F.round("r.a", 6).alias("intercept_right"),
        F.round(F.col("l.b") * 1000000, 6).alias("slope_left_per_10kusd"),
        F.round(F.col("r.b") * 1000000, 6).alias("slope_right_per_10kusd"),
        F.round(F.col("r.a") - F.col("l.a"), 6).alias("rd_effect"),
    )


# ---------------------------------------------------------------------------
# Huber location M-estimator (median start, MAD scale, 2 IRLS steps).
# ---------------------------------------------------------------------------
def _huber_sql() -> str:
    return f"""
    WITH vals AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v FROM orders),
    spine AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
    cum AS (
      SELECT v, sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM spine),
    nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM spine),
    med AS (
      SELECT min(v) AS m0 FROM cum CROSS JOIN nn
      WHERE cc >= (nn.n + 1) // 2),
    dspine AS (
      SELECT abs(v - m.m0) AS d, CAST(sum(c) AS BIGINT) AS c
      FROM spine CROSS JOIN med m GROUP BY abs(v - m.m0)),
    dcum AS (
      SELECT d, sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM dspine),
    mad AS (
      SELECT min(d) AS mad0 FROM dcum CROSS JOIN nn
      WHERE cc >= (nn.n + 1) // 2),
    params AS (
      SELECT m.m0, md.mad0, {_HUBER_K} * md.mad0 AS ck
      FROM med m CROSS JOIN mad md),
    it1 AS (
      SELECT CAST(sum(CAST(round(1000000.0 * CASE WHEN abs(v - p.m0) = 0 THEN 1.0
                     ELSE least(1.0, p.ck / abs(v - p.m0)) END * v, 0) AS HUGEINT)
                   * c)
               AS HUGEINT) AS t1,
             CAST(sum(CAST(round(1000000.0 * CASE WHEN abs(v - p.m0) = 0 THEN 1.0
                     ELSE least(1.0, p.ck / abs(v - p.m0)) END, 0) AS HUGEINT)
                   * c)
               AS HUGEINT) AS t2
      FROM spine CROSS JOIN params p),
    m1 AS (
      SELECT round(CAST(t1 AS DOUBLE) / CAST(t2 AS DOUBLE), 4) AS m1 FROM it1),
    it2 AS (
      SELECT CAST(sum(CAST(round(1000000.0 * CASE WHEN abs(v - q.m1) = 0 THEN 1.0
                     ELSE least(1.0, p.ck / abs(v - q.m1)) END * v, 0) AS HUGEINT)
                   * c)
               AS HUGEINT) AS t1,
             CAST(sum(CAST(round(1000000.0 * CASE WHEN abs(v - q.m1) = 0 THEN 1.0
                     ELSE least(1.0, p.ck / abs(v - q.m1)) END, 0) AS HUGEINT)
                   * c)
               AS HUGEINT) AS t2
      FROM spine CROSS JOIN params p CROSS JOIN m1 q)
    SELECT nn.n, p.m0 AS median_cents, p.mad0 AS mad_cents,
           q.m1 AS huber_m1_cents,
           round(CAST(it2.t1 AS DOUBLE) / CAST(it2.t2 AS DOUBLE), 4)
             AS huber_m2_cents
    FROM it2 CROSS JOIN nn CROSS JOIN params p CROSS JOIN m1 q
    """


@register("huber_location_2step", _huber_sql(), tags=("stats", "robust", "exact-arith"))
def q_huber_location_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust center of order totals: median start, MAD scale, two IRLS
    steps with Huber weights w = min(1, 1.345*MAD/|x-m|). Both medians
    are exact spine order statistics on with_global_rank (the cent
    spine is ~O(rows)); each weighted term is an e6 integer before the
    order-free sum, and each iterate is rounded to 4 decimals so the
    next iteration's weights are engine-identical.

    Perf (r6 rewrite, measured at sf0.1): ONE full-table scan builds
    the checkpointed (v, c) cent spine; the MAD spine is a re-group of
    that spine (abs(v-m0), counts summed) and both IRLS aggregates
    fold over spine rows weighted by c -- per distinct v the weight
    and the e6-rounded term are constant, so term*c is exactly the
    row-level sum. Both medians ride the rank operator's bucket_bits
    fast path (cents DIV 2^16 projection buckets: no stats job, no
    range join), and the 1-row scalar frames (n, median, MAD, first
    iterate) are eagerly checkpointed so nested broadcasts never
    recompute the upstream chain. Previously 4 full scans + 2
    percentile-bucketed rank passes, 6.2 s; now ~2.5 s. EAGER in the
    plan gate (checkpoint jobs run at build)."""
    orders = read_table(spark, sf_dir, "orders")
    vals = orders.select(F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"))
    spine = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )

    # r13: every intermediate here is a 1-ROW scalar -- collect the
    # VALUES to the driver (the established bounded driver-fold
    # pattern) instead of checkpointing 1-row frames and re-entering
    # them via nested broadcast cross-joins. Each collected scalar is
    # exact (BIGINT medians; m1 is collected AFTER Spark's own round(),
    # so the literal re-entering the plan is bit-identical to the old
    # broadcast column) and the final plan is ONE literal-weighted
    # aggregate over the checkpointed spine: 5 jobs with flat plans
    # instead of 5 checkpoints + 4 broadcast builds (4.3 s -> ~2 s
    # construct at sf0.1).
    def spine_median_scalar(sp: DataFrame, col: str, n: int) -> int:
        cum = with_global_rank(
            sp, col, [F.col(col)], prefix_sum={"cc": "c"}, bucket_bits=16
        )
        return (
            cum.where(F.col("cc") >= F.lit((n + 1) // 2))
            .agg(F.min(col).alias("m"))
            .first()[0]
        )

    n = spine.agg(F.sum("c").cast("bigint").alias("n")).first()[0]
    m0 = spine_median_scalar(spine, "v", n)
    dspine = spine.groupBy(F.abs(F.col("v") - F.lit(m0)).alias("d")).agg(
        F.sum("c").cast("bigint").alias("c")
    )
    mad0 = spine_median_scalar(dspine, "d", n)
    # same IEEE double product the old in-plan `lit(1.345) * mad0`
    # computed (mad0 is an exact integer far below 2^53)
    ck = _HUBER_K * mad0

    def irls(center_col):
        adev = F.abs(F.col("v") - center_col)
        w = F.when(adev == 0, F.lit(1.0)).otherwise(
            F.least(F.lit(1.0), F.lit(ck) / adev)
        )
        return (
            F.sum(
                F.round(F.lit(1000000.0) * w * F.col("v"), 0).cast(_DEC) * F.col("c")
            ).cast(_DEC),
            F.sum(
                F.round(F.lit(1000000.0) * w, 0).cast(_DEC) * F.col("c")
            ).cast(_DEC),
        )

    s1, s2 = irls(F.lit(m0))
    it1 = spine.agg(s1.alias("t1"), s2.alias("t2"))
    # collect AFTER Spark's round(): bit-identical to the broadcast form
    m1 = it1.select(
        F.round(F.col("t1").cast("double") / F.col("t2").cast("double"), 4).alias("m1")
    ).first()[0]
    s1b, s2b = irls(F.lit(m1))
    it2 = spine.agg(s1b.alias("t1"), s2b.alias("t2"))
    return it2.select(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(m0).cast("bigint").alias("median_cents"),
        F.lit(mad0).cast("bigint").alias("mad_cents"),
        F.lit(m1).cast("double").alias("huber_m1_cents"),
        F.round(
            F.col("t1").cast("double") / F.col("t2").cast("double"), 4
        ).alias("huber_m2_cents"),
    )


# ---------------------------------------------------------------------------
# TextRank keyphrases: PageRank over the adjacent-token graph.
# ---------------------------------------------------------------------------
_TEXTRANK_ITERS = 5

_TOKEN_PAIRS_CTE = """
    toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT DISTINCT least(t[i], t[i + 1]) AS a, greatest(t[i], t[i + 1]) AS b
      FROM toks, (SELECT unnest(range(1, 400)) AS i) idx
      WHERE i <= len(t) - 1 AND t[i] <> t[i + 1]
        AND length(t[i]) >= 4 AND length(t[i + 1]) >= 4),
    pairs AS (SELECT a AS doc_a, b AS doc_b FROM bg)"""


def _textrank_sql(n_iter: int = _TEXTRANK_ITERS) -> str:
    steps = []
    for k in range(n_iter):
        steps.append(f"""
    pr{k + 1} AS (
      SELECT nd.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(s.c, 0) AS r
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.b AS node, sum(p.r / dg.d) AS c
        FROM edges e JOIN pr{k} p ON p.node = e.a JOIN deg dg ON dg.a = e.a
        GROUP BY e.b) s ON s.node = nd.node)""")
    return f"""
    WITH {_TOKEN_PAIRS_CTE},
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY a),
    nodes AS (SELECT a AS node FROM deg),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn),
    {','.join(steps)}
    SELECT nd.node AS token, dg.d AS degree, round(p.r, 6) AS rank
    FROM nodes nd JOIN deg dg ON dg.a = nd.node
    JOIN pr{n_iter} p ON p.node = nd.node
    ORDER BY round(p.r, 6) DESC, nd.node LIMIT 20
    """


@register("textrank_keywords", _textrank_sql(), tags=("text", "graph", "keyphrase"))
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: the top-20 keyword tokens by PageRank centrality in the
    adjacent-token co-occurrence graph (tokens >= 4 chars, distinct
    undirected adjacencies). Rides operators/graph.pagerank -- the same
    iterative-join template as pagerank_sim_graph, per-iteration
    shuffles on the token id only -- and selects the top-20 on the
    ROUNDED rank with the token as tiebreak, so both engines pick
    identical rows."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.graph import pagerank

    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tk")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tok.select(F.col("tk"), F.lead("tk").over(w).alias("nx"))
        .where(
            F.col("nx").isNotNull()
            & (F.col("tk") != F.col("nx"))
            & (F.length("tk") >= 4)
            & (F.length("nx") >= 4)
        )
        .select(
            F.least("tk", "nx").alias("doc_a"), F.greatest("tk", "nx").alias("doc_b")
        )
        .distinct()
    )
    pr = pagerank(bg, n_iter=_TEXTRANK_ITERS)
    return (
        pr.select(
            F.col("node").alias("token"),
            F.col("d").alias("degree"),
            F.round("r", 6).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "token")
        .limit(20)
    )
