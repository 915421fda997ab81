"""Extension batch 28: distributed 1-D nearest-neighbor matching
(propensity-style), seeded personalized PageRank in exact integers,
and a quality-threshold yield curve.

Scale notes (the 100 TB story per query):
- nearest_spend_match is observational-study matching: every treated
  unit pairs with its nearest control on the 1-D score. The classic
  formulation is a single-partition sort; here it runs on the
  operators/rank two-level plan -- the INCLUSIVE prefix COUNT of
  controls under the global (spend, custkey) order turns "nearest
  preceding/following control" into two plain equi-joins on the
  control ordinal (prev = cp, next = cp + 1). No data-grain
  unpartitioned window anywhere; this is the ranked-list-merge trick
  that scales 1-D matching to any size.
- ppr_seeded is personalized PageRank from a seed cohort (NATION_3
  customers) over the customer<->supplier bipartite graph, two
  alternating steps unrolled. Every mass transfer is integer
  arithmetic -- contribution = (mass * 85) DIV (100 * degree) -- so
  both engines agree bit-for-bit with no normalization floats; each
  step is one equi-join + one groupBy on a graph key (the bounded
  iterative-join template shared with pagerank/label-prop/HITS).
- quality_yield_curve grids the hashed-n-gram classifier score over
  acceptance thresholds and reports kept-token yield per source -- the
  dashboard a data-mixture owner reads before raising the quality bar.
  One tokenize pass, one (source, threshold) groupBy; the threshold
  grid is a map-side explode of 3 literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# 1-D nearest-neighbor matching: each BUILDING-segment customer matched
# to the nearest other-segment customer by total spend.
# ---------------------------------------------------------------------------
@register(
    "nearest_spend_match",
    f"""
    WITH osum AS (
      SELECT o_custkey, CAST(sum({_CENTS}) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT c.c_custkey,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END
               AS is_control,
             coalesce(o.s, 0) AS spend
      FROM customer c LEFT JOIN osum o ON c.c_custkey = o.o_custkey
    ),
    ord AS (
      SELECT *, sum(is_control) OVER (ORDER BY spend, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
      FROM cust
    ),
    ctl AS (SELECT c_custkey AS mk, spend AS ms, cp AS crn
            FROM ord WHERE is_control = 1),
    tr AS (SELECT c_custkey, spend, cp FROM ord WHERE is_control = 0)
    SELECT t.c_custkey,
           t.spend AS spend_cents,
           CASE WHEN p.mk IS NULL THEN n.mk
                WHEN n.mk IS NULL THEN p.mk
                WHEN t.spend - p.ms <= n.ms - t.spend THEN p.mk ELSE n.mk
           END AS match_custkey,
           CASE WHEN p.mk IS NULL THEN n.ms
                WHEN n.mk IS NULL THEN p.ms
                WHEN t.spend - p.ms <= n.ms - t.spend THEN p.ms ELSE n.ms
           END AS match_spend_cents,
           CASE WHEN p.mk IS NULL THEN n.ms - t.spend
                WHEN n.mk IS NULL THEN t.spend - p.ms
                WHEN t.spend - p.ms <= n.ms - t.spend THEN t.spend - p.ms
                ELSE n.ms - t.spend
           END AS diff_cents
    FROM tr t
    LEFT JOIN ctl p ON p.crn = t.cp
    LEFT JOIN ctl n ON n.crn = t.cp + 1
    WHERE p.mk IS NOT NULL OR n.mk IS NOT NULL
    """,
    tags=("stats", "matching", "causal"),
)
def q_nearest_spend_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-control matching without a global sort: the two-level
    rank operator appends the inclusive prefix count of controls (cp)
    under the (spend, custkey) total order; a treated row's nearest
    preceding control is control-ordinal cp and its nearest following
    control is cp + 1 -- two equi-joins. Tie rule: the preceding
    control wins equidistant matches. Exact BIGINT cents throughout."""
    osum = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(_CENTS)).cast("bigint").alias("s"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .join(osum, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.when(F.col("c_mktsegment") == "BUILDING", 0).otherwise(1).alias("is_control"),
            F.coalesce(F.col("s"), F.lit(0)).cast("bigint").alias("spend"),
        )
    )
    ranked = with_global_rank(
        cust,
        "spend",
        [F.col("spend"), F.col("c_custkey")],
        prefix_sum={"cp": "is_control"},
        bucket_bits=16,  # per-customer cent sums (r13)
    ).select("c_custkey", "is_control", "spend", F.col("cp").cast("bigint").alias("cp"))
    ctl = ranked.where(F.col("is_control") == 1).select(
        F.col("c_custkey").alias("mk"), F.col("spend").alias("ms"), F.col("cp").alias("crn")
    )
    tr = ranked.where(F.col("is_control") == 0).select("c_custkey", "spend", "cp")
    prev = ctl.select(F.col("mk").alias("p_mk"), F.col("ms").alias("p_ms"), F.col("crn").alias("p_crn"))
    nxt = ctl.select(F.col("mk").alias("n_mk"), F.col("ms").alias("n_ms"), F.col("crn").alias("n_crn"))
    j = (
        tr.join(prev, F.col("p_crn") == F.col("cp"), "left")
        .join(nxt, F.col("n_crn") == F.col("cp") + 1, "left")
        .where(F.col("p_mk").isNotNull() | F.col("n_mk").isNotNull())
    )
    prev_wins = F.col("n_mk").isNull() | (
        F.col("p_mk").isNotNull()
        & (F.col("spend") - F.col("p_ms") <= F.col("n_ms") - F.col("spend"))
    )
    return j.select(
        "c_custkey",
        F.col("spend").alias("spend_cents"),
        F.when(F.col("p_mk").isNull(), F.col("n_mk"))
        .otherwise(F.when(prev_wins, F.col("p_mk")).otherwise(F.col("n_mk")))
        .alias("match_custkey"),
        F.when(F.col("p_mk").isNull(), F.col("n_ms"))
        .otherwise(F.when(prev_wins, F.col("p_ms")).otherwise(F.col("n_ms")))
        .alias("match_spend_cents"),
        F.when(F.col("p_mk").isNull(), F.col("n_ms") - F.col("spend"))
        .otherwise(
            F.when(prev_wins, F.col("spend") - F.col("p_ms")).otherwise(
                F.col("n_ms") - F.col("spend")
            )
        )
        .alias("diff_cents"),
    )


# ---------------------------------------------------------------------------
# Seeded personalized PageRank: two alternating bipartite steps in
# exact integer arithmetic.
# ---------------------------------------------------------------------------
@register(
    "ppr_seeded",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    seeds AS (
      SELECT c.c_custkey AS c, CAST(1000000000 AS BIGINT) AS mass
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY c),
    sdeg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY s),
    it1 AS (
      SELECT e.s, CAST(sum((sd.mass * 85) // (100 * cdeg.d)) AS BIGINT) AS m
      FROM e JOIN seeds sd ON e.c = sd.c JOIN cdeg ON e.c = cdeg.c
      GROUP BY e.s
    ),
    it2 AS (
      SELECT e.c,
             CAST(sum((it1.m * 85) // (100 * sdeg.d)) AS BIGINT) AS walk_mass
      FROM e JOIN it1 ON e.s = it1.s JOIN sdeg ON e.s = sdeg.s
      GROUP BY e.c
    )
    SELECT i.c AS custkey,
           CAST(coalesce(sd.mass, 0) * 15 // 100 + i.walk_mass AS BIGINT)
             AS ppr_mass
    FROM it2 i LEFT JOIN seeds sd ON i.c = sd.c
    ORDER BY ppr_mass DESC, custkey
    LIMIT 25
    """,
    tags=("graph", "pagerank", "iterative"),
)
def q_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the NATION_3 customer cohort, two
    alternating customer->supplier->customer steps with damping 0.85
    and restart 0.15, entirely in integer mass units: each transfer is
    (mass * 85) DIV (100 * degree), so there are no normalization
    floats and both engines agree exactly. The edge table feeds three
    legs (degrees + two steps): persisted under the EAGER contract.
    Deterministic top-25 via the (mass, custkey) tiebreak."""
    from pyspark.storagelevel import StorageLevel

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nat = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    seeds = (
        read_table(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("c"), F.lit(1000000000).cast("bigint").alias("mass"))
    )
    cdeg = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("cd"))
    sdeg = e.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("sd"))
    it1 = (
        e.join(seeds, "c")
        .join(cdeg, "c")
        .groupBy("s")
        .agg(F.sum(F.expr("(mass * 85) DIV (100 * cd)")).cast("bigint").alias("m"))
    )
    it2 = (
        e.join(it1, "s")
        .join(sdeg, "s")
        .groupBy("c")
        .agg(F.sum(F.expr("(m * 85) DIV (100 * sd)")).cast("bigint").alias("walk_mass"))
    )
    out = (
        it2.join(seeds.withColumnRenamed("mass", "seed_mass"), "c", "left")
        .select(
            F.col("c").alias("custkey"),
            (
                F.coalesce(F.col("seed_mass"), F.lit(0)) * 15 / F.lit(100)
            ).cast("bigint")
            .alias("_restart"),
            "walk_mass",
        )
        .select(
            "custkey",
            F.expr("CAST(_restart + walk_mass AS BIGINT)").alias("ppr_mass"),
        )
        .orderBy(F.col("ppr_mass").desc(), "custkey")
        .limit(25)
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out


# ---------------------------------------------------------------------------
# Quality-threshold yield curve per source.
# ---------------------------------------------------------------------------
@register(
    "quality_yield_curve",
    """
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             CAST(count(*) AS BIGINT) AS n_toks,
             CAST(sum(((('0x' || substr(md5(tok), 1, 8))::BIGINT % 64)
                       * 2654435761) % 1001) AS BIGINT) AS score_sum
      FROM toks GROUP BY doc_id, source
    ),
    grid AS (
      SELECT s.*, t.thr
      FROM scored s CROSS JOIN (SELECT unnest([450, 500, 550]) AS thr) t
    )
    SELECT source, CAST(thr AS INTEGER) AS threshold_milli,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score_sum >= thr * n_toks THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN score_sum >= thr * n_toks THEN n_toks ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST((1000000 * sum(CASE WHEN score_sum >= thr * n_toks
                               THEN n_toks ELSE 0 END))
                // sum(n_toks) AS BIGINT) AS token_yield_ppm
    FROM grid GROUP BY source, thr
    """,
    tags=("llm", "quality", "mixture"),
)
def q_quality_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance yield of the hashed-n-gram quality classifier at
    three mean-weight thresholds, per source: docs kept, tokens kept,
    token yield (integer ppm). One tokenize pass + one (doc, source)
    groupBy; the 3-threshold grid is a map-side literal explode, so
    the whole curve costs one extra tiny aggregation -- the dashboard
    read before raising the corpus quality bar."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    bucket = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint") % 64
    wt = (bucket * F.lit(2654435761).cast("bigint")) % 1001
    scored = toks.select("doc_id", "source", wt.alias("wt")).groupBy(
        "doc_id", "source"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        F.sum("wt").cast("bigint").alias("score_sum"),
    )
    grid = scored.select(
        "*", F.explode(F.array(F.lit(450), F.lit(500), F.lit(550))).alias("thr")
    )
    kept = F.when(F.col("score_sum") >= F.col("thr") * F.col("n_toks"), 1).otherwise(0)
    kept_toks = F.when(
        F.col("score_sum") >= F.col("thr") * F.col("n_toks"), F.col("n_toks")
    ).otherwise(0)
    return grid.groupBy("source", F.col("thr").cast("integer").alias("threshold_milli")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(kept).cast("bigint").alias("kept_docs"),
        F.sum(kept_toks).cast("bigint").alias("kept_tokens"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN score_sum >= thr * n_toks"
            " THEN n_toks ELSE 0 END)) DIV sum(n_toks) AS BIGINT)"
        ).alias("token_yield_ppm"),
    )
