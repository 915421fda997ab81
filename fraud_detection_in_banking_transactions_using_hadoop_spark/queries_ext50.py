"""Extension batch 50: Kendall's W concordance and transition
direction asymmetry.

Scale notes (the 100 TB story per query):
- kendalls_w asks whether three yearly revenue rankings of the same
  parts agree: per-year DOUBLED average ranks come from the
  distinct-value spine (the mann_whitney machinery -- ties are spine
  rows, no per-row sort), rank sums per part and the spread S are
  exact integers, and the tie-corrected W closes in one double. W ~ 1
  means the part hierarchy is stable year over year.
- transition_asymmetry screens event-pair DIRECTIONALITY: for each
  unordered behavior pair, is a->b significantly more common than
  b->a? Counts come from the shared per-user lead window, and the
  per-pair binomial z closes over exact integers -- the causal-order
  smell test run before anyone fits a funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS_L = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
_YEARS = (1995, 1996, 1997)
_DEC = "decimal(38,0)"


def _year_rank_sql(y: int) -> str:
    return f"""
    rev{y} AS (
      SELECT l.l_partkey AS part, CAST(sum({_CENTS_L}) AS BIGINT) AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '{y}-01-01'
        AND o.o_orderdate < DATE '{y + 1}-01-01'
      GROUP BY l.l_partkey
    )"""


@register(
    "kendalls_w",
    f"""
    WITH {", ".join(_year_rank_sql(y) for y in _YEARS)},
    common AS (
      SELECT a.part FROM rev1995 a
      JOIN rev1996 b ON a.part = b.part
      JOIN rev1997 c ON a.part = c.part
    ),
    vals AS (
      SELECT 1995 AS y, r.part, r.v FROM rev1995 r
      JOIN common cm ON r.part = cm.part
      UNION ALL
      SELECT 1996, r.part, r.v FROM rev1996 r JOIN common cm ON r.part = cm.part
      UNION ALL
      SELECT 1997, r.part, r.v FROM rev1997 r JOIN common cm ON r.part = cm.part
    ),
    spine AS (SELECT y, v, CAST(count(*) AS BIGINT) AS c FROM vals
              GROUP BY y, v),
    ranked AS (
      SELECT y, v, c,
             coalesce(sum(c) OVER (PARTITION BY y ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM spine
    ),
    rx2 AS (
      SELECT va.part, va.y, 2 * r.below + r.c + 1 AS rank_x2
      FROM vals va JOIN ranked r ON va.y = r.y AND va.v = r.v
    ),
    per_part AS (
      SELECT part, CAST(sum(rank_x2) AS HUGEINT) AS sr_x2 FROM rx2
      GROUP BY part
    ),
    nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM common),
    s AS (
      SELECT CAST(sum((p.sr_x2 - 3 * (nn.n + 1))
                      * (p.sr_x2 - 3 * (nn.n + 1))) AS HUGEINT) AS s_x4,
             max(nn.n) AS n
      FROM per_part p CROSS JOIN nn
    ),
    ties AS (
      SELECT CAST(coalesce(sum(c * c * c - c), 0) AS HUGEINT) AS t
      FROM spine WHERE c > 1
    )
    SELECT CAST(s.n AS BIGINT) AS n_parts,
           CAST(s.s_x4 // 4 AS BIGINT) AS s_stat,
           round(3.0 * CAST(s.s_x4 AS DOUBLE)
                 / (9 * (CAST(s.n AS DOUBLE) * s.n * s.n - s.n)
                    - 3 * CAST(ties.t AS DOUBLE)), 6) AS w
    FROM s CROSS JOIN ties
    """,
    tags=("stats", "concordance", "rank"),
)
def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W over m=3 yearly part-revenue rankings (parts present in all
    three years): doubled average ranks from per-year spines, rank
    sums minus the doubled mean 3(n+1) squared and summed exactly,
    tie-corrected denominator m^2(n^3-n) - m*sum(t^3-t). One double
    at the end; W in [0, 1]."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)

    def year_rev(y: int) -> DataFrame:
        return (
            j.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
            )
            .groupBy(F.col("l_partkey").alias("part"))
            .agg(F.sum(F.expr(_CENTS_L)).cast("bigint").alias("v"))
        )

    revs = {y: year_rev(y) for y in _YEARS}
    common = (
        revs[1995]
        .select("part")
        .join(revs[1996].select("part"), "part")
        .join(revs[1997].select("part"), "part")
    )
    vals = None
    for y in _YEARS:
        part = revs[y].join(common, "part").select(F.lit(y).alias("y"), "part", "v")
        vals = part if vals is None else vals.unionByName(part)
    spine = vals.groupBy("y", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wv = Window.partitionBy("y").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = spine.select(
        "y", "v", "c", F.coalesce(F.sum("c").over(wv), F.lit(0)).alias("below")
    )
    rx2 = vals.join(ranked, ["y", "v"]).select(
        "part", (2 * F.col("below") + F.col("c") + 1).alias("rank_x2")
    )
    per_part = rx2.groupBy("part").agg(F.sum("rank_x2").cast(_DEC).alias("sr_x2"))
    nn = common.agg(F.count(F.lit(1)).cast(_DEC).alias("n"))
    s = per_part.crossJoin(F.broadcast(nn)).agg(
        F.sum(
            (F.col("sr_x2") - 3 * (F.col("n") + 1))
            * (F.col("sr_x2") - 3 * (F.col("n") + 1))
        )
        .cast(_DEC)
        .alias("s_x4"),
        F.max("n").alias("n"),
    )
    ties = spine.where(F.col("c") > 1).agg(
        F.coalesce(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")), F.lit(0)
        )
        .cast(_DEC)
        .alias("t")
    )
    nd = F.col("n").cast("double")
    return s.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.expr("CAST(s_x4 DIV 4 AS BIGINT)").alias("s_stat"),
        F.round(
            3.0
            * F.col("s_x4").cast("double")
            / (9 * (nd * nd * nd - nd) - 3 * F.col("t").cast("double")),
            6,
        ).alias("w"),
    )


# ---------------------------------------------------------------------------
# Transition direction asymmetry: a->b vs b->a.
# ---------------------------------------------------------------------------
@register(
    "transition_asymmetry",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM seq
          WHERE nxt IS NOT NULL AND cur <> nxt GROUP BY cur, nxt),
    pairs AS (
      SELECT a.cur AS ev_a, a.nxt AS ev_b,
             a.n AS n_ab, coalesce(b.n, 0) AS n_ba
      FROM c a LEFT JOIN c b ON a.cur = b.nxt AND a.nxt = b.cur
      WHERE a.cur < a.nxt
    )
    SELECT ev_a, ev_b, n_ab, CAST(n_ba AS BIGINT) AS n_ba,
           CASE WHEN n_ab + n_ba = 0 THEN NULL
                ELSE round((n_ab - CAST(n_ab + n_ba AS DOUBLE) / 2)
                           / sqrt(CAST(n_ab + n_ba AS DOUBLE) / 4), 6)
           END AS z_score
    FROM pairs WHERE n_ab + n_ba >= 20
    """,
    tags=("sequence", "directionality", "stats"),
)
def q_transition_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each unordered behavior pair with >= 20 adjacent
    transitions: is a->b more common than b->a? Counts from the
    shared per-user lead window, per-pair binomial z over exact
    integers. Strong asymmetry = real ordering in the behavior (the
    pre-funnel smell test)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"), F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull() & (F.col("cur") != F.col("nxt")))
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    b = c.select(
        F.col("cur").alias("b_cur"), F.col("nxt").alias("b_nxt"), F.col("n").alias("n_ba")
    )
    pairs = (
        c.join(
            b,
            (F.col("cur") == F.col("b_nxt")) & (F.col("nxt") == F.col("b_cur")),
            "left",
        )
        .where(F.col("cur") < F.col("nxt"))
        .select(
            F.col("cur").alias("ev_a"),
            F.col("nxt").alias("ev_b"),
            F.col("n").alias("n_ab"),
            F.coalesce(F.col("n_ba"), F.lit(0)).cast("bigint").alias("n_ba"),
        )
    )
    m = (F.col("n_ab") + F.col("n_ba")).cast("double")
    z = (F.col("n_ab") - m / 2) / F.sqrt(m / 4)
    return pairs.where(F.col("n_ab") + F.col("n_ba") >= 20).select(
        "ev_a",
        "ev_b",
        "n_ab",
        "n_ba",
        F.when(F.col("n_ab") + F.col("n_ba") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z_score"),
    )
