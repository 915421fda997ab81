"""Extension batch 255 (round 12): the economic-geography BI pair --
location-quotient specialization and the Krugman specialization index.
(A first draft also carried shift-share, but ext103 already ships
`shift_share_decomposition` -- the registry-uniqueness gate caught the
collision, the r9 build-notes rule.)

- location_quotient_cells: LQ = (cell share of its nation) / (segment
  share of the economy) in exact ppm -- one integer expression
  (1e6 * e_cell * e_total) DIV (e_nation * e_segment) over DECIMAL38
  products, cells = (nation, segment) revenue over the two
  densest-order years (dynamic anchor). Top-15 most specialized cells
  with the marginals alongside.

- krugman_specialization: per-nation K = sum_seg |share_nation(seg) -
  share_rest_of_economy(seg)| -- the standard structural-divergence
  index (0 = identical mix, 2 = disjoint). Each |a/b - c/d| term is
  the exact rational |ad - cb| / (bd), ppm-quantized per term before
  the order-free integer sum; K's [0, 2e6] range and the two-segment
  symmetry law are pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# The two anchor years: the two calendar years with the most orders
# (deterministic count-desc, year-asc tiebreak), t0 = earlier.
_YEARS_CTE = """
    yrs AS (
      SELECT year(o_orderdate) AS y, count(*) AS cnt
      FROM orders GROUP BY 1 ORDER BY cnt DESC, y LIMIT 2),
    anchor AS (SELECT min(y) AS y0, max(y) AS y1 FROM yrs)
"""

_CELLS_CTE = """
    cells AS (
      SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
             CAST(sum(CASE WHEN year(o.o_orderdate) = a.y0
               THEN CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS e0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = a.y1
               THEN CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS e1
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      CROSS JOIN anchor a
      WHERE year(o.o_orderdate) IN (a.y0, a.y1)
      GROUP BY 1, 2)
"""


def _anchor_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, seg, e) revenue cents over the two densest-order years
    (dynamic anchor), eagerly checkpointed -- shared by both queries,
    each of which references it on several aggregate sides."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("y"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("seg"),
    )
    yrs = (
        orders.groupBy("y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "y")
        .limit(2)
    )
    anchor = yrs.agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
    return (
        orders.crossJoin(F.broadcast(anchor))
        .where((F.col("y") == F.col("y0")) | (F.col("y") == F.col("y1")))
        .join(F.broadcast(cust), "o_custkey")
        .groupBy("nation", "seg")
        .agg(F.sum("c").cast("bigint").alias("e"))
        .localCheckpoint(eager=True)
    )



@register(
    "location_quotient_cells",
    f"""
    WITH {_YEARS_CTE}, {_CELLS_CTE},
    base AS (
      SELECT nation, seg, e0 + e1 AS e FROM cells),
    nat AS (SELECT nation, CAST(sum(e) AS BIGINT) AS en
            FROM base GROUP BY nation),
    segs AS (SELECT seg, CAST(sum(e) AS BIGINT) AS es
             FROM base GROUP BY seg),
    tot AS (SELECT CAST(sum(e) AS BIGINT) AS et FROM base)
    SELECT CAST(b.nation AS INTEGER) AS nation, b.seg AS seg,
           b.e AS cell_cents, n.en AS nation_cents, s.es AS segment_cents,
           CAST((1000000 * CAST(b.e AS HUGEINT) * t.et)
                // (CAST(n.en AS HUGEINT) * s.es) AS BIGINT) AS lq_ppm
    FROM base b JOIN nat n ON n.nation = b.nation
    JOIN segs s ON s.seg = b.seg CROSS JOIN tot t
    WHERE b.e > 0
    ORDER BY lq_ppm DESC, nation, b.seg
    LIMIT 15
    """,
    tags=("bi", "econometrics", "concentration", "exact-arith"),
)
def q_location_quotient_cells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Location quotients of (nation, segment) revenue cells over the
    two anchor years combined: one exact integer expression per cell,
    top-15 most specialized."""
    base = _anchor_cells(spark, sf_dir)
    nat = base.groupBy("nation").agg(
        F.sum("e").cast("bigint").alias("en")
    )
    segs = base.groupBy("seg").agg(F.sum("e").cast("bigint").alias("es"))
    tot = base.agg(F.sum("e").cast("bigint").alias("et"))
    return (
        base.join(F.broadcast(nat), "nation")
        .join(F.broadcast(segs), "seg")
        .crossJoin(F.broadcast(tot))
        .where(F.col("e") > 0)
        .select(
            F.col("nation").cast("integer").alias("nation"),
            "seg",
            F.col("e").alias("cell_cents"),
            F.col("en").alias("nation_cents"),
            F.col("es").alias("segment_cents"),
            F.expr(
                "CAST((1000000 * CAST(e AS DECIMAL(38,0)) * et)"
                " DIV (CAST(en AS DECIMAL(38,0)) * es) AS BIGINT)"
            ).alias("lq_ppm"),
        )
        .orderBy(F.col("lq_ppm").desc(), "nation", "seg")
        .limit(15)
    )


@register(
    "krugman_specialization",
    f"""
    WITH {_YEARS_CTE}, {_CELLS_CTE},
    base AS (
      SELECT nation, seg, e0 + e1 AS e FROM cells),
    nat AS (SELECT nation, CAST(sum(e) AS BIGINT) AS en
            FROM base GROUP BY nation),
    segs AS (SELECT seg, CAST(sum(e) AS BIGINT) AS es
             FROM base GROUP BY seg),
    tot AS (SELECT CAST(sum(e) AS BIGINT) AS et FROM base),
    terms AS (
      SELECT b.nation,
             CAST((1000000 * abs(CAST(b.e AS HUGEINT) * (t.et - n.en)
                   - CAST(s.es - b.e AS HUGEINT) * n.en))
                  // (CAST(n.en AS HUGEINT) * (t.et - n.en))
                  AS BIGINT) AS term_ppm
      FROM base b JOIN nat n ON n.nation = b.nation
      JOIN segs s ON s.seg = b.seg CROSS JOIN tot t)
    SELECT CAST(nation AS INTEGER) AS nation,
           CAST(sum(term_ppm) AS BIGINT) AS krugman_ppm
    FROM terms GROUP BY nation
    ORDER BY krugman_ppm DESC, nation
    """,
    tags=("bi", "econometrics", "concentration", "exact-arith"),
)
def q_krugman_specialization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Krugman specialization index per nation (module docstring):
    structural divergence of each nation's segment mix from the rest
    of the economy, exact-rational terms ppm-quantized before the
    order-free integer sum."""
    base = _anchor_cells(spark, sf_dir)
    nat = base.groupBy("nation").agg(
        F.sum("e").cast("bigint").alias("en")
    )
    segs = base.groupBy("seg").agg(F.sum("e").cast("bigint").alias("es"))
    tot = base.agg(F.sum("e").cast("bigint").alias("et"))
    terms = (
        base.join(F.broadcast(nat), "nation")
        .join(F.broadcast(segs), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.expr(
                "CAST((1000000 * abs(CAST(e AS DECIMAL(38,0)) * (et - en)"
                " - CAST(es - e AS DECIMAL(38,0)) * en))"
                " DIV (CAST(en AS DECIMAL(38,0)) * (et - en)) AS BIGINT)"
            ).alias("term_ppm"),
        )
    )
    return (
        terms.groupBy("nation")
        .agg(F.sum("term_ppm").cast("bigint").alias("krugman_ppm"))
        .select(
            F.col("nation").cast("integer").alias("nation"),
            "krugman_ppm",
        )
        .orderBy(F.col("krugman_ppm").desc(), "nation")
    )
