"""Extension batch 93: spatial autocorrelation -- Moran's I, Geary's
C, and Getis-Ord G* hot spots on the embedding-plane grid.

grid_neighbor_pairs joins POINTS; these are the statistics that run
on the resulting lattice. The variable is cell occupancy (point count
per 0.1-cell over embedding dims 1-2), adjacency is queen (8
neighbors) among OCCUPIED cells -- documented: the analysis set is
occupied cells, identical both engines. Every statistic closes over
exact cross-multiplied integers: z_i = (n x_i - S)/n makes
sum w z_i z_j and sum w (x_i - x_j)^2 exact integer sums over the
bounded cellsx8 adjacency list.

100 TB story: cells are a DOMAIN-bounded spine (the [0,1)^2 plane at
fixed resolution caps them at 100), the adjacency join is an
equi-join on cell ids via the +-1 offset grid, and the moment
aggregates broadcast as 1-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

_CELLS_SQL = """
    cells AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.1) AS BIGINT) AS cx,
             CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.1) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS x
      FROM embeddings GROUP BY 1, 2),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
      FROM cells),
    adj AS (
      SELECT a.cx, a.cy, a.x AS xi, b.x AS xj
      FROM cells a
      JOIN (SELECT unnest(range(-1, 2)) AS dx) ox ON true
      JOIN (SELECT unnest(range(-1, 2)) AS dy) oy ON true
      JOIN cells b ON b.cx = a.cx + ox.dx AND b.cy = a.cy + oy.dy
      WHERE NOT (ox.dx = 0 AND oy.dy = 0))
"""


def _cells_adj(spark: SparkSession, sf_dir: str):
    emb = read_table(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            F.floor(F.element_at("embedding", 1).cast("double") / 0.1)
            .cast("bigint")
            .alias("cx"),
            F.floor(F.element_at("embedding", 2).cast("double") / 0.1)
            .cast("bigint")
            .alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    mom = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast(_DEC).alias("s"),
        F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).cast(_DEC).alias("s2"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if not (dx == 0 and dy == 0)],
        "dx int, dy int",
    )
    a = cells.alias("a")
    b = cells.select(
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"), F.col("x").alias("xj")
    )
    adj = (
        a.crossJoin(F.broadcast(offs))
        .join(
            b,
            (F.col("bcx") == F.col("a.cx") + F.col("dx"))
            & (F.col("bcy") == F.col("a.cy") + F.col("dy")),
        )
        .select(
            F.col("a.cx").alias("cx"),
            F.col("a.cy").alias("cy"),
            F.col("a.x").alias("xi"),
            "xj",
        )
    )
    return cells, mom, adj


# ---------------------------------------------------------------------------
# Moran's I global spatial autocorrelation.
# ---------------------------------------------------------------------------
@register(
    "morans_i",
    f"""
    WITH {_CELLS_SQL},
    pairsum AS (
      SELECT CAST(count(*) AS BIGINT) AS w,
             CAST(sum((m.n * CAST(xi AS HUGEINT) - m.s)
                      * (m.n * CAST(xj AS HUGEINT) - m.s)) AS HUGEINT) AS szz
      FROM adj CROSS JOIN mom m),
    c AS (
      SELECT m.n, p.w,
             CAST(p.szz AS DOUBLE)
               / (CAST(m.n AS DOUBLE)
                  * CAST(m.n * m.s2 - m.s * m.s AS DOUBLE)) AS ratio
      FROM pairsum p CROSS JOIN mom m)
    SELECT CAST(n AS BIGINT) AS n_cells, w AS n_adjacencies,
           round(CAST(n AS DOUBLE) / w * ratio, 6) + 0.0 AS morans_i,
           round(-1.0 / (CAST(n AS DOUBLE) - 1.0), 6) AS expected_i
    FROM c
    """,
    tags=("spatial", "autocorrelation", "exact-arith"),
)
def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I of cell occupancy on the embedding grid: I = (n/W)
    sum_adj z_i z_j / sum z^2 with z cross-multiplied to the exact
    integers (n x - S), so the adjacency sum and the variance are
    exact until one double ratio. I > E[I] = -1/(n-1) means occupied
    cells cluster next to similarly-occupied cells -- the first
    statistic any spatial analysis reports."""
    cells, mom, adj = _cells_adj(spark, sf_dir)
    nd = F.col("n").cast(_DEC)
    zz = (nd * F.col("xi").cast(_DEC) - F.col("s")) * (
        nd * F.col("xj").cast(_DEC) - F.col("s")
    )
    pairsum = adj.crossJoin(F.broadcast(mom)).agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(zz).cast(_DEC).alias("szz"),
    )
    c = pairsum.crossJoin(F.broadcast(mom)).select(
        "n",
        "w",
        (
            F.col("szz").cast("double")
            / (
                F.col("n").cast("double")
                * (nd * F.col("s2") - F.col("s") * F.col("s")).cast("double")
            )
        ).alias("ratio"),
    )
    return c.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.col("w").alias("n_adjacencies"),
        (
            F.round(F.col("n").cast("double") / F.col("w") * F.col("ratio"), 6)
            + 0.0
        ).alias("morans_i"),
        F.round(-1.0 / (F.col("n").cast("double") - 1.0), 6).alias("expected_i"),
    )


# ---------------------------------------------------------------------------
# Geary's C local-difference autocorrelation.
# ---------------------------------------------------------------------------
@register(
    "gearys_c",
    f"""
    WITH {_CELLS_SQL},
    pairsum AS (
      SELECT CAST(count(*) AS BIGINT) AS w,
             CAST(sum(CAST(xi - xj AS HUGEINT) * (xi - xj)) AS HUGEINT) AS sdd
      FROM adj),
    c AS (
      SELECT m.n, p.w,
             CAST(p.sdd AS DOUBLE) * m.n
               / CAST(m.n * m.s2 - m.s * m.s AS DOUBLE) AS ratio
      FROM pairsum p CROSS JOIN mom m)
    SELECT CAST(n AS BIGINT) AS n_cells, w AS n_adjacencies,
           round((CAST(n AS DOUBLE) - 1.0) / (2.0 * w) * ratio, 6) AS gearys_c
    FROM c
    """,
    tags=("spatial", "autocorrelation", "exact-arith"),
)
def q_gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C = ((n-1)/2W) sum_adj (x_i - x_j)^2 / sum z^2: the
    local-difference companion (C < 1 = positive autocorrelation,
    more sensitive to local structure than Moran's global
    cross-product). Exact integer difference-squares over the
    adjacency list; one double ratio."""
    cells, mom, adj = _cells_adj(spark, sf_dir)
    dd = (F.col("xi") - F.col("xj")).cast(_DEC)
    pairsum = adj.agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(dd * dd).cast(_DEC).alias("sdd"),
    )
    nd = F.col("n").cast(_DEC)
    c = pairsum.crossJoin(F.broadcast(mom)).select(
        "n",
        "w",
        (
            F.col("sdd").cast("double")
            * F.col("n")
            / (nd * F.col("s2") - F.col("s") * F.col("s")).cast("double")
        ).alias("ratio"),
    )
    return c.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.col("w").alias("n_adjacencies"),
        F.round(
            (F.col("n").cast("double") - 1.0) / (2.0 * F.col("w")) * F.col("ratio"),
            6,
        ).alias("gearys_c"),
    )


# ---------------------------------------------------------------------------
# Getis-Ord G* hot spots (top 5 cells).
# ---------------------------------------------------------------------------
@register(
    "getis_ord_hotspots",
    f"""
    WITH {_CELLS_SQL},
    selfadj AS (
      SELECT cx, cy, xi, xj FROM adj
      UNION ALL
      SELECT cx, cy, x AS xi, x AS xj FROM cells),
    local AS (
      SELECT cx, cy,
             CAST(count(*) AS BIGINT) AS wi,
             CAST(sum(xj) AS BIGINT) AS li
      FROM selfadj GROUP BY cx, cy),
    scored AS (
      SELECT l.cx, l.cy, l.wi, l.li,
             (CAST(m.n AS DOUBLE) * l.li - CAST(l.wi AS DOUBLE) * m.s)
             / (sqrt((CAST(m.n AS DOUBLE) * m.s2 - CAST(m.s AS DOUBLE) * m.s)
                     / CAST(m.n AS DOUBLE))
                * sqrt((CAST(m.n AS DOUBLE) * l.wi - CAST(l.wi AS DOUBLE) * l.wi)
                       * CAST(m.n AS DOUBLE) / (m.n - 1))) AS gstar
      FROM local l CROSS JOIN mom m)
    SELECT cx, cy, li AS local_sum, CAST(wi AS INTEGER) AS n_neighbors,
           round(gstar, 4) AS gstar_z
    FROM scored ORDER BY gstar DESC, cx, cy LIMIT 5
    """,
    tags=("spatial", "hotspot", "exact-arith"),
)
def q_getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord G*_i for every occupied cell (self + queen
    neighbors): z = (n L_i - W_i S) / (s sqrt(n(n W_i - W_i^2)/(n-1)))
    with the exact integer numerator and population SD from exact
    moments; the top-5 hot cells (gstar desc, cell tiebreak) are
    where occupancy concentrates BEYOND what the global density
    predicts. The local statistic behind every 'hot spot map'."""
    cells, mom, adj = _cells_adj(spark, sf_dir)
    selfadj = adj.unionByName(
        cells.select(
            "cx", "cy", F.col("x").alias("xi"), F.col("x").alias("xj")
        )
    )
    local = selfadj.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).cast("bigint").alias("wi"),
        F.sum("xj").cast("bigint").alias("li"),
    )
    ndd = F.col("n").cast("double")
    gstar = (
        ndd * F.col("li") - F.col("wi").cast("double") * F.col("s")
    ) / (
        F.sqrt(
            (ndd * F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s"))
            / ndd
        )
        * F.sqrt(
            (ndd * F.col("wi") - F.col("wi").cast("double") * F.col("wi"))
            * ndd
            / (F.col("n") - 1)
        )
    )
    scored = local.crossJoin(F.broadcast(mom)).select(
        "cx", "cy", "wi", "li", gstar.alias("gstar")
    )
    return (
        scored.orderBy(F.col("gstar").desc(), "cx", "cy")
        .limit(5)
        .select(
            "cx",
            "cy",
            F.col("li").alias("local_sum"),
            F.col("wi").cast("int").alias("n_neighbors"),
            F.round("gstar", 4).alias("gstar_z"),
        )
    )
