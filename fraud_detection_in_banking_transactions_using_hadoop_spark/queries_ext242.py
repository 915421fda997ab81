"""Extension batch 242 (round 11): convex hull -- computational
geometry enters the registry. Andrew's monotone chain over the 50
(label x shard) embedding centroids, in EXACT INTEGER geometry:
coordinates are e6-quantized PER ROW (floor(1e6 x + 0.5) on the
DOUBLE-cast float -- never a float SUM that could differ by
association across engines), centroids are exact integer divisions of
those quantized sums, and every orientation test is the integer cross
product (bx-ax)(cy-ay) - (by-ay)(cx-ax) (~1e12, comfortably BIGINT).

The oracle replays the monotone chain as a VARIABLE-ADVANCE recursive
CTE (the r11 LZ78 pattern): state = (phase, next index i, stack of
point ordinals); a level either POPS the stack top (cross <= 0 with
the incoming point -- strict hull, collinear dropped) or PUSHES point
i and advances. Lower and upper chains run as two seed rows of the
same recursion over their respective sort orders; each phase's final
stack (last point dropped) is the hull walk. Spark side is the
bounded driver fold (50 centroid points, ledger class) mirroring the
identical integer steps.

The 100 TB note: hull-of-union == hull-of-per-partition-hulls, so the
distributed scale path is per-partition Arrow hulls unioned then
re-hulled -- that law is pinned by a fuzz pytest
(test_ext242_invariants) against this same integer fold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PTS_SQL = """
    pts AS (
      SELECT label, vec_id % 5 AS shard,
             CAST(sum(CAST(floor(1e6 * CAST(embedding[1] AS DOUBLE) + 0.5)
                           AS BIGINT)) // count(*) AS BIGINT) AS cx,
             CAST(sum(CAST(floor(1e6 * CAST(embedding[2] AS DOUBLE) + 0.5)
                           AS BIGINT)) // count(*) AS BIGINT) AS cy
      FROM embeddings GROUP BY 1, 2)
"""

def _cross_sql() -> str:
    """cross(P[st[-2]], P[st[-1]], P[i]) <= 0 over the phase's ordered
    coordinate lists (1-based)."""
    s2x = "a.xs[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)]"
    s2y = "a.ys[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)]"
    s1x = "a.xs[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]"
    s1y = "a.ys[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]"
    px = "a.xs[CAST(f.i AS INTEGER)]"
    py = "a.ys[CAST(f.i AS INTEGER)]"
    return (
        f"(({s1x} - {s2x}) * ({py} - {s2y})"
        f" - ({s1y} - {s2y}) * ({px} - {s2x})) <= 0"
    )


_HULL_ORACLE = f"""
    WITH RECURSIVE {_PTS_SQL},
    arr AS MATERIALIZED (
      SELECT 'L' AS ph, list(cx ORDER BY cx, cy) AS xs,
             list(cy ORDER BY cx, cy) AS ys,
             CAST(count(*) AS BIGINT) AS m
      FROM pts
      UNION ALL
      SELECT 'U', list(cx ORDER BY cx DESC, cy DESC),
             list(cy ORDER BY cx DESC, cy DESC),
             CAST(count(*) AS BIGINT)
      FROM pts),
    fold AS (
      SELECT ph, CAST(1 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS st
      FROM arr
      UNION ALL
      SELECT f.ph,
             CASE WHEN len(f.st) >= 2 AND {_cross_sql()}
                  THEN f.i ELSE f.i + 1 END,
             CASE WHEN len(f.st) >= 2 AND {_cross_sql()}
                  THEN f.st[1:CAST(len(f.st) - 1 AS INTEGER)]
                  ELSE list_append(f.st, f.i) END
      FROM fold f JOIN arr a ON a.ph = f.ph
      WHERE f.i <= a.m),
    fin AS (
      SELECT f.ph, f.st FROM fold f JOIN arr a ON a.ph = f.ph
      WHERE f.i = a.m + 1)
    SELECT f.ph, CAST(jj.j AS BIGINT) AS pos,
           a.xs[CAST(f.st[CAST(jj.j AS INTEGER)] AS INTEGER)] AS x_e6,
           a.ys[CAST(f.st[CAST(jj.j AS INTEGER)] AS INTEGER)] AS y_e6
    FROM fin f
    JOIN arr a ON a.ph = f.ph,
    LATERAL (SELECT unnest(range(1, len(f.st))) AS j) jj
"""


def _hull_chain(points):
    """Monotone-chain half hull over an ordered point list; returns
    stack of points with the LAST kept (caller drops it)."""
    st = []
    for p in points:
        while len(st) >= 2:
            (ax, ay), (bx, by) = st[-2], st[-1]
            if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) <= 0:
                st.pop()
            else:
                break
        st.append(p)
    return st


def convex_hull_integer(points):
    """Full CCW hull of integer points: lower + upper chains, each
    dropping its final point (the other chain's start)."""
    pts = sorted(points)
    lower = _hull_chain(pts)[:-1]
    upper = _hull_chain(list(reversed(pts)))[:-1]
    return lower, upper


@register(
    "convex_hull_centroids",
    _HULL_ORACLE,
    tags=("geometry", "embedding", "exact-arith", "bounded-fold"),
)
def q_convex_hull_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convex hull of the 50 (label, shard) embedding centroids in
    exact e6-integer geometry (module docstring): bounded driver fold
    of Andrew's monotone chain vs the variable-advance stack CTE."""
    emb = read_table(spark, sf_dir, "embeddings")
    pts_df = emb.groupBy(
        "label", F.expr("vec_id % 5").alias("shard")
    ).agg(
        F.expr(
            "CAST(sum(CAST(floor(1e6 * CAST(embedding[0] AS DOUBLE) + 0.5)"
            " AS BIGINT)) DIV count(*) AS BIGINT)"
        ).alias("cx"),
        F.expr(
            "CAST(sum(CAST(floor(1e6 * CAST(embedding[1] AS DOUBLE) + 0.5)"
            " AS BIGINT)) DIV count(*) AS BIGINT)"
        ).alias("cy"),
    )
    rows = collect_nonempty(pts_df, "hull centroid points")
    points = [(int(r["cx"]), int(r["cy"])) for r in rows]
    lower, upper = convex_hull_integer(points)
    out = [("L", j + 1, x, y) for j, (x, y) in enumerate(lower)] + [
        ("U", j + 1, x, y) for j, (x, y) in enumerate(upper)
    ]
    return spark.createDataFrame(
        out, "ph string, pos long, x_e6 long, y_e6 long"
    )
