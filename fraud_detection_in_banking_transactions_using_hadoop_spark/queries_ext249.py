"""Extension batch 249 (round 11): two geometry/graph closers.

- hull_diameter_calipers: the diameter (farthest pair) and the
  closest-hull-vertex pair of the centroid point set, via the ext242
  hull: the diameter of a set equals the max pairwise distance over
  its HULL VERTICES, so after the O(n log n) hull the candidate set
  collapses from n^2 pairs to <= |hull|^2 (~100) -- the oracle
  re-derives the hull with the ext242 stack recursion and brute-forces
  the vertex pairs exactly (squared distances stay in BIGINT; no
  sqrt anywhere). The driver fold runs rotating calipers
  (antipodal-pair walk) and its result must equal the brute vertex
  maximum -- the calipers==brute law is ALSO fuzz-pinned in pytest.

- graph_degree_powerlaw: the discrete power-law exponent of the
  payment out-degree distribution by the Hill/Clauset closed form
  alpha = 1 + n / sum ln(d / (dmin - 1/2)), with each ln evaluated
  once per DISTINCT degree on an exact rational and e9-quantized
  before the count-weighted exact integer sum (the ext236 cell
  discipline); emits the degree CCDF head alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext242 import (
    _PTS_SQL,
    convex_hull_integer,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def calipers_diameter(ring):
    """Rotating calipers over a CCW hull ring: max squared distance
    over antipodal pairs == the set diameter."""
    m = len(ring)
    if m == 1:
        return 0, ring[0], ring[0]
    if m == 2:
        dx = ring[0][0] - ring[1][0]
        dy = ring[0][1] - ring[1][1]
        return dx * dx + dy * dy, ring[0], ring[1]

    def area2(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    best = (0, ring[0], ring[0])
    j = 1
    for i in range(m):
        ni = (i + 1) % m
        while area2(ring[i], ring[ni], ring[(j + 1) % m]) > area2(
            ring[i], ring[ni], ring[j]
        ):
            j = (j + 1) % m
        for p in (ring[i], ring[ni]):
            dx, dy = p[0] - ring[j][0], p[1] - ring[j][1]
            d2 = dx * dx + dy * dy
            if d2 > best[0]:
                best = (d2, p, ring[j])
    return best


@register(
    "hull_diameter_calipers",
    f"""
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
             CASE WHEN len(f.st) >= 2 AND
               ((a.xs[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]
                 - a.xs[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                * (a.ys[CAST(f.i AS INTEGER)]
                   - a.ys[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                - (a.ys[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]
                   - a.ys[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                * (a.xs[CAST(f.i AS INTEGER)]
                   - a.xs[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)]))
               <= 0
               THEN f.i ELSE f.i + 1 END,
             CASE WHEN len(f.st) >= 2 AND
               ((a.xs[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]
                 - a.xs[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                * (a.ys[CAST(f.i AS INTEGER)]
                   - a.ys[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                - (a.ys[CAST(f.st[CAST(len(f.st) AS INTEGER)] AS INTEGER)]
                   - a.ys[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)])
                * (a.xs[CAST(f.i AS INTEGER)]
                   - a.xs[CAST(f.st[CAST(len(f.st) - 1 AS INTEGER)] AS INTEGER)]))
               <= 0
               THEN f.st[1:CAST(len(f.st) - 1 AS INTEGER)]
               ELSE list_append(f.st, f.i) END
      FROM fold f JOIN arr a ON a.ph = f.ph
      WHERE f.i <= a.m),
    fin AS (
      SELECT f.ph, f.st FROM fold f JOIN arr a ON a.ph = f.ph
      WHERE f.i = a.m + 1),
    verts AS (
      SELECT a.xs[CAST(f.st[CAST(jj.j AS INTEGER)] AS INTEGER)] AS x,
             a.ys[CAST(f.st[CAST(jj.j AS INTEGER)] AS INTEGER)] AS y
      FROM fin f
      JOIN arr a ON a.ph = f.ph,
      LATERAL (SELECT unnest(range(1, len(f.st))) AS j) jj),
    pairs AS (
      SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
             least(a.x, b.x) AS lx
      FROM verts a JOIN verts b
        ON (a.x, a.y) < (b.x, b.y))
    SELECT CAST(count(*) AS BIGINT) AS n_hull_pairs,
           CAST(max(d2) AS BIGINT) AS diameter_sq_e12,
           CAST(min(d2) AS BIGINT) AS min_vertex_gap_sq_e12
    FROM pairs
    """,
    tags=("geometry", "embedding", "exact-arith", "bounded-fold"),
)
def q_hull_diameter_calipers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diameter of the centroid set by rotating calipers over the
    exact-integer hull (module docstring); the oracle brute-forces the
    <=|hull|^2 vertex pairs -- equality IS the calipers law."""
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
    rows = collect_nonempty(pts_df, "caliper centroid points")
    points = [(int(r["cx"]), int(r["cy"])) for r in rows]
    lower, upper = convex_hull_integer(points)
    ring = lower + upper
    d2, _, _ = calipers_diameter(ring)
    # the emitted stats are over hull-vertex pairs (the oracle's
    # candidate set); calipers must agree on the max
    vs = sorted(set(ring))
    pair_d2 = [
        (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        for i, (ax, ay) in enumerate(vs)
        for (bx, by) in vs[i + 1 :]
    ]
    assert max(pair_d2) == d2, "calipers law violated"
    return spark.createDataFrame(
        [(len(pair_d2), d2, min(pair_d2))],
        "n_hull_pairs long, diameter_sq_e12 long, min_vertex_gap_sq_e12 long",
    )


@register(
    "graph_degree_powerlaw",
    """
    WITH deg AS (
      SELECT user_id, CAST(count(DISTINCT json_extract(props, '$.k'))
                           AS BIGINT) AS d
      FROM events GROUP BY user_id),
    dd AS (
      SELECT d, CAST(count(*) AS BIGINT) AS c FROM deg WHERE d >= 2
      GROUP BY d),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM dd),
    terms AS (
      SELECT d, c,
             CAST(floor(1e9 * ln(CAST(d AS DOUBLE) / 1.5) + 0.5) AS BIGINT)
               AS lnterm_e9
      FROM dd),
    alpha AS (
      SELECT t.n,
             CAST(sum(c * lnterm_e9) AS BIGINT) AS s_e9,
             CAST(1000000 + (1000000000000000 * CAST(t.n AS HUGEINT))
                  // CAST(sum(c * lnterm_e9) AS HUGEINT)
                  AS BIGINT) AS alpha_e6
      FROM terms CROSS JOIN tot t GROUP BY t.n),
    ccdf AS (
      SELECT d, c,
             CAST(sum(c) OVER (ORDER BY d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_ge
      FROM dd)
    SELECT cc.d AS degree, cc.c AS n_users, cc.n_ge,
           CAST(1000000 * cc.n_ge // a.n AS BIGINT) AS ccdf_ppm,
           a.alpha_e6
    FROM ccdf cc CROSS JOIN alpha a
    ORDER BY cc.d DESC
    LIMIT 12
    """,
    tags=("graph", "powerlaw", "exact-arith"),
)
def q_graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law exponent of the payment out-degree
    distribution (Hill/Clauset closed form at dmin=2, ln once per
    distinct degree, e9-quantized) + the CCDF head."""
    ev = read_table(spark, sf_dir, "events")
    deg = ev.groupBy("user_id").agg(
        F.countDistinct(F.get_json_object("props", "$.k"))
        .cast("bigint")
        .alias("d")
    )
    dd = (
        deg.where("d >= 2")
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    terms = dd.select(
        "d",
        "c",
        F.expr(
            "CAST(floor(1e9 * ln(CAST(d AS DOUBLE) / 1.5) + 0.5) AS BIGINT)"
        ).alias("lnterm_e9"),
    )
    alpha = terms.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr("c * lnterm_e9")).cast("bigint").alias("s_e9"),
    ).selectExpr(
        "n",
        "CAST(1000000 + (1000000000000000 * CAST(n AS DECIMAL(38,0)))"
        " DIV CAST(s_e9 AS DECIMAL(38,0)) AS BIGINT) AS alpha_e6",
    )
    from pyspark.sql import Window

    ccdf = dd.select(
        "d",
        "c",
        F.sum("c")
        .over(
            Window.orderBy(F.desc("d")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("n_ge"),
    )
    return (
        ccdf.crossJoin(F.broadcast(alpha))
        .selectExpr(
            "d AS degree",
            "c AS n_users",
            "n_ge",
            "CAST(1000000 * n_ge DIV n AS BIGINT) AS ccdf_ppm",
            "alpha_e6",
        )
        .orderBy(F.desc("degree"))
        .limit(12)
    )
