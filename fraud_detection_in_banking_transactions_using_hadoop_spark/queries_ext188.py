"""Extension batch 188 (round 7): the local-spatial tier -- LISA local
Moran decomposition, binary join-count statistics, Ripley's K/L point-
pattern functions, and the Knox space-time interaction test.

ext93 built the GLOBAL spatial statistics (Moran's I, Geary's C,
Getis-Ord G*) on the embedding-plane occupancy grid; this batch adds
the per-cell and point-level views a spatial fraud analyst actually
drills into:

- local_morans_lisa: Anselin's local Moran I_i per occupied cell with
  HH/HL/LH/LL quadrant labels -- exact integer cross-moments
  ((n*x_i - S) * sum_j (n*x_j - S) over the queen adjacency), divided
  once; isolated cells keep lag 0 via the left join.
- join_count_stats: binarize cells at the mean (n*x > S, exact) and
  count BB/BW/WW adjacent pairs against their hypergeometric
  (nonfree-sampling) expectations -- the categorical cousin of
  Moran's I, all counts ordered-pair integers.
- ripley_k_grid: Ripley's K and the variance-stabilized L(r) - r at
  r in {0.05, 0.1, 0.15, 0.2} over the raw embedding points in the
  declared unit window [-0.5, 0.5]^2 (no edge correction --
  documented). The exact all-pairs estimator (n <= 2000 points,
  broadcast nested loop, the ann_cosine_topk precedent); the
  grid-bucketed join (grid_neighbor_pairs) is the 100 TB path.
- knox_spacetime: the Knox test for space-time interaction on the
  busiest day's first 1000 events: per-user deterministic md5-plane
  positions, delta = 0.1 plane distance, tau = 30 min; X = pairs close
  in BOTH vs E = S*T/P, with the Poisson z-score.

Cross-engine discipline: every count is an exact integer; the only
divisions are final (one double op each, identical text); distance
comparisons are IEEE double compares of identically-built expressions;
sign-crossing rounded outputs carry '+ 0.0'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext93 import (
    _CELLS_SQL,
    _cells_adj,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"
_RADII = (0.05, 0.1, 0.15, 0.2)
_KNOX_DELTA2 = 0.01        # 0.1 plane units, squared
_KNOX_TAU_US = 1_800_000_000  # 30 minutes in micros
_KNOX_CAP = 1000


@register(
    "local_morans_lisa",
    f"""
    WITH {_CELLS_SQL},
    lag AS (
      SELECT cx, cy, max(xi) AS xi,
             CAST(sum(CAST(xj AS HUGEINT)) AS HUGEINT) AS sxj,
             CAST(count(*) AS BIGINT) AS deg
      FROM adj GROUP BY cx, cy),
    li AS (
      SELECT c.cx, c.cy, c.x,
             (m.n * CAST(c.x AS HUGEINT) - m.s) AS zi,
             coalesce(m.n * l.sxj - l.deg * m.s, CAST(0 AS HUGEINT)) AS zlag,
             coalesce(l.deg, CAST(0 AS BIGINT)) AS deg,
             m.n * m.s2 - m.s * m.s AS den
      FROM cells c
      LEFT JOIN lag l ON l.cx = c.cx AND l.cy = c.cy
      CROSS JOIN mom m)
    SELECT cx, cy, x AS n_points, deg AS n_neighbors,
           round(CAST(zi * zlag AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0
             AS local_i,
           CASE WHEN zi > 0 AND zlag > 0 THEN 'HH'
                WHEN zi > 0 THEN 'HL'
                WHEN zlag > 0 THEN 'LH'
                ELSE 'LL' END AS quadrant
    FROM li
    """,
    tags=("spatial", "lisa", "exact-arith"),
)
def q_local_morans_lisa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anselin's local Moran I_i per occupied grid cell: with exact
    integer deviations zi = n*x_i - S and spatial lag
    zlag = sum_j (n*x_j - S) over the queen adjacency,
    I_i = zi*zlag / (n*s2 - s^2) (one double division). Quadrants
    label the cluster type: HH/LL = spatial clusters of high/low
    occupancy, HL/LH = spatial outliers. Isolated cells keep lag 0
    through the left join rather than dropping out."""
    cells, mom, adj = _cells_adj(spark, sf_dir)
    lag = adj.groupBy("cx", "cy").agg(
        F.max("xi").alias("xi"),
        F.sum(F.col("xj").cast(_DEC)).cast(_DEC).alias("sxj"),
        F.count(F.lit(1)).cast("bigint").alias("deg"),
    )
    li = (
        cells.join(lag.select("cx", "cy", "sxj", "deg"), ["cx", "cy"], "left")
        .crossJoin(F.broadcast(mom))
        .select(
            "cx",
            "cy",
            "x",
            (F.col("n").cast(_DEC) * F.col("x").cast(_DEC) - F.col("s")).alias(
                "zi"
            ),
            F.coalesce(
                F.col("n").cast(_DEC) * F.col("sxj")
                - F.col("deg").cast(_DEC) * F.col("s"),
                F.lit(0).cast(_DEC),
            ).alias("zlag"),
            F.coalesce(F.col("deg"), F.lit(0).cast("bigint")).alias("deg"),
            (
                F.col("n").cast(_DEC) * F.col("s2") - F.col("s") * F.col("s")
            ).alias("den"),
        )
    )
    return li.select(
        "cx",
        "cy",
        F.col("x").alias("n_points"),
        F.col("deg").alias("n_neighbors"),
        (
            F.round(
                (F.col("zi") * F.col("zlag")).cast("double")
                / F.col("den").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("local_i"),
        F.when((F.col("zi") > 0) & (F.col("zlag") > 0), "HH")
        .when(F.col("zi") > 0, "HL")
        .when(F.col("zlag") > 0, "LH")
        .otherwise("LL")
        .alias("quadrant"),
    )


@register(
    "join_count_stats",
    f"""
    WITH {_CELLS_SQL},
    jc AS (
      SELECT CAST(count(*) AS BIGINT) AS w,
             CAST(sum(CASE WHEN (m.n * CAST(a.xi AS HUGEINT) > m.s)
                            AND (m.n * CAST(a.xj AS HUGEINT) > m.s)
                           THEN 1 ELSE 0 END) AS BIGINT) AS bb,
             CAST(sum(CASE WHEN (m.n * CAST(a.xi AS HUGEINT) > m.s)
                            <> (m.n * CAST(a.xj AS HUGEINT) > m.s)
                           THEN 1 ELSE 0 END) AS BIGINT) AS bw
      FROM adj a CROSS JOIN mom m),
    hotc AS (
      SELECT CAST(sum(CASE WHEN m.n * CAST(c.x AS HUGEINT) > m.s
                           THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(max(m.n) AS BIGINT) AS n
      FROM cells c CROSS JOIN mom m)
    SELECT h.n AS n_cells, h.n1 AS n_hot, j.w AS w_ordered,
           j.bb, j.bw, j.w - j.bb - j.bw AS ww,
           round(CAST(j.w AS DOUBLE) * h.n1 * (h.n1 - 1)
                 / (CAST(h.n AS DOUBLE) * (h.n - 1)), 6) AS e_bb,
           round(CAST(j.w AS DOUBLE) * 2.0 * h.n1 * (h.n - h.n1)
                 / (CAST(h.n AS DOUBLE) * (h.n - 1)), 6) AS e_bw,
           round(CAST(j.w AS DOUBLE) * (h.n - h.n1) * (h.n - h.n1 - 1)
                 / (CAST(h.n AS DOUBLE) * (h.n - 1)), 6) AS e_ww
    FROM jc j CROSS JOIN hotc h
    """,
    tags=("spatial", "join-counts", "exact-arith"),
)
def q_join_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary join-count statistics on the occupancy grid: cells are
    hot when n*x > S (above the mean, exact integers), and the queen
    adjacencies are classified BB / BW / WW (ordered-pair counts).
    Expectations are the nonfree-sampling (hypergeometric) null:
    E[BB] = W*n1*(n1-1)/(n*(n-1)) etc. BB >> E[BB] reads as spatial
    clustering of dense cells -- the categorical twin of Moran's I."""
    cells, mom, adj = _cells_adj(spark, sf_dir)
    jc = adj.crossJoin(F.broadcast(mom)).agg(
        F.count(F.lit(1)).cast("bigint").alias("w"),
        F.sum(
            F.when(
                (F.col("n").cast(_DEC) * F.col("xi").cast(_DEC) > F.col("s"))
                & (F.col("n").cast(_DEC) * F.col("xj").cast(_DEC) > F.col("s")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bb"),
        F.sum(
            F.when(
                (F.col("n").cast(_DEC) * F.col("xi").cast(_DEC) > F.col("s"))
                != (
                    F.col("n").cast(_DEC) * F.col("xj").cast(_DEC) > F.col("s")
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bw"),
    )
    hotc = cells.crossJoin(F.broadcast(mom)).agg(
        F.sum(
            F.when(
                F.col("n").cast(_DEC) * F.col("x").cast(_DEC) > F.col("s"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n1"),
        F.max("n").cast("bigint").alias("n"),
    )
    nf = F.col("n").cast("double")
    return jc.crossJoin(F.broadcast(hotc)).select(
        F.col("n").alias("n_cells"),
        F.col("n1").alias("n_hot"),
        F.col("w").alias("w_ordered"),
        "bb",
        "bw",
        (F.col("w") - F.col("bb") - F.col("bw")).alias("ww"),
        F.round(
            F.col("w").cast("double")
            * F.col("n1")
            * (F.col("n1") - 1)
            / (nf * (F.col("n") - 1)),
            6,
        ).alias("e_bb"),
        F.round(
            F.col("w").cast("double")
            * 2.0
            * F.col("n1")
            * (F.col("n") - F.col("n1"))
            / (nf * (F.col("n") - 1)),
            6,
        ).alias("e_bw"),
        F.round(
            F.col("w").cast("double")
            * (F.col("n") - F.col("n1"))
            * (F.col("n") - F.col("n1") - 1)
            / (nf * (F.col("n") - 1)),
            6,
        ).alias("e_ww"),
    )


_K_COLS_SQL = ", ".join(
    f"""round(CAST(sum(CASE WHEN d2 <= CAST({r * r!r} AS DOUBLE)
             THEN 1 ELSE 0 END) AS DOUBLE)
        / (CAST(max(np) AS DOUBLE) * (max(np) - 1)), 6) AS k_{int(r * 100):03d},
        round(sqrt(CAST(sum(CASE WHEN d2 <= CAST({r * r!r} AS DOUBLE)
             THEN 1 ELSE 0 END) AS DOUBLE)
        / (CAST(max(np) AS DOUBLE) * (max(np) - 1)) / pi()) - {r!r}, 6) + 0.0
          AS l_minus_r_{int(r * 100):03d}"""
    for r in _RADII
)


@register(
    "ripley_k_grid",
    f"""
    WITH pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS px,
             CAST(embedding[2] AS DOUBLE) AS py
      FROM embeddings),
    np AS (SELECT CAST(count(*) AS BIGINT) AS np FROM pts),
    pairs AS (
      SELECT (a.px - b.px) * (a.px - b.px)
               + (a.py - b.py) * (a.py - b.py) AS d2, n.np
      FROM pts a JOIN pts b ON a.vec_id <> b.vec_id CROSS JOIN np n)
    SELECT CAST(max(np) AS BIGINT) AS n_points, {_K_COLS_SQL}
    FROM pairs
    """,
    tags=("spatial", "point-pattern"),
)
def q_ripley_k_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K and the variance-stabilized L(r) - r over the raw
    embedding-plane points (dims 1-2) in the declared window
    [-0.5, 0.5]^2 (area 1, no edge correction -- border bias is the
    documented naive-estimator tradeoff): K(r) = sum 1[d_ij <= r]
    / (n (n-1)) over ordered pairs. L - r > 0 flags clustering beyond
    CSR at that scale. Exact all-pairs estimator (n <= 2000 here, the
    ann_cosine_topk broadcast-NL precedent); the grid-bucketed
    neighbor join is the 100 TB path."""
    pts = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("px"),
        F.element_at("embedding", 2).cast("double").alias("py"),
    )
    np_ = pts.agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    a = pts.alias("a")
    b = pts.select(
        F.col("vec_id").alias("bid"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("a.vec_id") != F.col("bid"))
        .crossJoin(F.broadcast(np_))
        .select(
            (
                (F.col("px") - F.col("bx")) * (F.col("px") - F.col("bx"))
                + (F.col("py") - F.col("by")) * (F.col("py") - F.col("by"))
            ).alias("d2"),
            "np",
        )
    )
    aggs = [F.max("np").cast("bigint").alias("n_points")]
    for r in _RADII:
        cnt = F.sum(
            F.when(F.col("d2") <= F.lit(r * r).cast("double"), 1).otherwise(0)
        ).cast("double")
        den = F.max("np").cast("double") * (F.max("np") - 1)
        aggs.append(F.round(cnt / den, 6).alias(f"k_{int(r * 100):03d}"))
        aggs.append(
            (
                F.round(
                    F.sqrt(cnt / den / F.lit(3.141592653589793)) - r, 6
                )
                + F.lit(0.0)
            ).alias(f"l_minus_r_{int(r * 100):03d}")
        )
    return pairs.agg(*aggs)


@register(
    "knox_spacetime",
    f"""
    WITH busiest AS (
      SELECT CAST(ts AS DATE) AS day FROM events
      GROUP BY 1 ORDER BY count(*) DESC, day LIMIT 1),
    ev AS (
      SELECT event_id, epoch_us(ts) AS us,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS px,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8))::BIGINT
               / 4294967296.0 AS py
      FROM events JOIN busiest ON CAST(ts AS DATE) = busiest.day
      ORDER BY event_id LIMIT {_KNOX_CAP}),
    pairs AS (
      SELECT CASE WHEN (a.px - b.px) * (a.px - b.px)
                      + (a.py - b.py) * (a.py - b.py)
                      <= CAST({_KNOX_DELTA2!r} AS DOUBLE)
                  THEN 1 ELSE 0 END AS cs,
             CASE WHEN abs(a.us - b.us) <= {_KNOX_TAU_US}
                  THEN 1 ELSE 0 END AS ct
      FROM ev a JOIN ev b ON a.event_id < b.event_id),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS p,
             CAST(sum(cs) AS BIGINT) AS s,
             CAST(sum(ct) AS BIGINT) AS t,
             CAST(sum(cs * ct) AS BIGINT) AS x
      FROM pairs)
    SELECT p AS n_pairs, s AS n_close_space, t AS n_close_time,
           x AS knox_x,
           round(CAST(s AS DOUBLE) * t / p, 6) AS expected_x,
           round((x - CAST(s AS DOUBLE) * t / p)
                 / sqrt(CAST(s AS DOUBLE) * t / p), 4) + 0.0 AS poisson_z
    FROM agg
    """,
    tags=("spatial", "spacetime", "fraud"),
)
def q_knox_spacetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox test for space-time interaction on the busiest day's first
    1000 events: each user gets a deterministic md5-plane home position
    (first/second 8 hex chars of md5(user_id) scaled to [0, 1)), and a
    pair is 'close' within 0.1 plane units and/or 30 minutes. Under no
    interaction X ~ Poisson(S*T/P); a large z means bursts cluster in
    space AND time together -- the classic epidemic / coordinated-fraud
    signature. All counts exact integers over the capped pair set."""
    events = read_table(spark, sf_dir, "events")
    busiest = (
        events.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "day")
        .limit(1)
        .select("day")
    )
    ev = (
        events.join(
            F.broadcast(busiest),
            events["ts"].cast("date") == F.col("day"),
        )
        .select(
            "event_id",
            F.unix_micros("ts").alias("us"),
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint")
                / 4294967296.0
            ).alias("px"),
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 9, 8), 16, 10)
                .cast("bigint")
                / 4294967296.0
            ).alias("py"),
        )
        .orderBy("event_id")
        .limit(_KNOX_CAP)
    )
    a = ev.alias("a")
    b = ev.select(
        F.col("event_id").alias("bid"),
        F.col("us").alias("bus"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
    )
    pairs = a.join(F.broadcast(b), F.col("a.event_id") < F.col("bid")).select(
        F.when(
            (F.col("px") - F.col("bx")) * (F.col("px") - F.col("bx"))
            + (F.col("py") - F.col("by")) * (F.col("py") - F.col("by"))
            <= F.lit(_KNOX_DELTA2).cast("double"),
            1,
        )
        .otherwise(0)
        .alias("cs"),
        F.when(
            F.abs(F.col("us") - F.col("bus")) <= F.lit(_KNOX_TAU_US), 1
        )
        .otherwise(0)
        .alias("ct"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("p"),
        F.sum("cs").cast("bigint").alias("s"),
        F.sum("ct").cast("bigint").alias("t"),
        F.sum(F.col("cs") * F.col("ct")).cast("bigint").alias("x"),
    )
    e = F.col("s").cast("double") * F.col("t") / F.col("p")
    return agg.select(
        F.col("p").alias("n_pairs"),
        F.col("s").alias("n_close_space"),
        F.col("t").alias("n_close_time"),
        F.col("x").alias("knox_x"),
        F.round(e, 6).alias("expected_x"),
        (F.round((F.col("x") - e) / F.sqrt(e), 4) + F.lit(0.0)).alias(
            "poisson_z"
        ),
    )
