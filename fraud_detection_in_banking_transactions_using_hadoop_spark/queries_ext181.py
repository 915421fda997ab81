"""Extension batch 181 (round 6): internal cluster-validity indices
over the labeled embeddings -- the ARI / Fowlkes-Mallows agreement
metrics already shipped judge a clustering AGAINST a reference; these
three judge it from the geometry alone: the simplified (centroid)
silhouette per label, the Calinski-Harabasz variance-ratio criterion,
and the Davies-Bouldin index with its worst (most confusable) label
pair.

Cross-engine discipline: every embedding component is quantized ONCE
to the e6 integer grid (floor(x*1e6 + 0.5)); all centroid geometry
then stays EXACT -- a point-to-centroid squared distance is the
integer sum_d (n_j*x_d - s_jd)^2 over the per-label dimension sums
s_jd, and a centroid-to-centroid distance the integer
sum_d (n_k*s_jd - n_j*s_kd)^2 -- divided by the right integer
denominators only at the very end. The only floating op is sqrt,
which IEEE requires correctly rounded (unlike libm ln/trig), so both
engines produce bit-identical doubles; per-row/per-label doubles are
e9-requantized before any cross-row sum (float-sum order rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_DEC = "decimal(38,0)"

# shared CTE text: e6-quantized long form + per-label dimension sums
_GRID_SQL = """
    pt AS (
      SELECT vec_id, label, i AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
                  AS BIGINT) AS xq
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx),
    cen AS (
      SELECT label AS clabel, pos,
             CAST(sum(xq) AS HUGEINT) AS s,
             CAST(count(*) AS BIGINT) AS nj
      FROM pt GROUP BY label, pos)
"""


def _grid(spark: SparkSession, sf_dir: str):
    emb = read_table(spark, sf_dir, "embeddings")
    pt = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos0", "x"
        ),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.floor(F.col("x") * 1e6 + 0.5).cast("bigint").alias("xq"),
    )
    cen = pt.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.sum("xq").cast(_DEC).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("nj"),
    )
    return pt, cen


@register(
    "simplified_silhouette",
    f"""
    WITH {_GRID_SQL},
    d2 AS (
      SELECT p.vec_id, p.label, c.clabel, max(c.nj) AS nj,
             CAST(sum(CAST(c.nj * p.xq - c.s AS HUGEINT)
                      * (c.nj * p.xq - c.s)) AS HUGEINT) AS ss
      FROM pt p JOIN cen c ON c.pos = p.pos
      GROUP BY p.vec_id, p.label, c.clabel),
    ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label
                 THEN sqrt(CAST(ss AS DOUBLE)) / nj END) AS a,
             min(CASE WHEN clabel <> label
                 THEN sqrt(CAST(ss AS DOUBLE)) / nj END) AS b
      FROM d2 GROUP BY vec_id, label),
    sil AS (
      SELECT label,
             CAST(floor(CASE WHEN greatest(a, b) > 0.0
                             THEN (b - a) / greatest(a, b)
                             ELSE 0.0 END * 1e9 + 0.5) AS BIGINT) AS s_e9
      FROM ab)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(s_e9) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * 1e9), 6) + 0.0
             AS mean_silhouette
    FROM sil GROUP BY label ORDER BY label
    """,
    tags=("embedding", "clustering", "validity"),
)
def q_simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette per embedding label: for each
    vector, a = distance to its own label centroid, b = distance to
    the nearest OTHER centroid, s = (b - a)/max(a, b) -- near +1 the
    label is compact and isolated, near 0 it touches a neighbor,
    negative its points sit closer to another centroid. Distances are
    exact integers on the e6 grid (sum_d (n_j x_d - s_jd)^2, divided
    by n_j only under the IEEE-exact sqrt); per-point silhouettes are
    e9-requantized before the label mean so float-sum order cannot
    split the engines."""
    pt, cen = _grid(spark, sf_dir)
    d2 = (
        pt.join(cen, on="pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.max("nj").alias("nj"),
            F.sum(
                (F.col("nj") * F.col("xq") - F.col("s")).cast(_DEC)
                * (F.col("nj") * F.col("xq") - F.col("s"))
            )
            .cast(_DEC)
            .alias("ss"),
        )
    )
    dist = F.sqrt(F.col("ss").cast("double")) / F.col("nj")
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), dist)
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), dist)
        ).alias("b"),
    )
    s = F.when(
        F.greatest("a", "b") > 0.0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(0.0)
    sil = ab.select(
        "label",
        F.floor(s * 1e9 + 0.5).cast("bigint").alias("s_e9"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            (
                F.round(
                    F.sum("s_e9").cast("double")
                    / (F.count(F.lit(1)).cast("double") * 1e9),
                    6,
                )
                + F.lit(0.0)
            ).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


@register(
    "calinski_harabasz",
    f"""
    WITH {_GRID_SQL},
    tot AS (
      SELECT pos, CAST(sum(s) AS HUGEINT) AS sd,
             CAST(sum(nj) AS BIGINT) AS n
      FROM cen GROUP BY pos),
    bssj AS (
      -- per-label between term: sum_d (n*s_jd - n_j*S_d)^2 / (n_j n^2)
      SELECT c.clabel, max(c.nj) AS nj, max(t.n) AS n,
             CAST(floor(CAST(sum(CAST(t.n * c.s - c.nj * t.sd AS HUGEINT)
                                 * (t.n * c.s - c.nj * t.sd))
                             AS DOUBLE)
                        / (CAST(max(c.nj) AS DOUBLE)
                           * max(t.n) * max(t.n)) + 0.5)
                  AS BIGINT) AS bss_g
      FROM cen c JOIN tot t ON t.pos = c.pos
      GROUP BY c.clabel),
    wssj AS (
      SELECT p.label,
             CAST(sum(CAST(c.nj * p.xq - c.s AS HUGEINT)
                      * (c.nj * p.xq - c.s)) AS HUGEINT) AS num,
             max(c.nj) AS nj
      FROM pt p JOIN cen c
        ON c.pos = p.pos AND c.clabel = p.label
      GROUP BY p.label),
    agg AS (
      SELECT (SELECT CAST(sum(bss_g) AS BIGINT) FROM bssj) AS bss,
             (SELECT CAST(sum(CAST(floor(CAST(num AS DOUBLE)
                                         / (CAST(nj AS DOUBLE) * nj) + 0.5)
                                   AS BIGINT)) AS BIGINT)
              FROM wssj) AS wss,
             (SELECT CAST(count(*) AS BIGINT) FROM bssj) AS k,
             (SELECT max(n) FROM bssj) AS n)
    SELECT n AS n_vecs, k AS n_labels,
           round(bss / 1e12, 6) AS bss_val,
           round(wss / 1e12, 6) AS wss_val,
           round((CAST(bss AS DOUBLE) / (k - 1))
                 / (CAST(wss AS DOUBLE) / (n - k)), 6) AS ch_index
    FROM agg
    """,
    tags=("embedding", "clustering", "validity"),
)
def q_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio criterion of the embedding
    labels: CH = (BSS/(k-1)) / (WSS/(n-k)) -- between-centroid
    dispersion per degree of freedom over within-label dispersion per
    degree of freedom; higher = tighter, better-separated clusters.
    Both dispersions reduce to exact integer quadratic forms on the
    e6 grid (BSS_j = sum_d (n s_jd - n_j S_d)^2 / (n_j n^2), WSS_j =
    sum_x sum_d (n_j x_d - s_jd)^2 / n_j^2); each per-label term is
    floor-requantized to a grid-unit integer before the cross-label
    sum, so only deterministic int->double conversions cross rows."""
    pt, cen = _grid(spark, sf_dir)
    tot = cen.groupBy("pos").agg(
        F.sum("s").cast(_DEC).alias("sd"),
        F.sum("nj").cast("bigint").alias("n"),
    )
    bt = (F.col("n") * F.col("s") - F.col("nj") * F.col("sd")).cast(_DEC)
    bssj = (
        cen.join(tot, on="pos")
        .groupBy("clabel")
        .agg(
            F.max("nj").alias("nj"),
            F.max("n").alias("n"),
            F.sum(bt * bt).cast(_DEC).alias("num"),
        )
        .select(
            "clabel",
            "nj",
            "n",
            F.floor(
                F.col("num").cast("double")
                / (
                    F.col("nj").cast("double")
                    * F.col("n")
                    * F.col("n")
                )
                + 0.5
            )
            .cast("bigint")
            .alias("bss_g"),
        )
    )
    wt = (F.col("nj") * F.col("xq") - F.col("s")).cast(_DEC)
    wssj = (
        pt.join(cen, on="pos")
        .where(F.col("clabel") == F.col("label"))
        .groupBy("label")
        .agg(
            F.sum(wt * wt).cast(_DEC).alias("num"),
            F.max("nj").alias("nj"),
        )
        .select(
            F.floor(
                F.col("num").cast("double")
                / (F.col("nj").cast("double") * F.col("nj"))
                + 0.5
            )
            .cast("bigint")
            .alias("wss_g")
        )
    )
    b = bssj.agg(
        F.sum("bss_g").cast("bigint").alias("bss"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("n").alias("n"),
    )
    w = wssj.agg(F.sum("wss_g").cast("bigint").alias("wss"))
    agg = b.crossJoin(F.broadcast(w))
    return agg.select(
        F.col("n").alias("n_vecs"),
        F.col("k").alias("n_labels"),
        F.round(F.col("bss") / 1e12, 6).alias("bss_val"),
        F.round(F.col("wss") / 1e12, 6).alias("wss_val"),
        F.round(
            (F.col("bss").cast("double") / (F.col("k") - 1))
            / (F.col("wss").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("ch_index"),
    )


@register(
    "davies_bouldin",
    f"""
    WITH {_GRID_SQL},
    own AS (
      -- per-point distance to own centroid, grid-unit integer
      SELECT p.vec_id, p.label, max(c.nj) AS nj,
             CAST(floor(sqrt(CAST(sum(CAST(c.nj * p.xq - c.s AS HUGEINT)
                                       * (c.nj * p.xq - c.s))
                                  AS DOUBLE)) + 0.5) AS BIGINT) AS dq
      FROM pt p JOIN cen c
        ON c.pos = p.pos AND c.clabel = p.label
      GROUP BY p.vec_id, p.label),
    sj AS (
      SELECT label, max(nj) AS nj,
             CAST(sum(dq) AS HUGEINT) AS dsum
      FROM own GROUP BY label),
    cd AS (
      -- centroid-centroid distances: exact integer quadratic form
      SELECT a.clabel AS la, b.clabel AS lb, max(a.nj) AS na,
             max(b.nj) AS nb,
             CAST(sum(CAST(b.nj * a.s - a.nj * b.s AS HUGEINT)
                      * (b.nj * a.s - a.nj * b.s)) AS HUGEINT) AS cc
      FROM cen a JOIN cen b ON a.pos = b.pos AND a.clabel <> b.clabel
      GROUP BY a.clabel, b.clabel),
    r AS (
      SELECT cd.la, cd.lb,
             (CAST(s1.dsum AS DOUBLE) / (CAST(s1.nj AS DOUBLE) * s1.nj)
              + CAST(s2.dsum AS DOUBLE) / (CAST(s2.nj AS DOUBLE) * s2.nj))
               / (sqrt(CAST(cd.cc AS DOUBLE))
                  / (CAST(cd.na AS DOUBLE) * cd.nb)) AS rv
      FROM cd JOIN sj s1 ON s1.label = cd.la
              JOIN sj s2 ON s2.label = cd.lb),
    rmax AS (
      SELECT la, CAST(floor(max(rv) * 1e9 + 0.5) AS BIGINT) AS r_e9
      FROM r GROUP BY la),
    worst AS (
      SELECT la, lb, rv FROM r ORDER BY rv DESC, la, lb LIMIT 1)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM rmax) AS n_labels,
           round(CAST((SELECT sum(r_e9) FROM rmax) AS DOUBLE)
                 / (CAST((SELECT count(*) FROM rmax) AS DOUBLE) * 1e9),
                 6) AS db_index,
           w.la AS worst_label, w.lb AS worst_neighbor,
           round(w.rv, 6) AS worst_ratio
    FROM worst w
    """,
    tags=("embedding", "clustering", "validity"),
)
def q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin index of the embedding labels: for each label
    the worst ratio R_jk = (s_j + s_k)/d(c_j, c_k) of summed
    within-label scatter to centroid separation, averaged over
    labels; LOWER is better, and the argmax pair printed beside it is
    the most confusable label pair (the one a classifier would mix up
    first). Scatters are means of per-point IEEE-exact sqrt distances
    floor-requantized to grid integers; centroid separations are
    exact integer quadratic forms sum_d (n_k s_jd - n_j s_kd)^2; the
    10 per-label maxima e9-requantize before the final mean."""
    pt, cen = _grid(spark, sf_dir)
    own = (
        pt.join(cen, on="pos")
        .where(F.col("clabel") == F.col("label"))
        .groupBy("vec_id", "label")
        .agg(
            F.max("nj").alias("nj"),
            F.floor(
                F.sqrt(
                    F.sum(
                        (F.col("nj") * F.col("xq") - F.col("s")).cast(
                            _DEC
                        )
                        * (F.col("nj") * F.col("xq") - F.col("s"))
                    ).cast("double")
                )
                + 0.5
            )
            .cast("bigint")
            .alias("dq"),
        )
    )
    sj = own.groupBy("label").agg(
        F.max("nj").alias("nj"),
        F.sum("dq").cast(_DEC).alias("dsum"),
    )
    a = cen.select(
        F.col("clabel").alias("la"),
        F.col("pos").alias("pa"),
        F.col("s").alias("sa"),
        F.col("nj").alias("na"),
    )
    bfr = cen.select(
        F.col("clabel").alias("lb"),
        F.col("pos").alias("pb"),
        F.col("s").alias("sb"),
        F.col("nj").alias("nb"),
    )
    ct = (F.col("nb") * F.col("sa") - F.col("na") * F.col("sb")).cast(
        _DEC
    )
    cd = (
        a.join(
            bfr,
            on=[
                F.col("pa") == F.col("pb"),
                F.col("la") != F.col("lb"),
            ],
        )
        .groupBy("la", "lb")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.sum(ct * ct).cast(_DEC).alias("cc"),
        )
    )
    s1 = sj.select(
        F.col("label").alias("la"),
        F.col("nj").alias("nj1"),
        F.col("dsum").alias("d1"),
    )
    s2 = sj.select(
        F.col("label").alias("lb"),
        F.col("nj").alias("nj2"),
        F.col("dsum").alias("d2"),
    )
    r = (
        cd.join(s1, on="la")
        .join(s2, on="lb")
        .select(
            "la",
            "lb",
            (
                (
                    F.col("d1").cast("double")
                    / (F.col("nj1").cast("double") * F.col("nj1"))
                    + F.col("d2").cast("double")
                    / (F.col("nj2").cast("double") * F.col("nj2"))
                )
                / (
                    F.sqrt(F.col("cc").cast("double"))
                    / (F.col("na").cast("double") * F.col("nb"))
                )
            ).alias("rv"),
        )
    )
    rmax = r.groupBy("la").agg(
        F.floor(F.max("rv") * 1e9 + 0.5).cast("bigint").alias("r_e9")
    )
    summ = rmax.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.round(
            F.sum("r_e9").cast("double")
            / (F.count(F.lit(1)).cast("double") * 1e9),
            6,
        ).alias("db_index"),
    )
    worst = (
        r.orderBy(F.col("rv").desc(), "la", "lb")
        .limit(1)
        .select(
            F.col("la").alias("worst_label"),
            F.col("lb").alias("worst_neighbor"),
            F.round(F.col("rv"), 6).alias("worst_ratio"),
        )
    )
    return summ.crossJoin(F.broadcast(worst)).select(
        "n_labels",
        "db_index",
        "worst_label",
        "worst_neighbor",
        "worst_ratio",
    )
