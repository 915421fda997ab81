"""Extension batch 223 (round 10): the density-growth semivariogram
twin -- the one `weak` in the r9 verdict.

- semivariogram_moments: near-field (bins 0..2, lag < 0.6) directional
  semivariogram computed from PER-CELL MOMENTS ONLY -- no pair
  enumeration anywhere. For cells a, b with n/s1=sum(z)/s2=sum(z^2),
  the cross-cell squared-difference sum factors exactly:
      sum_{i in a, j in b} (z_i - z_j)^2
        = n_b*s2_a + n_a*s2_b - 2*s1_a*s1_b
  and within-cell: n*s2 - s1^2 (unordered). Pairs are BINNED BY
  CELL-CENTER DISTANCE (h * sqrt(dx^2 + dy^2), cells of h = 0.05), a
  deviation from the exact per-pair binning whose discretization bound
  -- a pair's true distance differs from its cell-center distance by at
  most h*sqrt(2) ~ 0.0707, 35% of the 0.2 bin width -- is emitted as
  the `max_center_err` column (the ext214 realized-error pattern).
  Exact integer arithmetic end-to-end (z e6-quantized, moment products
  in DECIMAL(38,0)/HUGEINT, ONE double division at the end), so every
  row hash-oracles.

  Scale analysis: work = one O(n) moment pass + a cell-offset join over
  OCCUPIED CELLS x 625 canonical offsets. Occupied cells are bounded by
  min(n, (extent/h)^2) -- under density growth on a fixed extent the
  join cost SATURATES at the grid size (~324 cells here), so the
  0.01->0.1 slope collapses (measured in README's slope table) while
  the exact baseline's stays ~0.73. This is the missing density-growth
  path for semivariogram_grid (r9 verdict item 5); that query's
  domain-growth near field and constant-work far sample are unchanged.

Reference: beyond-reference LLM-pipeline tier (Cressie's classical
estimator, moment factorization is standard algebra). Scale table in
COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext212 import _SV_PTS_SQL
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_SVM_CELL = 0.05  # moment-grid cell size h
_SVM_R = 12  # offset radius: 0.6 / h
_SVM_BIN_Q = 200_000_000  # lag-bin width, e9 units (shared with ext212)
_SVM_NEAR_Q = 600_000_000  # bins 0..2


def _svm_sqd_cross(cast: str) -> str:
    """Cross-cell moment factorization in wide integers; `cast` =
    DECIMAL(38,0) on Spark, HUGEINT on DuckDB (the probit r8 gotcha)."""
    return (
        f"(CAST(bn AS {cast}) * CAST(a_s2 AS {cast})"
        f" + CAST(an AS {cast}) * CAST(b_s2 AS {cast})"
        f" - 2 * CAST(a_s1 AS {cast}) * CAST(b_s1 AS {cast}))"
    )


def _svm_sqd_within(cast: str) -> str:
    return (
        f"(CAST(n AS {cast}) * CAST(s2 AS {cast})"
        f" - CAST(s1 AS {cast}) * CAST(s1 AS {cast}))"
    )


# center-distance quantization shared by both engines; verified (625
# fixed offsets) never to land on a .5 boundary, so Spark's BigDecimal
# HALF_UP and DuckDB's nearbyint agree on every value.
_SVM_DCQ = (
    "CAST(round(1.0e9 * CAST({h} AS DOUBLE)"
    " * sqrt(CAST(dx * dx + dy * dy AS DOUBLE)), 0) AS BIGINT)"
)


@register(
    "semivariogram_moments",
    f"""
    WITH {_SV_PTS_SQL},
    cells AS (
      SELECT CAST(floor(px / {_SVM_CELL}) AS BIGINT) AS cx,
             CAST(floor(py / {_SVM_CELL}) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(z) AS BIGINT) AS s1,
             CAST(sum(z * z) AS BIGINT) AS s2
      FROM pts GROUP BY 1, 2),
    offs AS (
      SELECT dx, dy, {_SVM_DCQ.format(h=_SVM_CELL)} AS dcq
      FROM (SELECT unnest(range(-{_SVM_R}, {_SVM_R + 1})) AS dx),
           (SELECT unnest(range(-{_SVM_R}, {_SVM_R + 1})) AS dy)
      WHERE dx > 0 OR (dx = 0 AND dy > 0)),
    cross_pairs AS (
      SELECT dcq,
             CASE WHEN abs(dx) >= abs(dy) THEN 'EW' ELSE 'NS' END
               AS direction,
             an * bn AS np,
             {_svm_sqd_cross('HUGEINT')} AS sqd
      FROM (
        SELECT o.dcq, o.dx, o.dy,
               a.n AS an, a.s1 AS a_s1, a.s2 AS a_s2,
               b.n AS bn, b.s1 AS b_s1, b.s2 AS b_s2
        FROM cells a
        JOIN offs o ON o.dcq < {_SVM_NEAR_Q}
        JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy)),
    within AS (
      SELECT CAST(0 AS BIGINT) AS dcq, 'EW' AS direction,
             n * (n - 1) // 2 AS np,
             {_svm_sqd_within('HUGEINT')} AS sqd
      FROM cells WHERE n > 1)
    SELECT 'moment' AS basis, direction,
           dcq // {_SVM_BIN_Q} AS bin,
           round((dcq // {_SVM_BIN_Q}) * 0.2, 1) AS lag_lo,
           CAST(sum(np) AS BIGINT) AS n_pairs,
           -- gamma as an exact-integer HALF-UP division (r10 advice):
           -- round_half_up(S / (2e6 P)) = (2S + 2e6 P) // (4e6 P),
           -- never a float round() at a 6-dp half boundary
           CAST((2 * CAST(sum(sqd) AS HUGEINT)
                 + 2000000 * CAST(sum(np) AS HUGEINT))
                // (4000000 * CAST(sum(np) AS HUGEINT)) AS DOUBLE)
             / 1e6 AS gamma,
           round(CAST({_SVM_CELL} AS DOUBLE) * sqrt(2.0), 6)
             AS max_center_err
    FROM (SELECT * FROM cross_pairs UNION ALL SELECT * FROM within)
    GROUP BY direction, dcq // {_SVM_BIN_Q}
    """,
    tags=("spatial", "geostatistics", "scale-path", "exact-arith"),
)
def q_semivariogram_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment-factored near-field semivariogram: per-cell (n, sum z,
    sum z^2) only -- the density-growth scale path (see module
    docstring). Offsets expand via two generator explodes (no join, no
    cartesian); the cell-pair probe is a broadcast equi-join on the
    offset cell id; all sums are exact integers until the final
    division."""
    h = _SVM_CELL
    emb = read_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("embedding")[0].cast("double").alias("px"),
        F.col("embedding")[1].cast("double").alias("py"),
        F.expr(
            "CAST(round(1000000.0 * CAST(element_at(embedding, 3)"
            " AS DOUBLE), 0) AS BIGINT)"
        ).alias("z"),
    )
    cells = (
        pts.groupBy(
            F.floor(F.col("px") / h).cast("bigint").alias("cx"),
            F.floor(F.col("py") / h).cast("bigint").alias("cy"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("z").cast("bigint").alias("s1"),
            F.sum(F.expr("z * z")).cast("bigint").alias("s2"),
        )
        .localCheckpoint(eager=True)
    )
    probe = (
        cells.select(
            F.col("n").alias("an"),
            F.col("s1").alias("a_s1"),
            F.col("s2").alias("a_s2"),
            "cx",
            "cy",
            F.expr(f"explode(sequence(-{_SVM_R}, {_SVM_R}))").alias("dx"),
        )
        .select(
            "*", F.expr(f"explode(sequence(-{_SVM_R}, {_SVM_R}))").alias("dy")
        )
        .where("dx > 0 OR (dx = 0 AND dy > 0)")
        .withColumn("dcq", F.expr(_SVM_DCQ.format(h=h)))
        .where(F.col("dcq") < _SVM_NEAR_Q)
        .withColumns(
            {
                "pcx": F.expr("cx + dx"),
                "pcy": F.expr("cy + dy"),
            }
        )
    )
    build = cells.select(
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
        F.col("n").alias("bn"),
        F.col("s1").alias("b_s1"),
        F.col("s2").alias("b_s2"),
    )
    cross = probe.join(F.broadcast(build), ["pcx", "pcy"]).select(
        "dcq",
        F.expr(
            "CASE WHEN abs(dx) >= abs(dy) THEN 'EW' ELSE 'NS' END"
        ).alias("direction"),
        F.expr("an * bn").alias("np"),
        F.expr(_svm_sqd_cross("DECIMAL(38,0)")).alias("sqd"),
    )
    within = cells.where("n > 1").select(
        F.lit(0).cast("bigint").alias("dcq"),
        F.lit("EW").alias("direction"),
        F.expr("n * (n - 1) DIV 2").alias("np"),
        F.expr(_svm_sqd_within("DECIMAL(38,0)")).alias("sqd"),
    )
    return (
        cross.unionByName(within)
        .withColumn("bin", F.expr(f"dcq DIV {_SVM_BIN_Q}"))
        .groupBy("direction", "bin")
        .agg(
            F.round(F.col("bin") * 0.2, 1).alias("lag_lo"),
            F.sum("np").cast("bigint").alias("n_pairs"),
            # exact-integer half-up 6-dp gamma (r10 advice); DECIMAL
            # DIV returns LONG, quotient ~ gamma*1e6 -- far under 2^63
            F.expr(
                "CAST((2 * CAST(sum(sqd) AS DECIMAL(38,0))"
                " + 2000000 * CAST(sum(np) AS DECIMAL(38,0)))"
                " DIV (4000000 * CAST(sum(np) AS DECIMAL(38,0)))"
                " AS DOUBLE) / 1e6"
            ).alias("gamma"),
        )
        .select(
            F.lit("moment").alias("basis"),
            "direction",
            "bin",
            "lag_lo",
            "n_pairs",
            "gamma",
            F.expr(
                f"round(CAST({_SVM_CELL} AS DOUBLE) * sqrt(2.0), 6)"
            ).alias("max_center_err"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental hyperplane-LSH index maintenance (r9 verdict item 6):
# dedup (ext198) and IVF (ext213) have frozen-state delta paths; this
# closes the triad for the signature-bucket ANN index. The planes are
# deterministic md5-derived constants (operators/similarity._hyperplane)
# -- the "quantizer" needs no fitting, so the frozen state is simply the
# persisted (vec_id, bucket) table; the delta pass hashes ONLY the new
# vectors (one codegen projection over |delta| rows) and unions in.
# Output/oracle shape mirrors ext213 verbatim: per-bucket populations
# split old/delta, exact-integer TV drift, refit flag; the oracle
# re-signatures EVERYTHING from the same inlined plane literals -- hash
# equality proves incremental == full rebuild.
# ---------------------------------------------------------------------------
_LSH_PLANES = 6
_LSH_DIM = 64
_LSH_DRIFT_THRESHOLD = 0.25


def _incremental_lsh_sql() -> str:
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        _hyperplane,
    )

    planes = [_hyperplane(_LSH_DIM, p) for p in range(_LSH_PLANES)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {planes[p]!r}::DOUBLE[]) >= 0 "
        f"THEN {2 ** p} ELSE 0 END)"
        for p in range(_LSH_PLANES)
    )
    n_buckets = 2**_LSH_PLANES
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (
      SELECT vec_id, {bucket_terms} AS bucket,
             CASE WHEN vec_id % 10 < 8 THEN 1 ELSE 0 END AS is_old
      FROM base),
    counts AS (
      SELECT bucket, CAST(sum(is_old) AS BIGINT) AS n_old,
             CAST(sum(1 - is_old) AS BIGINT) AS n_delta
      FROM sig GROUP BY bucket),
    spine AS (SELECT unnest(range(0, {n_buckets})) AS bucket),
    filled AS (
      SELECT CAST(s.bucket AS INTEGER) AS bucket,
             coalesce(c.n_old, 0) AS n_old,
             coalesce(c.n_delta, 0) AS n_delta
      FROM spine s LEFT JOIN counts c ON c.bucket = s.bucket),
    tot AS (
      SELECT CAST(sum(n_old) AS BIGINT) AS nn,
             CAST(sum(n_delta) AS BIGINT) AS dd
      FROM filled),
    sv AS (
      SELECT CAST(sum(abs(f.n_delta * t.nn - f.n_old * t.dd)) AS BIGINT)
               AS s
      FROM filled f CROSS JOIN tot t)
    SELECT f.bucket, f.n_old, f.n_delta,
           f.n_old + f.n_delta AS n_total,
           round(CAST(sv.s AS DOUBLE) / (2.0 * t.nn * t.dd), 6)
             AS drift_tv,
           CAST(CAST(sv.s AS DOUBLE) / (2.0 * t.nn * t.dd)
                > {_LSH_DRIFT_THRESHOLD} AS INTEGER) AS refit_triggered
    FROM filled f CROSS JOIN tot t CROSS JOIN sv
    """


@register(
    "incremental_lsh_update",
    _incremental_lsh_sql(),
    tags=("similarity", "ann", "lsh", "incremental"),
)
def q_incremental_lsh_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot incremental LSH-index maintenance: snapshot 1 (80%
    of vectors) persists its (vec_id, bucket) signature table; snapshot
    2's delta is signatured with the SAME literal planes (delta rows
    only touch the projection) and unioned in. Output = per-bucket
    index population split old/delta plus the exact-integer TV drift
    and the refit flag; the oracle re-signatures everything from
    scratch -- hash equality proves incremental == full rebuild
    (ext198/ext213 precedent)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        signature_bucket,
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sig = signature_bucket("v", _LSH_DIM, _LSH_PLANES)
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)

    # --- snapshot-1 state (persisted signature table stand-in) ---
    state = old.select("vec_id", sig.alias("bucket")).localCheckpoint(
        eager=True
    )
    # --- the incremental step: ONLY delta rows are signatured ---
    delta_sig = delta.select("vec_id", sig.alias("bucket"))

    spine = spark.createDataFrame(
        [(i,) for i in range(2**_LSH_PLANES)], "bucket int"
    )
    oc = state.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_old")
    )
    dc = delta_sig.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_delta")
    )
    filled = (
        spine.join(oc, "bucket", "left")
        .join(dc, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_delta", F.lit(0)).cast("bigint").alias("n_delta"),
        )
    )
    tot = filled.agg(
        F.sum("n_old").cast("bigint").alias("nn"),
        F.sum("n_delta").cast("bigint").alias("dd"),
    )
    sv = filled.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.abs(
                F.col("n_delta") * F.col("nn") - F.col("n_old") * F.col("dd")
            )
        )
        .cast("bigint")
        .alias("s")
    )
    drift = F.col("s").cast("double") / (2.0 * F.col("nn") * F.col("dd"))
    return (
        filled.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sv))
        .select(
            "bucket",
            "n_old",
            "n_delta",
            (F.col("n_old") + F.col("n_delta")).alias("n_total"),
            F.round(drift, 6).alias("drift_tv"),
            (drift > _LSH_DRIFT_THRESHOLD).cast("int").alias(
                "refit_triggered"
            ),
        )
    )
