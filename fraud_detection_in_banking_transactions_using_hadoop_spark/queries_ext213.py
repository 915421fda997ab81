"""Extension batch 213 (round 9): incremental IVF index maintenance --
the ANN counterpart of ext198's incremental MinHash dedup (r8 verdict
item 4).

A production vector index ingests snapshots; refitting the coarse
quantizer and re-assigning the whole corpus per ingest is the 100 TB
anti-pattern. The incremental contract:

  state   = the frozen quantizer (8 centroids, versioned) + the
            persisted cell assignment of the previous snapshot;
  delta   = assign ONLY the new vectors against the FROZEN centroids
            (one Arrow pass over |delta| rows) and union with state;
  drift   = total-variation distance between the state's and the
            delta's cell-population distributions, computed from EXACT
            integer cross-products (sum |n_delta*N - n_old*D|, one
            division at the end -- no float sum-order exposure); a
            drift past the 0.25 threshold flags a refit.

The DuckDB oracle is the FULL RE-ASSIGNMENT of every vector against
the same frozen quantizer (refit from the old snapshot by the shared
deterministic numpy path, centroid literals inlined) -- the hash gate
IS the incremental==full-rebuild equivalence proof, exactly the ext198
precedent. tests/test_ext213_invariants.py adds the delta-cost
contract (the incremental pass touches |delta| rows only) and drift
bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_N_CELLS = 8
_DIM = 64
_DRIFT_THRESHOLD = 0.25


def _chain(a: str, b: str) -> str:
    return "0.0 + " + " + ".join(
        f"({a}[{t}]-{b}[{t}])*({a}[{t}]-{b}[{t}])" for t in range(1, _DIM + 1)
    )


def _incremental_ivf_sql(sf_dir: str) -> str:
    """Oracle generator: refit the snapshot-1 quantizer with the SAME
    deterministic code path (md5-bucket sample of old rows + seeded
    driver Lloyd), inline the centroids, and re-assign EVERYTHING from
    scratch -- the full rebuild the incremental path must equal."""
    import hashlib

    import duckdb
    import numpy as np

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        fit_ivf_quantizer,
        ivf_train_bucket_count,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') "
        "WHERE vec_id % 10 < 8 ORDER BY vec_id"
    ).fetchall()
    con.close()
    nb = ivf_train_bucket_count(len(rows), _N_CELLS, 256)
    if nb is not None:
        rows = [
            r
            for r in rows
            if int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16) % nb
            == 0
        ]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    C = fit_ivf_quantizer(X, _N_CELLS)
    cent_vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in C[i])}]::DOUBLE[])"
        for i in range(len(C))
    )
    return f"""
    WITH cents AS (SELECT * FROM (VALUES {cent_vals}) AS t(cell, c)),
    base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ad AS (
      SELECT vec_id, cell, {_chain('v', 'c')} AS d2
      FROM base CROSS JOIN cents),
    asg AS (
      SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS ar
      FROM ad),
    tagged AS (
      SELECT cell,
             CASE WHEN vec_id % 10 < 8 THEN 1 ELSE 0 END AS is_old
      FROM asg WHERE ar = 1),
    counts AS (
      SELECT cell, CAST(sum(is_old) AS BIGINT) AS n_old,
             CAST(sum(1 - is_old) AS BIGINT) AS n_delta
      FROM tagged GROUP BY cell),
    spine AS (SELECT unnest(range(0, {_N_CELLS})) AS cell),
    filled AS (
      SELECT CAST(s.cell AS INTEGER) AS cell,
             coalesce(c.n_old, 0) AS n_old,
             coalesce(c.n_delta, 0) AS n_delta
      FROM spine s LEFT JOIN counts c ON c.cell = s.cell),
    tot AS (
      SELECT CAST(sum(n_old) AS BIGINT) AS nn,
             CAST(sum(n_delta) AS BIGINT) AS dd
      FROM filled),
    sv AS (
      SELECT CAST(sum(abs(f.n_delta * t.nn - f.n_old * t.dd)) AS BIGINT)
               AS s
      FROM filled f CROSS JOIN tot t)
    SELECT f.cell, f.n_old, f.n_delta,
           f.n_old + f.n_delta AS n_total,
           round(CAST(sv.s AS DOUBLE) / (2.0 * t.nn * t.dd), 6)
             AS drift_tv,
           CAST(CAST(sv.s AS DOUBLE) / (2.0 * t.nn * t.dd)
                > {_DRIFT_THRESHOLD} AS INTEGER) AS refit_triggered
    FROM filled f CROSS JOIN tot t CROSS JOIN sv
    """


@register(
    "incremental_ivf_update",
    _incremental_ivf_sql,
    tags=("similarity", "ann", "ivf", "incremental"),
)
def q_incremental_ivf_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot incremental IVF maintenance: snapshot 1 (80% of
    vectors) trains the quantizer and persists its cell assignment;
    snapshot 2's delta is assigned with the FROZEN centroids (delta
    rows only touch the Arrow pass) and unioned in. Output = per-cell
    index population split old/delta plus the exact-integer TV drift
    and the refit flag. The oracle recomputes everything from scratch
    with the same frozen quantizer -- hash equality proves
    incremental == full rebuild."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_train_centroids,
    )

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)

    # --- snapshot-1 state build (frozen quantizer + persisted index;
    # localCheckpoint stands in for the state parquet) ---
    C = ivf_train_centroids(old, "vec_id", "v", n_cells=_N_CELLS)
    state = (
        ivf_assign_cells(old, C.tolist(), "v")
        .select("vec_id", "_cell")
        .localCheckpoint(eager=True)
    )

    # --- the incremental step: ONLY delta rows are assigned ---
    delta_asg = ivf_assign_cells(delta, C.tolist(), "v").select(
        "vec_id", "_cell"
    )

    spine = spark.createDataFrame(
        [(i,) for i in range(_N_CELLS)], "cell int"
    )
    oc = state.groupBy(F.col("_cell").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_old")
    )
    dc = delta_asg.groupBy(F.col("_cell").alias("cell")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_delta")
    )
    filled = (
        spine.join(oc, "cell", "left")
        .join(dc, "cell", "left")
        .select(
            "cell",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_delta", F.lit(0)).cast("bigint").alias("n_delta"),
        )
    )
    tot = filled.agg(
        F.sum("n_old").cast("bigint").alias("nn"),
        F.sum("n_delta").cast("bigint").alias("dd"),
    )
    sv = (
        filled.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("n_delta") * F.col("nn")
                    - F.col("n_old") * F.col("dd")
                )
            )
            .cast("bigint")
            .alias("s")
        )
    )
    drift = F.col("s").cast("double") / (
        2.0 * F.col("nn") * F.col("dd")
    )
    return (
        filled.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(sv))
        .select(
            "cell",
            "n_old",
            "n_delta",
            (F.col("n_old") + F.col("n_delta")).alias("n_total"),
            F.round(drift, 6).alias("drift_tv"),
            (drift > _DRIFT_THRESHOLD).cast("int").alias("refit_triggered"),
        )
    )
