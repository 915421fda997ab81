"""Definition-level invariants for the ext212 grid-cell scale twins.

The twins claim EXACT reproduction of the brute-force estimators (LOF
entirely; the semivariogram's near field). These tests pin the claim
with both-path parity against the all-pairs baselines -- the class of
check the oracle cannot do (a shared-formulation bug in the twin AND
its oracle would stay green there).
"""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

_Q = {q.name: q.fn for q in registry()}


def test_lof_grid_equals_brute_force(spark, sf_dir):
    """The grid-tier kNN is provably exact, so the ten LOF rows must be
    BIT-IDENTICAL to the all-pairs baseline -- ids, order, scores."""
    grid = [tuple(r) for r in _Q["lof_grid_knn"](spark, sf_dir).collect()]
    brute = [
        tuple(r) for r in _Q["lof_embedding_plane"](spark, sf_dir).collect()
    ]
    assert grid == brute
    assert len(grid) == 10


def test_semivariogram_grid_near_field_matches_exact(spark, sf_dir):
    """The 'exact' rows of the grid twin are the directional
    semivariogram restricted to bins 0..2 -- they must reproduce
    semivariogram_anisotropy's (direction, bin) cells identically
    (n_pairs AND gamma), because the 3x3 cell join is complete for
    d < 0.6 and the binning/rounding text is shared."""
    grid = {
        (r["direction"], r["bin"]): (r["n_pairs"], r["gamma"])
        for r in _Q["semivariogram_grid"](spark, sf_dir).collect()
        if r["basis"] == "exact"
    }
    exact = {
        (r["direction"], r["bin"]): (r["n_pairs"], r["gamma"])
        for r in _Q["semivariogram_anisotropy"](spark, sf_dir).collect()
        if r["bin"] <= 2
    }
    assert grid == exact
    assert grid, "near field is empty -- cell join broke"


def test_semivariogram_grid_sampled_rows_are_marked_and_bounded(
    spark, sf_dir
):
    """Far-field rows must carry basis='sampled', sit in bins >= 3, and
    involve at most C(128, 2) pairs total (the constant-work
    contract); gamma stays positive on a non-degenerate field."""
    rows = _Q["semivariogram_grid"](spark, sf_dir).collect()
    sampled = [r for r in rows if r["basis"] == "sampled"]
    assert all(r["bin"] >= 3 for r in sampled)
    assert sum(r["n_pairs"] for r in sampled) <= 128 * 127 // 2
    for r in rows:
        assert r["gamma"] >= 0.0
        assert r["lag_lo"] == pytest.approx(r["bin"] * 0.2, abs=1e-9)


def test_semivariogram_grid_deterministic(spark, sf_dir):
    """The md5-rank sample makes the far field deterministic: two
    independent constructions must agree row-for-row."""
    a = sorted(map(tuple, _Q["semivariogram_grid"](spark, sf_dir).collect()))
    b = sorted(map(tuple, _Q["semivariogram_grid"](spark, sf_dir).collect()))
    assert a == b


def test_grid_exact_knn_dense_cell_guard_matches_brute(spark):
    """Occupancy-skew guard (r9 verdict item 4): a planted pileup --
    305 points inside ONE 0.05-cell (well past _DENSE_CAP=64, and past
    _DENSE_CHUNK=256 so the halo replicates across 2 probe chunks),
    five of them exactly coincident (exercises the (dq, j) tie order),
    plus ten boundary points in adjacent cells (the Arrow halo must see
    them). The guard's chunked-Arrow tier must reproduce the brute-force
    kNN BIT-IDENTICALLY: same (i, j, dq, rn) rows."""
    from pyspark.sql import functions as F

    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext212 import (
        _DENSE_CAP,
        _DENSE_CHUNK,
        _DQ_EXPR,
        _top_k,
        grid_exact_knn,
    )

    n_dense = 300
    rows = [
        (i, 0.0005 + (i * 7 % 311) * 0.00014, 0.0007 + (i * 11 % 311) * 0.00014)
        for i in range(n_dense)
    ]
    rows += [(n_dense + t, 0.0201, 0.0203) for t in range(5)]
    rows += [
        (n_dense + 5 + t, 0.0501 + t * 0.0004, 0.001 + t * 0.004)
        for t in range(10)
    ]
    assert n_dense + 5 > max(_DENSE_CAP, _DENSE_CHUNK)  # guard + chunking hit
    pts = spark.createDataFrame(rows, "vec_id long, px double, py double")
    got = sorted(
        map(tuple, grid_exact_knn(pts, 5, 0.05, 50_000_000).collect())
    )
    a = pts.select(F.col("vec_id").alias("i"), "px", "py")
    b = pts.select(
        F.col("vec_id").alias("j"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
    )
    brute = _top_k(
        a.join(F.broadcast(b), F.col("i") != F.col("j")).select(
            "i", "j", F.expr(_DQ_EXPR).alias("dq")
        ),
        5,
    ).select("i", "j", "dq", "rn")
    assert got == sorted(map(tuple, brute.collect()))
    assert len(got) == len(rows) * 5
