"""Definition-level invariants for ext223 (semivariogram_moments).

The moment factorization sum_{i in a, j in b}(z_i - z_j)^2 =
n_b*s2_a + n_a*s2_b - 2*s1_a*s1_b is re-derived here by EXPLICIT pair
enumeration in pure Python over the real sf_dir points -- the class of
check the oracle cannot do (a shared-formulation bug in the query AND
its SQL would stay green there).
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext223 import (
    _SVM_BIN_Q,
    _SVM_CELL,
    _SVM_NEAR_Q,
)

_Q = {q.name: q.fn for q in registry()}


def _half_up(x: float) -> int:
    """Spark round(x, 0) on DOUBLE: BigDecimal HALF_UP on the shortest
    repr (matters for NEGATIVE z -- floor(x+0.5) floors toward -inf)."""
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _enumerate_expected(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT CAST(embedding[1] AS DOUBLE), CAST(embedding[2] AS DOUBLE),"
        f" CAST(embedding[3] AS DOUBLE)"
        f" FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    pts = [
        (
            math.floor(px / _SVM_CELL),
            math.floor(py / _SVM_CELL),
            _half_up(1000000.0 * z),
        )
        for px, py, z in rows
    ]
    agg: dict = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if not (dx > 0 or (dx == 0 and dy > 0) or (dx == 0 and dy == 0)):
                dx, dy = -dx, -dy
            dcq = _half_up(
                1.0e9 * _SVM_CELL * math.sqrt(float(dx * dx + dy * dy))
            )
            if dcq >= _SVM_NEAR_Q:
                continue
            direction = "EW" if abs(dx) >= abs(dy) else "NS"
            key = (direction, dcq // _SVM_BIN_Q)
            np_, sqd = agg.get(key, (0, 0))
            agg[key] = (np_ + 1, sqd + (pts[i][2] - pts[j][2]) ** 2)
    return agg


def test_moment_factorization_matches_pair_enumeration(spark, sf_dir):
    got = {
        (r["direction"], r["bin"]): (r["n_pairs"], r["gamma"])
        for r in _Q["semivariogram_moments"](spark, sf_dir).collect()
    }
    exp = _enumerate_expected(sf_dir)
    assert set(got) == set(exp)
    for key, (np_, sqd) in exp.items():
        assert got[key][0] == np_, key
        gamma = sqd / (2.0 * np_) / 1e12
        assert got[key][1] == pytest.approx(gamma, abs=2e-6), key


def test_moment_output_shape(spark, sf_dir):
    rows = _Q["semivariogram_moments"](spark, sf_dir).collect()
    assert rows, "near field empty -- cell join broke"
    for r in rows:
        assert r["basis"] == "moment"
        assert 0 <= r["bin"] <= 2
        assert r["gamma"] >= 0.0
        assert r["max_center_err"] == pytest.approx(
            round(_SVM_CELL * math.sqrt(2.0), 6)
        )
        assert r["lag_lo"] == pytest.approx(r["bin"] * 0.2, abs=1e-9)


# ---------------------------------------------------------------------------
# incremental_lsh_update (ext213's contract applied to the signature
# index): incremental == full re-signature, delta-only hashing cost,
# state read (not re-derived) from parquet, drift-output sanity.
# ---------------------------------------------------------------------------
from pyspark.sql import functions as F  # noqa: E402

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (  # noqa: E402
    signature_bucket,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (  # noqa: E402
    read_table,
)


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_lsh_incremental_equals_full_resignature(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    sig = signature_bucket("v", 64, 6)
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)
    inc = {
        r["vec_id"]: r["bucket"]
        for r in old.select("vec_id", sig.alias("bucket"))
        .unionByName(delta.select("vec_id", sig.alias("bucket")))
        .collect()
    }
    full = {
        r["vec_id"]: r["bucket"]
        for r in emb.select("vec_id", sig.alias("bucket")).collect()
    }
    assert inc == full
    assert len(inc) == emb.count()


def test_lsh_delta_cost_contract(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    sig = signature_bucket("v", 64, 6)
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)
    # (1) the incremental projection runs over delta rows only
    delta_sig = delta.select("vec_id", sig.alias("bucket"))
    assert delta_sig.count() == delta.count() < 0.4 * emb.count()
    # (2) the persisted index is READ, not re-signatured: round-trip
    # the state through parquet (the deployment shape); the merged
    # plan's state branch must be a bare parquet relation -- the
    # signature expression (identified by plane 0's first coefficient
    # literal) appears in the DELTA branch only.
    state_dir = tmp_path / "lsh_state"
    old.select("vec_id", sig.alias("bucket")).write.parquet(str(state_dir))
    state = spark.read.parquet(str(state_dir))
    merged = state.unionByName(delta_sig)
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    assert lines[0].startswith("Union")
    # state child is a BARE parquet relation -- no Project above it, so
    # the signature expression cannot be re-running on the state side
    # (the plane coefficients are +-1.0, too common to grep for).
    assert lines[1].startswith(":- Relation") and "parquet" in lines[1]
    assert "CASE WHEN" in plan  # the delta branch does signature
    # (3) merged index == full re-signature
    inc = {r["vec_id"]: r["bucket"] for r in merged.collect()}
    full = {
        r["vec_id"]: r["bucket"]
        for r in emb.select("vec_id", sig.alias("bucket")).collect()
    }
    assert inc == full


def test_lsh_drift_output_sanity(spark, sf_dir):
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry

    q = {x.name: x.fn for x in registry()}["incremental_lsh_update"]
    emb = _emb(spark, sf_dir)
    rows = q(spark, sf_dir).collect()
    assert len(rows) == 64
    tv = rows[0]["drift_tv"]
    assert all(r["drift_tv"] == tv for r in rows)
    assert 0.0 <= tv <= 1.0
    flag = int(tv > 0.25)
    assert all(r["refit_triggered"] == flag for r in rows)
    assert sum(r["n_total"] for r in rows) == emb.count()
    assert sum(r["n_old"] for r in rows) == emb.where(
        F.pmod("vec_id", F.lit(10)) < 8
    ).count()
    for r in rows:
        assert r["n_total"] == r["n_old"] + r["n_delta"]
