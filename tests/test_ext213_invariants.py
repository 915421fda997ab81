"""Invariants for ext213 incremental IVF maintenance: the incremental
assignment equals the full re-assignment under the frozen quantizer
(the property the oracle hash-gates cross-engine, re-proven here
in-engine on a different code path), the delta-cost contract (the
incremental Arrow pass touches |delta| rows; the persisted index is
READ, not re-derived), and drift-output sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
    ivf_assign_cells,
    ivf_train_centroids,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def _emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_incremental_equals_full_reassign(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)
    C = ivf_train_centroids(old, "vec_id", "v", n_cells=8)
    inc = {
        r["vec_id"]: r["_cell"]
        for r in ivf_assign_cells(old, C.tolist(), "v")
        .unionByName(ivf_assign_cells(delta, C.tolist(), "v"))
        .select("vec_id", "_cell")
        .collect()
    }
    full = {
        r["vec_id"]: r["_cell"]
        for r in ivf_assign_cells(emb, C.tolist(), "v")
        .select("vec_id", "_cell")
        .collect()
    }
    assert inc == full
    assert len(inc) == emb.count()


def test_quantizer_fit_is_deterministic(spark, sf_dir):
    old = _emb(spark, sf_dir).where(F.pmod("vec_id", F.lit(10)) < 8)
    c1 = ivf_train_centroids(old, "vec_id", "v", n_cells=8)
    c2 = ivf_train_centroids(old, "vec_id", "v", n_cells=8)
    assert (c1 == c2).all()  # bit-identical refit -- the freeze is real


def test_delta_cost_contract(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    old = emb.where(F.pmod("vec_id", F.lit(10)) < 8)
    delta = emb.where(F.pmod("vec_id", F.lit(10)) >= 8)
    C = ivf_train_centroids(old, "vec_id", "v", n_cells=8)
    # (1) the incremental Arrow pass runs over delta rows only
    delta_asg = ivf_assign_cells(delta, C.tolist(), "v")
    assert delta_asg.count() == delta.count() < 0.4 * emb.count()
    # (2) the persisted index is READ, not re-assigned: round-trip the
    # state through parquet (the deployment shape) and check the read
    # plan contains a bare parquet relation and NO Python/Arrow eval
    state_dir = tmp_path / "ivf_state"
    ivf_assign_cells(old, C.tolist(), "v").select(
        "vec_id", "_cell"
    ).write.parquet(str(state_dir))
    state = spark.read.parquet(str(state_dir))
    merged = state.unionByName(delta_asg.select("vec_id", "_cell"))
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    assert (
        plan.lower().count("evalpython") == 1
    ), "state side must not re-run the assignment UDF"
    assert "parquet" in plan
    # (3) merged index == full re-assignment with the frozen quantizer
    inc = {r["vec_id"]: r["_cell"] for r in merged.collect()}
    full = {
        r["vec_id"]: r["_cell"]
        for r in ivf_assign_cells(emb, C.tolist(), "v")
        .select("vec_id", "_cell")
        .collect()
    }
    assert inc == full


def test_drift_output_sanity(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = _Q["incremental_ivf_update"](spark, sf_dir).collect()
    assert len(rows) == 8
    tv = rows[0]["drift_tv"]
    assert all(r["drift_tv"] == tv for r in rows)  # global, repeated
    assert 0.0 <= tv <= 1.0
    flag = int(tv > 0.25)
    assert all(r["refit_triggered"] == flag for r in rows)
    assert sum(r["n_total"] for r in rows) == emb.count()
    assert sum(r["n_old"] for r in rows) == emb.where(
        F.pmod("vec_id", F.lit(10)) < 8
    ).count()
    for r in rows:
        assert r["n_total"] == r["n_old"] + r["n_delta"]
