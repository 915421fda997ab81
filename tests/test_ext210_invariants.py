"""ext210: OEE factor laws (each factor in (0,1], product identity,
error-free day has quality 1) and skew-audit re-derivation (hashlib
bucket replica, CV/max-over-mean identities, uniform-key null)."""

from __future__ import annotations

import hashlib
import math

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext210 import (
    _B,
    q_oee_daily,
    q_shuffle_skew_audit,
)


def test_oee_factor_laws(spark, sf_dir):
    pdf = q_oee_daily(spark, sf_dir).toPandas()
    assert len(pdf) >= 28
    for col in ("availability", "performance", "quality"):
        assert (pdf[col] > 0).all() and (pdf[col] <= 1 + 1e-9).all()
    # product identity to rounding
    prod = pdf["availability"] * pdf["performance"] * pdf["quality"]
    assert ((pdf["oee"] - prod).abs() < 1e-4).all()
    # exactly one day attains performance 1 (the best-rate day)
    assert (pdf["performance"] >= 1 - 1e-9).sum() >= 1


def test_skew_audit_rederived(spark, sf_dir):
    pdf = q_shuffle_skew_audit(spark, sf_dir).toPandas()
    assert set(pdf["shuffle_key"]) == {"orders.o_custkey",
                                       "lineitem.l_suppkey"}
    con = duckdb.connect()
    keys = [
        k[0]
        for k in con.sql(
            f"SELECT o_custkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    buckets = [0] * _B
    for k in keys:
        b = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % _B
        buckets[b] += 1
    n = sum(buckets)
    row = pdf[pdf["shuffle_key"] == "orders.o_custkey"].iloc[0]
    assert int(row["max_bucket"]) == max(buckets)
    assert float(row["max_over_mean"]) == round(max(buckets) * _B / n, 6)
    cv = math.sqrt(sum(b * b for b in buckets) * _B / (n * n) - 1.0)
    assert abs(float(row["cv"]) - cv) < 1e-6
    # no pathological hot bucket (per-key order multiplicity makes
    # this ~2x mean on 1.5k keys x 32 buckets, far from a hot-key 10x)
    assert float(row["max_over_mean"]) < 4.0
    assert int(row["n_buckets"]) == _B
