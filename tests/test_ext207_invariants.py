"""ext207: rendezvous-hashing laws -- hashlib re-derivation of the
argmax assignment, the minimal-disruption property (removing a shard
reassigns ONLY its keys; adding one moves only the keys it wins, at
~1/(n+1)), and balance within binomial bounds. Wright's curve: a
planted 80% experience curve is recovered through the full quantized
pipeline; the synthetic data's volume-independent prices read b ~ 0."""

from __future__ import annotations

import hashlib
import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext207 import (
    _N_SHARDS,
    q_rendezvous_reshard_movement,
    q_rendezvous_shard_balance,
    q_wrights_experience_curve,
)


def _score(i: int, key: int) -> str:
    return hashlib.md5(f"{i}:{key}".encode()).hexdigest()


def _assign(key: int, n: int) -> int:
    return max(range(n), key=lambda i: _score(i, key))


def test_assignment_matches_hashlib(spark, sf_dir):
    pdf = q_rendezvous_shard_balance(spark, sf_dir).toPandas()
    assert sorted(pdf["shard"]) == list(range(_N_SHARDS))
    n = int(pdf["n_keys"].sum())
    # hashlib replica on a key sample must land on shards with the
    # same relative frequencies the query reports (spot: argmax logic)
    import duckdb

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
            " ORDER BY o_orderkey LIMIT 500"
        ).fetchall()
    ]
    from collections import Counter

    mine = Counter(_assign(k, _N_SHARDS) for k in keys)
    # every shard the sample hits exists in the query output
    got = dict(zip(pdf["shard"], pdf["n_keys"]))
    for s, c in mine.items():
        assert got[s] >= c
    # binomial balance: each share within 6 sd of 1/16
    p = 1.0 / _N_SHARDS
    sd = math.sqrt(p * (1 - p) / n)
    assert ((pdf["share"] - p).abs() < 6 * sd + 1e-9).all()


def test_minimal_disruption_laws(spark, sf_dir):
    # adding shard n moves only keys the new shard WINS
    pdf = q_rendezvous_reshard_movement(spark, sf_dir).toPandas().iloc[0]
    n = int(pdf["n_keys"])
    frac = float(pdf["moved_fraction"])
    p = 1.0 / (_N_SHARDS + 1)
    sd = math.sqrt(p * (1 - p) / n)
    assert abs(frac - p) < 6 * sd
    # hashlib: moving == new score beats all old; and REMOVING a shard
    # reassigns only its own keys (incumbent ranking untouched)
    for key in range(1, 300):
        old = _assign(key, _N_SHARDS)
        moved = _score(_N_SHARDS, key) > max(
            _score(i, key) for i in range(_N_SHARDS)
        )
        assert moved == (_assign(key, _N_SHARDS + 1) == _N_SHARDS)
        removed = 3
        if old != removed:
            keep = max(
                (i for i in range(_N_SHARDS) if i != removed),
                key=lambda i: _score(i, key),
            )
            assert keep == old


def _wright_fit(qty_prices):
    """(monthly_qty, unit_price) -> slope through the exact quantized
    pipeline."""
    cum, pts = 0, []
    for qty, price in qty_prices:
        cum += qty
        xq = math.floor(math.log(cum) * 1e9 + 0.5)
        yq = math.floor(math.log(price) * 1e9 + 0.5)
        pts.append((xq, yq))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    return (n * sxy - sx * sy) / (n * sxx - sx * sx)


def test_planted_experience_curve_recovered():
    b_true = math.log2(0.8)  # the classic 80% curve
    data = []
    cum = 0
    for t in range(1, 61):
        qty = 100 + 7 * t
        cum += qty
        price = 50.0 * cum**b_true
        data.append((qty, price))
    # refit from scratch (the helper recomputes cum internally)
    b_hat = _wright_fit([(q, p) for q, p in data])
    assert abs(b_hat - b_true) < 0.01
    assert abs(2**b_hat - 0.8) < 0.01


def test_wright_query_null_and_mapping(spark, sf_dir):
    row = q_wrights_experience_curve(spark, sf_dir).toPandas().iloc[0]
    assert row["n_months"] >= 12
    # synthetic prices don't depend on volume: near-flat curve
    assert abs(row["slope_b"]) < 0.2
    assert abs(row["progress_ratio"] - 2 ** row["slope_b"]) < 1e-5
    assert abs(row["learning_pct"] - (1 - row["progress_ratio"])) < 1e-9
