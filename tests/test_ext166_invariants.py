"""ext166: literal re-derivations -- ERR vs a per-user cascade loop
(plus the cascade law: a g=4 hit at position 1 bounds ERR >= 15/16
times any tail), RBP vs the geometric-weight loop (plus the weight
identity sum_inf (1-p)p^(i-1) = 1 so RBP <= 1 and residual = p^K),
and HT vs a hash-replay loop (plus the unbiasedness sanity: the
estimate sits within 4 SE of the true total)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext166 import (
    _GMAX,
    _K,
    _P_RBP,
    _RBP_E12,
    _SPLIT,
    q_err_at_k,
    q_horvitz_thompson_total,
    q_rbp_at_k,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def pop_rel(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    rows = li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    split = _SPLIT
    train = defaultdict(int)
    rel = defaultdict(int)
    for r in rows:
        d = str(r["o_orderdate"])[:10]
        if d < split:
            train[r["l_partkey"]] += int(r["l_quantity"])
        else:
            rel[(r["o_custkey"], r["l_partkey"])] += int(r["l_quantity"])
    pop = sorted(train.items(), key=lambda kv: (-kv[1], kv[0]))[:_K]
    ranked = [i for i, _ in pop]
    users = sorted({u for u, _ in rel})
    return ranked, users, rel


def test_err_matches_cascade_loop(spark, sf_dir, pop_rel):
    row = q_err_at_k(spark, sf_dir).collect()[0]
    ranked, users, rel = pop_rel
    errs = []
    for u in users:
        nums = [
            2 ** min(rel.get((u, i), 0), _GMAX) - 1 for i in ranked
        ]
        stopprod = 1
        total = 0
        for pos, num in enumerate(nums, 1):
            total += (10**9 * num * stopprod) // (pos * 16**pos)
            stopprod *= 16 - num
        errs.append(total)
    assert row["n_users"] == len(users)
    assert row["mean_err"] == pytest.approx(
        sum(errs) / 1e9 / len(errs), abs=1e-6
    )
    assert row["max_err"] == pytest.approx(max(errs) / 1e9, abs=1e-6)


def test_err_cascade_dominance_law():
    # g=4 at position 1: ERR >= 15/16 regardless of the tail; and the
    # tail can add at most (1/16) * sum 1/i
    nums = [15] + [15] * (_K - 1)
    err = 0.0
    stop = 1.0
    for pos, num in enumerate(nums, 1):
        r = num / 16.0
        err += r * stop / pos
        stop *= 1 - r
    assert err >= 15 / 16
    assert err <= 15 / 16 + (1 / 16) * sum(1 / i for i in range(2, _K + 1))


def test_rbp_matches_loop_and_weight_identity(spark, sf_dir, pop_rel):
    row = q_rbp_at_k(spark, sf_dir).collect()[0]
    ranked, users, rel = pop_rel
    sums = []
    for u in users:
        s = 0
        for pos, i in enumerate(ranked, 1):
            num = 2 ** min(rel.get((u, i), 0), _GMAX) - 1
            s += num * _RBP_E12[pos - 1]
        sums.append(s)
    assert row["n_users"] == len(users)
    assert row["mean_rbp"] == pytest.approx(
        sum(sums) / 15.0 / 1e12 / len(sums), abs=1e-6
    )
    # geometric weights sum to 1 - p^K over the first K positions
    assert sum(_RBP_E12) / 1e12 == pytest.approx(
        1 - _P_RBP**_K, abs=1e-9
    )
    assert row["residual_uncertainty"] == pytest.approx(
        _P_RBP**_K, abs=1e-6
    )
    assert row["mean_rbp"] <= 1.0


def test_ht_matches_hash_replay(spark, sf_dir):
    row = q_horvitz_thompson_total(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    ht = var = n_s = true = 0
    for r in rows:
        cents = round(r["o_totalprice"] * 100)
        true += cents
        h = (
            int(
                hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:4],
                16,
            )
            % 1000
        )
        thr = (
            50
            if r["o_orderpriority"] == "1-URGENT"
            else 20
            if r["o_orderpriority"] == "2-HIGH"
            else 10
        )
        if h < thr:
            w = {50: 20, 20: 50, 10: 100}[thr]
            n_s += 1
            ht += cents * w
            var += cents * cents * w * (w - 1)
    assert row["n_sampled"] == n_s
    assert row["n_total"] == len(rows)
    assert row["ht_total_dollars"] == ht // 100
    assert row["true_total_dollars"] == true // 100
    assert row["rel_error"] == pytest.approx((ht - true) / true, abs=1e-6)
    se = math.sqrt(var) / 100.0
    assert row["se_dollars"] == pytest.approx(se, rel=1e-6)
    # design-based sanity: the estimate is within 4 SE of truth
    assert abs(ht - true) / 100.0 < 4 * se
