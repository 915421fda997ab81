"""Definition-level invariants for ext227 (betting e-process, Hedge)."""

from __future__ import annotations

import math

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext227 import (
    _BET_LAMBDA,
    _BET_LOG_THRESHOLD_E9,
    _BET_TRAIN,
    _HEDGE_WARMUP,
)

_Q = {q.name: q.fn for q in registry()}


def _daily_dollars(sf_dir: str):
    return [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            f" AS BIGINT) // 100 FROM '{sf_dir}/orders.parquet'"
            f" GROUP BY o_orderdate ORDER BY o_orderdate"
        ).fetchall()
    ]


def _eprocess(y, train=_BET_TRAIN, lam=_BET_LAMBDA):
    n = min(train, len(y))
    tr = y[:n]
    s1, s2 = sum(tr), sum(v * v for v in tr)
    lws, lw = [], 0
    for v in y[n:]:
        z = (n * v - s1) / math.sqrt(float(n * s2 - s1 * s1))
        z = max(min(z, 2.0), -2.0)
        lw += math.floor(1e9 * math.log(1.0 + lam * z) + 0.5)
        lws.append(lw)
    return lws


def test_eprocess_matches_python_fold(spark, sf_dir):
    y = _daily_dollars(sf_dir)
    lws = _eprocess(y)
    row = _Q["betting_eprocess_daily"](spark, sf_dir).collect()[0]
    assert row["n_test_days"] == len(lws)
    assert row["max_log_wealth_e9"] == max(lws)
    assert row["final_log_wealth_e9"] == lws[-1]
    assert row["reject_5pct"] == int(max(lws) > _BET_LOG_THRESHOLD_E9)


def test_eprocess_null_fixture_respects_ville():
    """Planted NULL (sin-hash noise around a constant level): the
    wealth path of a fair game should stay below ln(20) -- Ville bounds
    the crossing probability at 5%, and this deterministic fixture is
    a typical draw."""
    y = [
        10000 + int(2000 * math.sin(t * 12.9898 + 78.233) % 1.0 * 1)
        + int((math.sin(t * 12.9898 + 78.233) * 43758.5453) % 1000)
        for t in range(800)
    ]
    lws = _eprocess(y, train=365)
    assert max(lws) <= _BET_LOG_THRESHOLD_E9


def test_eprocess_drift_fixture_crosses():
    """Planted drift: test-period level 1 sd above the training mean
    -> the betting wealth must cross 1/alpha quickly."""
    base = [10000 + int((math.sin(t * 12.9898) * 43758.5453) % 2000) for t in range(365)]
    drifted = [v + 1200 for v in base]
    lws = _eprocess(base + drifted, train=365)
    assert max(lws) > _BET_LOG_THRESHOLD_E9


def _hedge_python(y, warm=_HEDGE_WARMUP):
    mu0 = max(sum(y[:warm]) // warm, 1)
    cums = {e: 0 for e in ("lag1", "lag7", "lag28", "cummean", "const28")}
    n_rounds = 0
    prefix = 0
    for t, v in enumerate(y):
        rn = t + 1
        if rn > warm:
            fc = {
                "lag1": y[t - 1],
                "lag7": y[t - 7],
                "lag28": y[t - 28],
                "cummean": prefix // max(rn - 1, 1),
                "const28": mu0,
            }
            for e, f in fc.items():
                cums[e] += min(abs(v - f), mu0) * 10**9 // mu0
            n_rounds += 1
        prefix += v
    return mu0, cums, n_rounds


def test_hedge_matches_python_fold(spark, sf_dir):
    y = _daily_dollars(sf_dir)
    mu0, cums, n_rounds = _hedge_python(y)
    rows = {r["expert"]: r for r in _Q["hedge_expert_weights"](spark, sf_dir).collect()}
    assert set(rows) == set(cums)
    lmin = min(cums.values())
    t = n_rounds
    e_e9 = {
        e: math.floor(
            math.exp(-(2.0 / math.sqrt(t)) * ((c - lmin) / 1e9)) * 1e9 + 0.5
        )
        for e, c in cums.items()
    }
    se = sum(e_e9.values())
    for e, c in cums.items():
        assert rows[e]["n_rounds"] == n_rounds
        assert rows[e]["cum_loss_e9"] == c, e
        assert rows[e]["share_ppm"] == e_e9[e] * 10**6 // se, e
        assert rows[e]["is_best"] == int(c == lmin)
    assert sum(r["is_best"] for r in rows.values()) >= 1


def test_hedge_regret_bound_holds(spark, sf_dir):
    """Hedge with eta = 2/sqrt(T) on [0,1] losses: the exponentially
    weighted mixture's cumulative loss exceeds the best expert's by at
    most ln(K)/eta + eta*T/8 -- verified by replaying the weights in
    Python over the real series."""
    y = _daily_dollars(sf_dir)
    warm = _HEDGE_WARMUP
    mu0 = max(sum(y[:warm]) // warm, 1)
    experts = ("lag1", "lag7", "lag28", "cummean", "const28")
    # first pass for T
    _, cums, t_rounds = _hedge_python(y)
    eta = 2.0 / math.sqrt(t_rounds)
    logw = {e: 0.0 for e in experts}
    mix_loss = 0.0
    prefix = sum(y[:0])
    prefix = 0
    for t, v in enumerate(y):
        rn = t + 1
        if rn > warm:
            fc = {
                "lag1": y[t - 1],
                "lag7": y[t - 7],
                "lag28": y[t - 28],
                "cummean": prefix // max(rn - 1, 1),
                "const28": mu0,
            }
            mx = max(logw.values())
            ws = {e: math.exp(logw[e] - mx) for e in experts}
            z = sum(ws.values())
            losses = {
                e: min(abs(v - f), mu0) / mu0 for e, f in fc.items()
            }
            mix_loss += sum(ws[e] / z * losses[e] for e in experts)
            for e in experts:
                logw[e] -= eta * losses[e]
        prefix += v
    best = min(cums.values()) / 1e9
    bound = math.log(len(experts)) / eta + eta * t_rounds / 8.0
    assert mix_loss - best <= bound + 1e-6
