"""ext187: independent re-derivations. The oracle proves Spark ==
DuckDB; these prove the shared formulation itself -- a numpy Kalman
filter checked against the Riccati fixed point, a full-matrix numpy
Viterbi, a brute-force sequential Lindley recursion, and a from-scratch
quantized periodogram with a planted-sine fixture for Fisher's g."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext187 import (
    _K_DAYS,
    _KQ,
    _KR,
    _V_DAYS,
    q_fisher_g_bandlimited,
    q_kalman_local_level,
    q_lindley_queue_waits,
    q_viterbi_regime_decode,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def daily_cents(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: int(round(r[1] * 100)) for r in rows}
    return [per[d] for d in sorted(per)]


def test_kalman_matches_numpy_and_riccati(spark, sf_dir, daily_cents):
    row = q_kalman_local_level(spark, sf_dir).collect()[0]
    ys = [c / 100.0 for c in daily_cents[-min(_K_DAYS, len(daily_cents)):]]
    # the query window is (max_d - 180, max_d] in DATES; days with no
    # orders shrink it below 180 rows -- recompute from the query's n
    ys = [c / 100.0 for c in daily_cents[-row.n_fit_days:]]
    x, p, sse, k = ys[0], _KR, 0.0, 0.0
    for y in ys[1:]:
        pp = p + _KQ
        k = pp / (pp + _KR)
        sse += (y - x) * (y - x)
        x = x + k * (y - x)
        p = (1.0 - k) * pp
    assert row.level_dollars == round(x, 2)
    assert row.kalman_gain_final == round(k, 6)
    assert row.p_posterior_final == round(p, 2)
    assert row.innovation_rmse_dollars == round(
        math.sqrt(sse / (len(ys) - 1)), 2
    )
    # Riccati fixed point: A = P+Q solves A^2 - QA - QR = 0
    a_star = (_KQ + math.sqrt(_KQ * _KQ + 4 * _KQ * _KR)) / 2.0
    k_star = a_star / (a_star + _KR)
    # geometric convergence leaves ~1e-7 after a 180-day window
    assert abs(k - k_star) < 1e-6, "gain did not reach the steady state"


def _viterbi_numpy(signs, lt_stay, lt_switch, le, lp0):
    d = np.array([lp0 + le[0][signs[0]], lp0 + le[1][signs[0]]])
    cur = int(d[1] > d[0])
    flips = 0
    for s in signs[1:]:
        nd0 = max(d[0] + lt_stay, d[1] + lt_switch) + le[0][s]
        nd1 = max(d[0] + lt_switch, d[1] + lt_stay) + le[1][s]
        d = np.array([nd0, nd1])
        new = int(nd1 > nd0)
        flips += int(new != cur)
        cur = new
    return d, cur, flips


def test_viterbi_matches_numpy(spark, sf_dir, daily_cents):
    row = q_viterbi_regime_decode(spark, sf_dir).collect()[0]
    cents = daily_cents[-(row.n_obs + 1):]
    signs = [int(b > a) for a, b in zip(cents, cents[1:])]
    assert len(signs) == row.n_obs
    assert sum(signs) == row.n_up_days
    le = {
        0: {1: math.log(0.35), 0: math.log(0.65)},
        1: {1: math.log(0.65), 0: math.log(0.35)},
    }
    d, cur, flips = _viterbi_numpy(
        signs, math.log(0.9), math.log(0.1), le, math.log(0.5)
    )
    assert row.delta_bear == round(d[0], 4)
    assert row.delta_bull == round(d[1], 4)
    assert row.map_final_state == cur
    assert row.n_running_map_flips == flips
    # max-plus sanity: scores are log-probs of actual paths, so both
    # must be <= 0 and within n*ln(max emission) of each other
    assert d[0] < 0 and d[1] < 0


def test_viterbi_planted_regimes():
    """A planted alternating-regime sign sequence decodes to the
    planted layout: long runs of ups must put the MAP state at bull,
    long runs of downs at bear, with flips counting the boundaries."""
    le = {
        0: {1: math.log(0.35), 0: math.log(0.65)},
        1: {1: math.log(0.65), 0: math.log(0.35)},
    }
    signs = [1] * 40 + [0] * 40 + [1] * 40
    d, cur, flips = _viterbi_numpy(
        signs, math.log(0.9), math.log(0.1), le, math.log(0.5)
    )
    assert cur == 1  # ends in the bull block
    assert flips == 2  # exactly the two planted regime boundaries


def test_lindley_matches_sequential_recursion(spark, sf_dir):
    row = q_lindley_queue_waits(spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "unix_micros(ts) AS us",
            "event_id",
            "CAST(round(value * 100, 0) AS BIGINT) AS sc",
        )
        .collect()
    )
    by_day: dict = {}
    for r in ev:
        by_day.setdefault(r.day, []).append((r.us, r.event_id, r.sc))
    tot_gap = tot_sc = 0
    for day, rows in by_day.items():
        rows.sort()
        for (u0, _, s0), (u1, _, _) in zip(rows, rows[1:]):
            tot_gap += u1 - u0
            tot_sc += s0
    g = (5 * tot_gap) // (6 * tot_sc)
    waits = []
    for day, rows in sorted(by_day.items()):
        w = 0
        for (u0, _, s0), (u1, _, _) in zip(rows, rows[1:]):
            w = max(0, w + s0 * g - (u1 - u0))
            waits.append(w)
    assert row.n_waits == len(waits)
    assert row.rho_ppm == (1000 * tot_sc * g) // (tot_gap // 1000)
    assert row.max_wait_s == round(max(waits) / 1e6, 3)
    assert row.mean_wait_ms == (sum(waits) // len(waits)) // 1000
    assert row.frac_delayed == round(
        sum(1 for w in waits if w > 0) / len(waits), 6
    )


def _band_periodogram(cents):
    n = len(cents)
    s = sum(cents)
    u = [n * c - s for c in cents]
    out = {}
    for p in range(2, 61):
        a = sum(
            int(round(1.0e-6 * u[t - 1] * math.cos(2 * math.pi * t / p)))
            for t in range(1, n + 1)
        )
        b = sum(
            int(round(1.0e-6 * u[t - 1] * math.sin(2 * math.pi * t / p)))
            for t in range(1, n + 1)
        )
        out[p] = a * a + b * b
    return out


def test_fisher_g_matches_rederivation(spark, sf_dir, daily_cents):
    row = q_fisher_g_bandlimited(spark, sf_dir).collect()[0]
    io = _band_periodogram(daily_cents)
    mi, si = max(io.values()), sum(io.values())
    peak = min(p for p, v in io.items() if v == mi)
    assert row.m_ordinates == 59
    assert row.peak_period_days == peak
    assert row.g_stat == round(mi / si, 6)
    assert 0.0 <= row.p_fisher <= 1.0


def test_fisher_g_planted_sine():
    """A pure 7-day sine (plus a deterministic sin-hash dither, the
    CLAUDE.md white-noise fixture) must put the peak at period 7 with
    g far above the white-noise level 1/59."""
    n = 500
    cents = [
        int(1e7 + 2e6 * math.sin(2 * math.pi * t / 7)
            + 1e4 * (math.sin(t * 12.9898 + 78.233) * 43758.5453 % 1.0))
        for t in range(1, n + 1)
    ]
    io = _band_periodogram(cents)
    mi = max(io.values())
    peak = min(p for p, v in io.items() if v == mi)
    assert peak == 7
    assert mi / sum(io.values()) > 0.5
