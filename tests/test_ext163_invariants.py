"""ext163: literal re-derivations -- streaming CUSUM vs the plain
reset-at-zero loop (plus the max-plus monoid law on arbitrary splits),
the (s,Q) simulation vs a python loop (plus the conservation law
final = i0 - total_demand + reorders * Q), and Cox-Stuart vs the
pair-count loop (plus the antisymmetry law z(x) = -z(reversed x))."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext163 import (
    _H_CENTS,
    _K_CENTS,
    q_base_stock_policy,
    q_cox_stuart_trend,
    q_streaming_cusum_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cusum_loop(ds):
    s = peak = 0
    for d in ds:
        s = max(0, s + d)
        peak = max(peak, s)
    return s, peak


def _fold_quad(ds):
    t = sum(ds)
    pref, mx_pref, mn_pref, kad, best = 0, -(10**18), 0, -(10**18), 0
    for d in ds:
        prev_min = min(0, mn_pref)
        pref += d
        mx_pref = max(mx_pref, pref)
        kad = max(kad, pref - prev_min)
        mn_pref = min(mn_pref, pref)
    # max suffix = t - min over j of prefix_{j-1} (prefix_0 = 0)
    prefs = [0]
    run = 0
    for d in ds:
        run += d
        prefs.append(run)
    mx_suf = max(t - p for p in prefs[:-1])
    return t, mx_pref, mx_suf, kad


def _combine(state, quad):
    s_prev, peak_prev = state
    t, mx_pref, mx_suf, kad = quad
    s_new = max(0, mx_suf, s_prev + t)
    peak_new = max(peak_prev, 0, kad, s_prev + mx_pref)
    return s_new, peak_new


def test_streaming_cusum_matches_loop(spark, sf_dir):
    got = {
        r["user_id"]: r
        for r in q_streaming_cusum_replay(spark, sf_dir).collect()
    }
    rows = (
        read_table(spark, sf_dir, "events")
        .where("event_type = 'purchase'")
        .select("user_id", "value", "ts", "event_id")
        .collect()
    )
    per = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        per.setdefault(r["user_id"], []).append(
            round(r["value"] * 100) - _K_CENTS
        )
    assert set(got) == set(per)
    for u, ds in per.items():
        s, peak = _cusum_loop(ds)
        assert got[u]["n_purchases"] == len(ds)
        assert got[u]["cusum_dollars"] == pytest.approx(s / 100, abs=1e-9)
        assert got[u]["peak_dollars"] == pytest.approx(peak / 100, abs=1e-9)
        assert got[u]["alarm"] == (peak >= _H_CENTS)


def test_cusum_maxplus_monoid_law():
    # folding arbitrary splits == the straight loop
    ds = [5, -3, 8, -20, 4, 4, 4, -1, 30, -50, 2, 9, -4, 7]
    expect = _cusum_loop(ds)
    for cut1 in (1, 4, 9):
        for cut2 in (cut1, 11, len(ds)):
            state = (0, 0)
            chunks = [ds[:cut1], ds[cut1:cut2], ds[cut2:]]
            for ch in chunks:
                if ch:
                    state = _combine(state, _fold_quad(ch))
            assert state == expect


def test_base_stock_matches_loop(spark, sf_dir):
    row = q_base_stock_policy(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .count()
        .collect()
    )
    per = {r[0]: r["count"] for r in daily}
    ds = [per[d] for d in sorted(per)]
    n = len(ds)
    mu = -(-sum(ds) // n)  # ceil division
    s_pt, q_qty, inv = 3 * mu, 14 * mu, 17 * mu
    reorders = backdays = 0
    for d in ds:
        inv -= d
        if inv < 0:
            backdays += 1
        if inv <= s_pt:
            inv += q_qty
            reorders += 1
    assert row["n_days"] == n
    assert row["mu_daily_demand"] == mu
    assert row["reorder_point"] == s_pt
    assert row["order_qty"] == q_qty
    assert row["n_reorders"] == reorders
    assert row["n_backorder_days"] == backdays
    assert row["final_inventory"] == inv
    assert row["service_level"] == pytest.approx(1 - backdays / n, abs=1e-6)
    # conservation law: ending inventory is start - demand + reorders
    assert inv == 17 * mu - sum(ds) + reorders * q_qty


def test_cox_stuart_matches_loop(spark, sf_dir):
    row = q_cox_stuart_trend(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    c = len(xs) // 2
    pairs = [(xs[i], xs[i + c]) for i in range(c)]
    m = sum(1 for a, b in pairs if a != b)
    t_up = sum(1 for a, b in pairs if b > a)
    cc = 0.5 if t_up > m / 2 else (-0.5 if t_up < m / 2 else 0.0)
    z = (t_up - m / 2 - cc) / math.sqrt(m / 4)
    assert row["n_pairs"] == m
    assert row["n_up"] == t_up
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_two_sided"] == pytest.approx(
        math.erfc(abs(z) / math.sqrt(2)), abs=2e-6
    )
    assert row["reject_5pct"] == (abs(z) > 1.959963984540054)


def test_cox_stuart_antisymmetry_law():
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]

    def zstat(seq):
        c = len(seq) // 2
        pairs = [(seq[i], seq[i + c]) for i in range(c)]
        m = sum(1 for a, b in pairs if a != b)
        t_up = sum(1 for a, b in pairs if b > a)
        cc = 0.5 if t_up > m / 2 else (-0.5 if t_up < m / 2 else 0.0)
        return (t_up - m / 2 - cc) / math.sqrt(m / 4)

    assert zstat(xs) == pytest.approx(-zstat(xs[::-1]), abs=1e-12)
