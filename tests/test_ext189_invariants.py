"""ext189: independent re-derivations -- brute-force python replays of
the pass-through join and the peeling runs, an independent-hash AMS
sketch, exposure-share conservation laws, a python TTT statistic, and
the constant-gap / exponential-gap calibration laws."""

from __future__ import annotations

import hashlib
import json
import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext189 import (
    _AMS_K,
    _PT_WINDOW_US,
    q_aml_pass_through,
    q_ams_f2_sketch,
    q_exposure_parity_ranking,
    q_peeling_chain_lengths,
    q_ttt_exponentiality,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def events_rows(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "event_id",
            "unix_micros(ts) AS us",
            "CAST(ts AS DATE) AS day",
            "CAST(round(value * 100, 0) AS BIGINT) AS cents",
            "props",
        )
        .collect()
    )


def test_pass_through_matches_bruteforce(spark, sf_dir, events_rows):
    got = {
        r.middle_account: r for r in q_aml_pass_through(spark, sf_dir).collect()
    }
    ev = [
        (r.user_id, json.loads(r.props)["k"], r.us, r.cents)
        for r in events_rows
    ]
    per: dict = {}
    for (ua, ka, usa, ca) in ev:
        for (ub, kb, usb, cb) in ev:
            if (
                ub == ka
                and usb > usa
                and usb <= usa + _PT_WINDOW_US
                and 10 * cb >= 8 * ca
                and 10 * cb <= 12 * ca
            ):
                st = per.setdefault(ka, [0, 0, 0, 0])
                st[0] += 1
                st[1] += ca
                st[2] += usb - usa
                st[3] += (1_000_000 * cb) // ca
    top = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert set(got) == {m for m, _ in top}
    for m, (n, sin, sgap, srat) in top:
        r = got[m]
        assert r.n_pass == n
        assert r.matched_in_dollars == sin // 100
        assert r.mean_gap_minutes == (sgap // n) // 60_000_000
        assert r.mean_ratio_ppm == srat // n


def test_peeling_chains_match_bruteforce(spark, sf_dir, events_rows):
    got = {
        r.user_id: r for r in q_peeling_chain_lengths(spark, sf_dir).collect()
    }
    by_user: dict = {}
    for r in events_rows:
        by_user.setdefault(r.user_id, []).append((r.us, r.event_id, r.cents))
    stats = {}
    for u, rows in by_user.items():
        rows.sort()
        runs, cur = [], 1
        for (_, _, c0), (_, _, c1) in zip(rows, rows[1:]):
            if c1 < c0:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        stats[u] = (max(runs), sum(1 for x in runs if x >= 4), len(rows))
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert set(got) == {u for u, _ in top}
    for u, (mx, ge4, n) in top:
        r = got[u]
        assert (r.max_peel_chain, r.n_chains_ge_4, r.n_events) == (mx, ge4, n)


def test_ams_sketch_matches_independent_hash(spark, sf_dir, events_rows):
    row = q_ams_f2_sketch(spark, sf_dir).collect()[0]
    freq: dict = {}
    for r in events_rows:
        freq[r.user_id] = freq.get(r.user_id, 0) + 1
    f2 = sum(v * v for v in freq.values())
    assert row.exact_f2 == f2
    assert row.n_users == len(freq)
    sz2 = 0
    for j in range(_AMS_K):
        z = 0
        for u, f in freq.items():
            h = hashlib.md5(f"{u}#{j}".encode()).hexdigest()
            z += f * (1 - 2 * (int(h[0], 16) % 2))
        sz2 += z * z
    assert row.ams_estimate == sz2 // _AMS_K
    # estimator quality: var(est) <= 2 F2^2 / K => |rel| < ~1 w.h.p.
    assert abs(row.rel_error) < 1.0


def test_exposure_parity_conservation(spark, sf_dir):
    rows = q_exposure_parity_ranking(spark, sf_dir).collect()
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.exposure_share for r in rows) - 1.0) < 1e-4
    by_rank = sorted(rows, key=lambda r: r.revenue_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.exposure_share >= b.exposure_share  # discount monotone
    # rank 1 always enjoys the largest exposure weight, so unless it
    # also has an outsized revenue share its disparity is the largest
    assert by_rank[0].exposure_share == max(r.exposure_share for r in rows)


def _ttt_v(gaps):
    g = sorted(gaps)
    n = len(g)
    pre, sv = 0, 0
    for k, gv in enumerate(g, start=1):
        pre += gv
        if k < n:
            sv += pre + (n - k) * gv
    return sv / pre, n


def test_ttt_matches_python(spark, sf_dir, events_rows):
    row = q_ttt_exponentiality(spark, sf_dir).collect()[0]
    by_day: dict = {}
    for r in events_rows:
        by_day.setdefault(r.day, []).append((r.us, r.event_id))
    gaps = []
    for rows in by_day.values():
        rows.sort()
        gaps.extend(b[0] - a[0] for a, b in zip(rows, rows[1:]))
    v, n = _ttt_v(gaps)
    assert row.n_gaps == n
    assert row.ttt_v == round(v, 6)
    assert row.z_exponentiality == round(
        (v - (n - 1) / 2.0) / math.sqrt((n - 1) / 12.0), 4
    ) + 0.0


def test_ttt_calibration_laws():
    # constant gaps: TTT_k = n*g for every k => V = n-1 (max aging)
    v, n = _ttt_v([1000] * 50)
    assert v == n - 1
    # exponential gaps (inverse-CDF of the sin-hash uniform): V near
    # the null mean (n-1)/2
    us = [
        (math.sin(t * 12.9898 + 78.233) * 43758.5453) % 1.0
        for t in range(1, 2001)
    ]
    v, n = _ttt_v([-math.log(1.0 - u) for u in us])
    mean, sd = (n - 1) / 2.0, math.sqrt((n - 1) / 12.0)
    assert abs(v - mean) < 4 * sd
