"""ext165: literal re-derivations -- Lomb-Scargle vs a numpy loop on
the SAME quantization recipe, plus the planted-tone law on an
IRREGULAR grid (delete a third of the samples and LS still finds the
injected cycle); spectral flatness vs a direct DFT loop plus the
flatness <= 1 (AM-GM) law; Teager-Kaiser vs the pointwise definition
plus the constant-series law Psi == 0 and pure-tone law
Psi = A^2 sin^2(w) constant."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext165 import (
    _K_FLAT,
    _PERIODS,
    _PI,
    q_lomb_scargle_power,
    q_spectral_flatness,
    q_teager_kaiser_energy,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    return [per[d] for d in sorted(per)]


def _ls_power(ts, ys, period):
    """Lomb-Scargle with the query's exact quantization recipe.
    ts: 1-based integer sample times; ys: integer values."""
    n = len(ys)
    s_tot = sum(ys)
    us = [y * n - s_tot for y in ys]
    w = 2.0 * _PI / period
    s2 = sum(round(math.sin(2.0 * w * t) * 1e6) for t in ts)
    c2 = sum(round(math.cos(2.0 * w * t) * 1e6) for t in ts)
    tau = math.atan2(s2, c2) / (2.0 * w)
    uu = sum(round(1e-6 * u * u) for u in us)
    sa = sum(
        round(1e-3 * u * math.cos(w * (t - tau))) for t, u in zip(ts, us)
    )
    sb = sum(
        round(1e-3 * u * math.sin(w * (t - tau))) for t, u in zip(ts, us)
    )
    scc = sum(
        round(math.cos(w * (t - tau)) ** 2 * 1e6) for t in ts
    )
    sss = sum(
        round(math.sin(w * (t - tau)) ** 2 * 1e6) for t in ts
    )
    return 0.5 * (sa * sa / (scc / 1e6) + sb * sb / (sss / 1e6)) / (uu / n)


def test_ls_matches_loop(spark, sf_dir, series):
    rows = {r["period_days"]: r for r in
            q_lomb_scargle_power(spark, sf_dir).collect()}
    ts = list(range(1, len(series) + 1))
    for p in _PERIODS:
        expect = _ls_power(ts, series, p)
        assert rows[p]["power_norm"] == pytest.approx(expect, rel=1e-3)
        assert rows[p]["power_norm"] >= 0


def test_ls_planted_tone_irregular_grid():
    # inject a 7-day tone, delete every 3rd sample: LS still finds it
    full = [(t, 100000 + round(50000 * math.sin(2 * _PI * t / 7)))
            for t in range(1, 301)]
    kept = [(t, y) for t, y in full if t % 3 != 0]
    ts = [t for t, _ in kept]
    ys = [y for _, y in kept]
    p7 = _ls_power(ts, ys, 7)
    p11 = _ls_power(ts, ys, 11)
    assert p7 > 30  # overwhelming power at the planted period
    assert p11 < 5


def test_flatness_matches_loop_and_amgm(spark, sf_dir, series):
    row = q_spectral_flatness(spark, sf_dir).collect()[0]
    n = len(series)
    pks = []
    for k in range(1, _K_FLAT + 1):
        ck = sum(
            round(0.001 * c * math.cos(2 * _PI * k * i / n))
            for i, c in enumerate(series, 1)
        )
        sk = sum(
            round(0.001 * c * math.sin(2 * _PI * k * i / n))
            for i, c in enumerate(series, 1)
        )
        pks.append(float(ck * ck + sk * sk))
    lnq = [math.floor(math.log(p) * 1e9 + 0.5) for p in pks]
    pq = [math.floor(p * 1e-6 + 0.5) for p in pks]
    flat = math.exp(sum(lnq) / 1e9 / len(pks)) / (sum(pq) * 1e6 / len(pks))
    peak = max(range(len(pq)), key=lambda i: (pq[i], -i)) + 1
    assert row["n_freqs"] == _K_FLAT
    assert row["flatness"] == pytest.approx(flat, abs=1e-5)
    assert row["flatness"] <= 1.0 + 1e-9  # AM-GM
    assert row["peak_k"] == peak
    assert row["peak_to_mean"] == pytest.approx(
        max(pq) / (sum(pq) / len(pq)), rel=1e-3
    )


def test_teager_matches_pointwise(spark, sf_dir, series):
    row = q_teager_kaiser_energy(spark, sf_dir).collect()[0]
    xs = [v // 100 for v in series]
    es = [
        xs[t] * xs[t] - xs[t - 1] * xs[t + 1]
        for t in range(1, len(xs) - 1)
    ]
    assert row["n_days"] == len(es)
    assert row["mean_tke_dollars2"] == pytest.approx(
        sum(es) / len(es), abs=0.01
    )
    assert row["negative_share"] == pytest.approx(
        sum(1 for e in es if e < 0) / len(es), abs=1e-6
    )
    assert row["max_tke_dollars2"] == max(es)


def test_teager_laws():
    # constant series: Psi == 0; pure tone: Psi == A^2 sin^2(w) constant
    const = [7] * 10
    assert all(
        const[t] ** 2 - const[t - 1] * const[t + 1] == 0
        for t in range(1, 9)
    )
    a_mp, w = 3.0, 0.7
    tone = [a_mp * math.cos(w * t) for t in range(50)]
    psis = [
        tone[t] ** 2 - tone[t - 1] * tone[t + 1] for t in range(1, 49)
    ]
    expect = a_mp * a_mp * math.sin(w) ** 2
    assert all(p == pytest.approx(expect, rel=1e-9) for p in psis)
