"""ext127: literal re-derivations -- spectral entropy via raw-float
DFT, DTW via an independent full-matrix python DP."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext127 import (
    _K_FREQ,
    q_dtw_weekday_profiles,
    q_spectral_entropy_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_spectral_entropy_matches_raw_dft(spark, sf_dir):
    got = q_spectral_entropy_daily(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily = defaultdict(int)
    for r in orders:
        daily[r["o_orderdate"]] += round(r["o_totalprice"] * 100)
    d0 = min(daily)
    n = len(daily)
    assert got["n_days"] == n
    t = np.array([(d - d0).days for d in daily], dtype=np.float64)
    y = np.array([daily[d] for d in daily], dtype=np.float64)
    powers = []
    for k in range(1, _K_FREQ + 1):
        sc = (y * np.cos(2 * np.pi * k * t / n)).sum()
        ss = (y * np.sin(2 * np.pi * k * t / n)).sum()
        powers.append(sc * sc + ss * ss)
    p = np.array(powers) / sum(powers)
    h = float(-(p * np.log(p)).sum())
    assert got["spectral_entropy"] == pytest.approx(h, abs=1e-4)
    assert got["normalized_entropy"] == pytest.approx(
        h / math.log(_K_FREQ), abs=1e-4
    )
    assert 0.0 <= got["normalized_entropy"] <= 1.0
    assert got["dominant_k"] == int(np.argmax(powers)) + 1


def test_dtw_matches_full_matrix_dp(spark, sf_dir):
    got = q_dtw_weekday_profiles(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    import datetime

    anchor = datetime.date(1992, 1, 6)
    daily = defaultdict(int)
    for r in orders:
        d = r["o_orderdate"]
        if isinstance(d, datetime.datetime):
            d = d.date()
        daily[d] += round(r["o_totalprice"] * 100)
    y1 = max(d.year for d in daily) - 1

    def profile(yr):
        per = defaultdict(lambda: [0, 0])
        for d, cents in daily.items():
            if d.year == yr:
                dow = (d - anchor).days % 7
                per[dow][0] += cents
                per[dow][1] += 1
        return [per[k][0] // per[k][1] for k in sorted(per)]

    a, b = profile(y1), profile(y1 - 1)
    assert len(a) == 7 and len(b) == 7
    n, m = len(a), len(b)
    INF = float("inf")
    d = [[INF] * (m + 1) for _ in range(n + 1)]
    d[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]
            )
    l1 = sum(abs(x - z) for x, z in zip(a, b))
    assert got["year_a"] == y1
    assert got["dtw_dollars"] == pytest.approx(d[n][m] / 100, abs=0.01)
    assert got["l1_dollars"] == pytest.approx(l1 / 100, abs=0.01)
    assert got["alignment_gain_dollars"] == pytest.approx(
        (l1 - d[n][m]) / 100, abs=0.01
    )
    # DTW can only help: aligned cost never exceeds the rigid L1
    assert got["alignment_gain_dollars"] >= -1e-9
