"""ext192: independent re-derivations -- a python Welch coherence with
the single-segment==1 law, BK filter algebra laws (exact zero sum,
symmetry, in-band vs out-of-band gain), a python g-chart replay, and a
brute-force exact-LAD fit with the planted-outlier robustness law."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext192 import (
    _BK_K,
    _BKW,
    _N_SEG,
    q_bk_bandpass_cycle,
    q_g_chart_rare_events,
    q_lad_median_regression,
    q_welch_coherence_weekly,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum", "*": "count"})
        .collect()
    )
    per = {
        r[0]: (int(round(r["sum(o_totalprice)"] * 100)), r["count(1)"])
        for r in rows
    }
    days = sorted(per)
    return [per[d][0] for d in days], [per[d][1] for d in days]


def _proj(vals, scale, n_seg):
    n = len(vals)
    segs = {}
    for t, v in enumerate(vals, start=1):
        s = ((t - 1) * n_seg) // n
        a, b = segs.setdefault(s, [0, 0])
        segs[s][0] += int(round(scale * v * math.cos(2 * math.pi * t / 7.0)))
        segs[s][1] += int(round(scale * v * math.sin(2 * math.pi * t / 7.0)))
    return segs


def _coherence(cents, cnts, n_seg):
    px = _proj(cents, 1.0e-4, n_seg)
    py = _proj(cnts, 10.0, n_seg)
    cxy = qxy = pxx = pyy = 0
    for s in px:
        ax, bx = px[s]
        ay, by = py[s]
        cxy += ax * ay + bx * by
        qxy += bx * ay - ax * by
        pxx += ax * ax + bx * bx
        pyy += ay * ay + by * by
    return (cxy * cxy + qxy * qxy) / (pxx * pyy)


def test_welch_coherence_matches_python(spark, sf_dir, daily):
    row = q_welch_coherence_weekly(spark, sf_dir).collect()[0]
    cents, cnts = daily
    coh = _coherence(cents, cnts, _N_SEG)
    assert row.coherence_sq == round(coh, 6)
    assert 0.0 <= row.coherence_sq <= 1.0
    # THE law: a single segment makes coherence identically 1
    assert abs(_coherence(cents, cnts, 1) - 1.0) < 1e-12


def test_bk_filter_laws():
    # exact zero sum (the quantization drift sits on the center tap)
    assert sum(_BKW) == 0
    # symmetry
    assert _BKW == _BKW[::-1]
    # frequency response: a 30-day sine (band center) passes with much
    # more gain than a 7-day sine (stop band) -- integer dot products
    def gain(period):
        num = den = 0.0
        for t in range(200, 400):
            cyc = sum(
                _BKW[j + _BK_K]
                * math.sin(2 * math.pi * (t + j) / period)
                for j in range(-_BK_K, _BK_K + 1)
            )
            num += cyc * cyc
            den += math.sin(2 * math.pi * t / period) ** 2
        return num / den / 1e24

    assert gain(30) > 0.5
    assert gain(7) < 0.05
    assert gain(200) < 0.05  # trend (low frequency) also blocked


def test_bk_constant_series_maps_to_zero():
    assert sum(w * 123456 for w in _BKW) == 0


def test_g_chart_matches_python(spark, sf_dir):
    row = q_g_chart_rare_events(spark, sf_dir).collect()[0]
    ids = sorted(
        r.event_id
        for r in read_table(spark, sf_dir, "events")
        .where("event_type = 'error'")
        .select("event_id")
        .collect()
    )
    gaps = [b - a - 1 for a, b in zip(ids, ids[1:])]
    mean = sum(gaps) / len(gaps)
    ucl = mean + 3.0 * math.sqrt(mean * (mean + 1.0))
    assert row.n_errors == len(ids)
    assert row.mean_gap_events == round(mean, 6)
    assert row.ucl == round(ucl, 4)
    assert row.max_gap_events == max(gaps)
    assert row.n_violations == sum(1 for g in gaps if g > ucl)


def _lad_exact(ys):
    n = len(ys)
    best = None
    for i in range(1, n + 1):
        for j in range(i + 1, n + 1):
            dy, dx = ys[j - 1] - ys[i - 1], j - i
            rs = sorted(
                (ys[k - 1] * dx - dy * k, k) for k in range(1, n + 1)
            )
            med = rs[(n + 1) // 2 - 1][0]
            o = sum(abs(r - med) for r, _ in rs)
            key = (o / dx, dx, i, j)
            if best is None or key < best[0]:
                best = (key, dy, dx, med, o)
    return best


def test_lad_matches_bruteforce(spark, sf_dir):
    row = q_lad_median_regression(spark, sf_dir).collect()[0]
    months = (
        read_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(date_trunc('month', o_orderdate) AS DATE) AS mo",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("mo")
        .agg({"cents": "sum"})
        .collect()
    )
    per = {r.mo: int(r["sum(cents)"]) for r in months}
    ys = [per[m] for m in sorted(per)]
    (_, dy, dx, med, o) = _lad_exact(ys)
    assert row.n_months == len(ys)
    assert row.lad_slope_dollars_per_month == round(dy / dx / 100.0, 2) + 0.0
    assert row.lad_intercept_dollars == round(med / dx / 100.0, 2) + 0.0
    assert row.mean_abs_dev_dollars == round(o / dx / len(ys) / 100.0, 2)


def test_lad_planted_outlier_robustness():
    """A clean line with two gross outliers: LAD recovers the planted
    slope exactly; OLS does not (the robustness raison d'etre)."""
    ys = [1000 + 37 * t for t in range(1, 41)]
    ys[5] += 100_000
    ys[30] -= 80_000
    (_, dy, dx, med, _) = _lad_exact(ys)
    assert dy / dx == 37.0
    # OLS slope for contrast
    n = len(ys)
    st = sum(range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    stt = sum(t * t for t in range(1, n + 1))
    ols = (n * sty - st * sy) / (n * stt - st * st)
    assert abs(ols - 37.0) > 5.0
