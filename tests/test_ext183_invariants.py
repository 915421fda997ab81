"""ext183: literal re-derivations -- Henderson vs the weight-dot loop
PLUS the defining filter laws (weights sum to 16796/16796 and the
filter passes any CUBIC through unchanged while killing white noise
variance to sum(w^2) ~ 0.19 of the input), Cochrane-Orcutt vs the
staged loop on the exact same quantizations (plus the rho = 0 law:
quasi-differencing with rho -> 0 reproduces OLS exactly, and an
AR(1)-planted fixture where the correction moves the slope toward
truth), and Pickands vs the sorted loop (plus the regime law:
Pareto-tail fixture reads xi ~ 1/alpha > 0, bounded-uniform fixture
reads xi < 0)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext183 import (
    _H13_DEN,
    _H13_NUM,
    _PICK_K,
    q_cochrane_orcutt,
    q_henderson_trend,
    q_pickands_tail_index,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _monthly(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') AS m",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("m")
        .sum("cents")
        .collect()
    )
    return sorted((r[0], r[1] // 100) for r in rows)


def test_henderson_matches_loop(spark, sf_dir):
    got = {
        r["month"]: r for r in q_henderson_trend(spark, sf_dir).collect()
    }
    mon = _monthly(spark, sf_dir)
    vs = [v for _, v in mon]
    n = len(vs)
    assert len(got) == n - 12
    for t in range(6, n - 6):
        num = sum(
            _H13_NUM[j + 6] * vs[t + j] for j in range(-6, 7)
        )
        m = mon[t][0]
        assert got[m]["revenue_dollars"] == vs[t]
        assert got[m]["trend_dollars"] == pytest.approx(
            num / _H13_DEN, abs=0.01
        )
        assert got[m]["cycle_dollars"] == pytest.approx(
            vs[t] - num / _H13_DEN, abs=0.01
        )


def test_henderson_filter_laws():
    assert sum(_H13_NUM) == _H13_DEN
    for k in (1, 2, 3):
        assert sum(j**k * _H13_NUM[j + 6] for j in range(-6, 7)) == 0
    # cubic-reproduction: the filtered value of p(t) equals p(t)
    p = lambda t: 2 * t**3 - 5 * t**2 + 7 * t - 3
    for t in (10, 25):
        num = sum(
            _H13_NUM[j + 6] * p(t + j) for j in range(-6, 7)
        )
        assert num == _H13_DEN * p(t)
    # noise-damping: white-noise variance gain = sum w^2 ~ 0.204
    gain = sum((w / _H13_DEN) ** 2 for w in _H13_NUM)
    assert 0.19 < gain < 0.21


def _co_loop(vs):
    n = len(vs)
    xs = list(range(1, n + 1))
    sx, sy = sum(xs), sum(vs)
    sxx = sum(i * i for i in xs)
    sxy = sum(i * v for i, v in zip(xs, vs))
    dd = n * sxx - sx * sx
    bb = n * sxy - sx * sy
    r = [
        math.floor(
            float(n * dd * v - dd * sy + bb * sx - n * bb * i)
            / float(n * dd)
            * 100.0
            + 0.5
        )
        for i, v in zip(xs, vs)
    ]
    num = sum(r[t] * r[t - 1] for t in range(1, n))
    den = sum(r[t - 1] * r[t - 1] for t in range(1, n))
    rho = num / den
    qx = qy = qxx = qxy = 0
    for t in range(1, n):
        ysv = vs[t] - rho * vs[t - 1]
        xsv = xs[t] - rho * xs[t - 1]
        qx += math.floor(xsv * 1e6 + 0.5)
        qy += math.floor(ysv * 1e3 + 0.5)
        qxx += math.floor(xsv * xsv * 1e6 + 0.5)
        qxy += math.floor(xsv * ysv * 1e3 + 0.5)
    m = n - 1
    slope_co = (m * (qxy * 1e-3) - (qx * 1e-6) * (qy * 1e-3)) / (
        m * (qxx * 1e-6) - (qx * 1e-6) ** 2
    )
    return rho, bb / dd, slope_co


def test_cochrane_orcutt_matches_loop(spark, sf_dir):
    row = q_cochrane_orcutt(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    daily = sorted((r[0], round(r[1] * 100) // 100) for r in rows)
    vs = [v for _, v in daily]
    rho, b_ols, b_co = _co_loop(vs)
    assert row["n_days"] == len(vs)
    assert row["rho_hat"] == pytest.approx(rho, abs=1e-5)
    assert row["slope_ols"] == pytest.approx(b_ols, abs=1e-5)
    assert row["slope_co"] == pytest.approx(b_co, abs=1e-4)


def test_cochrane_orcutt_laws():
    # deterministic sin-hash noise (serially uncorrelated, unlike a
    # modular ramp or a Weyl sequence, which are)
    def noise(t):
        x = math.sin(t * 12.9898 + 78.233) * 43758.5453
        return (x - math.floor(x) - 0.5) * 1000

    # AR(1)-planted fixture: y_t = 10 t + 5 u_t, u_t = 0.8 u_{t-1} + e
    n = 400
    u, vs = 0.0, []
    for t in range(1, n + 1):
        u = 0.8 * u + noise(t)
        vs.append(int(round(10 * t + 5 * u)) + 100000)
    rho, b_ols, b_co = _co_loop(vs)
    assert rho > 0.5  # the planted persistence is detected
    assert b_co == pytest.approx(10, abs=1.0)
    # rho ~ 0 on white noise: correction reproduces OLS nearly exactly
    ws = [100000 + 10 * t + int(noise(t)) for t in range(1, 301)]
    rho_w, b_ols_w, b_co_w = _co_loop(ws)
    assert abs(rho_w) < 0.2
    assert b_co_w == pytest.approx(b_ols_w, abs=0.2)


def test_pickands_matches_loop(spark, sf_dir):
    row = q_pickands_tail_index(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v"
        )
        .collect()
    )
    vs = sorted((r[0] for r in rows), reverse=True)
    k = _PICK_K
    xk, x2k, x4k = vs[k - 1], vs[2 * k - 1], vs[4 * k - 1]
    assert row["xk_cents"] == xk
    assert row["x2k_cents"] == x2k
    assert row["x4k_cents"] == x4k
    expect = math.log((xk - x2k) / (x2k - x4k)) / math.log(2.0)
    assert row["xi_hat"] == pytest.approx(expect, abs=1e-6)
    # bounded order totals: finite-endpoint regime
    assert row["xi_hat"] < 0.5


def test_pickands_regime_law():
    # Pareto(alpha=2) quantile grid: xi should read ~ 1/2
    n, k = 4096, 64
    vs = sorted(
        ((n + 1) / i) ** 0.5 for i in range(1, n + 1)
    )[::-1]
    xk, x2k, x4k = vs[k - 1], vs[2 * k - 1], vs[4 * k - 1]
    xi = math.log((xk - x2k) / (x2k - x4k)) / math.log(2.0)
    assert xi == pytest.approx(0.5, abs=0.05)
    # bounded uniform: xi ~ -1
    us = sorted((1.0 - i / (n + 1) for i in range(1, n + 1)), reverse=True)
    xk, x2k, x4k = us[k - 1], us[2 * k - 1], us[4 * k - 1]
    xi_u = math.log((xk - x2k) / (x2k - x4k)) / math.log(2.0)
    assert xi_u == pytest.approx(-1.0, abs=0.1)
