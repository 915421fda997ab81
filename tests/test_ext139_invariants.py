"""ext139: literal re-derivations -- Wilson-Hilferty quantiles checked
against scipy-free exact references (Garwood bounds re-derived through
an independent WH coding + a coverage sanity on the cube itself),
tolerance factor vs the Howe formula, and sample entropy from a plain
O(n^2) Python loop."""

from __future__ import annotations

import math
from statistics import NormalDist

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext139 import (
    q_garwood_poisson_ci,
    q_normal_tolerance_interval,
    q_sample_entropy_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_ND = NormalDist()


def _wh(p: float, df: float) -> float:
    z = _ND.inv_cdf(p)
    return df * (1 - 2 / (9 * df) + z * math.sqrt(2 / (9 * df))) ** 3


def test_wh_cube_against_known_chi2_quantiles():
    # textbook chi-square quantiles (R qchisq): the WH approximation
    # lands within ~0.02% at moderate df / upper tail and ~0.8% at the
    # small-df lower tail (its known weakest corner)
    known = {
        (0.975, 10): 20.4831,
        (0.025, 10): 3.2470,
        (0.95, 30): 43.7730,
        (0.05, 30): 18.4927,
    }
    for (p, df), q in known.items():
        assert _wh(p, df) == pytest.approx(q, rel=1e-2)
    assert _wh(0.975, 10) == pytest.approx(known[(0.975, 10)], rel=2e-4)


def test_garwood_matches_literal(spark, sf_dir):
    rows = {r["event_type"]: r for r in q_garwood_poisson_ci(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    from collections import Counter

    k = Counter(r["event_type"] for r in ev)
    days = len({r["ts"].date() for r in ev})
    assert set(rows) == set(k)
    for t, row in rows.items():
        assert row["n_events"] == k[t]
        assert row["n_days"] == days
        assert row["rate_per_day"] == pytest.approx(k[t] / days, abs=1e-6)
        assert row["rate_lo_95"] == pytest.approx(
            _wh(0.025, 2 * k[t]) / 2 / days, rel=1e-6
        )
        assert row["rate_hi_95"] == pytest.approx(
            _wh(0.975, 2 * k[t] + 2) / 2 / days, rel=1e-6
        )
        # the interval must bracket the point rate
        assert row["rate_lo_95"] < row["rate_per_day"] < row["rate_hi_95"]


def test_tolerance_interval_matches_howe(spark, sf_dir):
    row = q_normal_tolerance_interval(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    xs = [round(r[1] * 100) for r in daily]
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in xs) / (n - 1))
    k2 = _ND.inv_cdf(0.995) * math.sqrt(
        (n - 1) * (1 + 1 / n) / _wh(0.05, n - 1)
    )
    assert row["n_days"] == n
    assert row["mean_dollars"] == pytest.approx(mean / 100, abs=0.01)
    assert row["sd_dollars"] == pytest.approx(sd / 100, abs=0.01)
    assert row["k2_factor"] == pytest.approx(k2, rel=1e-6)
    assert row["tol_lo_dollars"] == pytest.approx((mean - k2 * sd) / 100, abs=0.02)
    assert row["tol_hi_dollars"] == pytest.approx((mean + k2 * sd) / 100, abs=0.02)
    # tolerance interval must be wider than the 99% population z-range
    assert k2 > 2.5758293035489


def test_sample_entropy_matches_literal(spark, sf_dir):
    row = q_sample_entropy_daily(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    n = len(xs)
    # population sd exactly as the query: sqrt(n*sxx - sx^2)/n
    sx = sum(xs)
    sxx = sum(v * v for v in xs)
    r_int = math.floor(0.2 * math.sqrt(n * sxx - sx * sx) / n)
    tpl = [(xs[i], xs[i + 1], xs[i + 2]) for i in range(n - 2)]
    b_m = a_m = 0
    for i in range(len(tpl)):
        for j in range(i + 1, len(tpl)):
            if (
                abs(tpl[i][0] - tpl[j][0]) <= r_int
                and abs(tpl[i][1] - tpl[j][1]) <= r_int
            ):
                b_m += 1
                if abs(tpl[i][2] - tpl[j][2]) <= r_int:
                    a_m += 1
    assert row["n_days"] == n
    assert row["r_cents"] == r_int
    assert row["template_matches_m2"] == b_m
    assert row["template_matches_m3"] == a_m
    assert row["sample_entropy"] == pytest.approx(-math.log(a_m / b_m), abs=1e-6)
