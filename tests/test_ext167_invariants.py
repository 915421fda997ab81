"""ext167: literal re-derivations -- g-formula vs a pandas bin loop
(plus the no-confounding law: identical bin distributions => ATE_std
== raw diff), AIPW vs a per-row influence loop (plus the doubly
robust identity: with SATURATED-in-bin models AND exact bin
propensities, AIPW == g-formula with constant outcome models), and
the E-value closed form (plus the RR=1 => E=1 null law and
monotonicity)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext167 import (
    q_aipw_doubly_robust,
    q_evalue_sensitivity,
    q_gformula_standardization,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    data = orders.join(cust, orders.o_custkey == cust.c_custkey).collect()
    out = []
    for r in data:
        y = round(r["o_totalprice"] * 100)
        t = 1 if r["o_orderpriority"] == "1-URGENT" else 0
        x = round(r["c_acctbal"] * 100)
        b = min(max(math.floor((x + 100000) / 110000.0), 0), 9)
        out.append((y, t, x, b))
    return out


def _ok_bins(rows):
    per = defaultdict(lambda: defaultdict(int))
    for y, t, x, b in rows:
        per[b][t] += 1
    return {
        b
        for b, arms in per.items()
        if len(arms) == 2 and min(arms.values()) >= 2
    }


def test_gformula_matches_loop(spark, sf_dir, rows):
    row = q_gformula_standardization(spark, sf_dir).collect()[0]
    ok = _ok_bins(rows)
    sums = defaultdict(lambda: [0, 0, 0, 0])  # sy1, n1, sy0, n0
    for y, t, x, b in rows:
        if b not in ok:
            continue
        a = sums[b]
        if t == 1:
            a[0] += y
            a[1] += 1
        else:
            a[2] += y
            a[3] += 1
    n_used = sum(a[1] + a[3] for a in sums.values())
    s_e3 = sum(
        math.floor(
            (a[0] / a[1] - a[2] / a[3]) * (a[1] + a[3]) * 1e3 + 0.5
        )
        for a in sums.values()
    )
    ate = s_e3 / 1e3 / n_used
    y1 = [y for y, t, _, _ in rows if t == 1]
    y0 = [y for y, t, _, _ in rows if t == 0]
    raw = sum(y1) / len(y1) - sum(y0) / len(y0)
    assert row["n_orders"] == len(rows)
    assert row["n_used"] == n_used
    assert row["n_bins"] == len(sums)
    assert row["ate_std_dollars"] == pytest.approx(ate / 100, abs=0.02)
    assert row["raw_diff_dollars"] == pytest.approx(raw / 100, abs=0.02)
    assert row["confounding_bias_dollars"] == pytest.approx(
        (raw - ate) / 100, abs=0.03
    )


def test_aipw_matches_influence_loop(spark, sf_dir, rows):
    row = q_aipw_doubly_robust(spark, sf_dir).collect()[0]
    ok = _ok_bins(rows)
    mom = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxx, sxy
    for y, t, x, b in rows:
        if b not in ok:
            continue
        m = mom[(b, t)]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * x
        m[4] += x * y
    coef = {}
    for (b, t), (n, sx, sy, sxx, sxy) in mom.items():
        den = n * sxx - sx * sx
        sl = (n * sxy - sx * sy) / den if den > 0 else 0.0
        coef[(b, t)] = (sl, (sy - sl * sx) / n)
    prop = {
        b: mom[(b, 1)][0] / (mom[(b, 1)][0] + mom[(b, 0)][0])
        for b in ok
    }
    fs = []
    for y, t, x, b in rows:
        if b not in ok:
            continue
        sl1, ic1 = coef[(b, 1)]
        sl0, ic0 = coef[(b, 0)]
        m1, m0 = ic1 + sl1 * x, ic0 + sl0 * x
        e = prop[b]
        f = m1 - m0 + t * (y - m1) / e - (1 - t) * (y - m0) / (1 - e)
        fs.append(math.floor(f * 1e3 + 0.5))
    n = len(fs)
    mean = sum(fs) / 1e3 / n
    var = sum(v * v for v in fs) / 1e6 / n - mean * mean
    assert row["n_used"] == n
    assert row["ate_aipw_dollars"] == pytest.approx(mean / 100, abs=0.02)
    assert row["se_dollars"] == pytest.approx(
        math.sqrt(var / n) / 100, abs=0.02
    )


def test_aipw_equals_gformula_when_models_saturated():
    # constant-in-bin outcome models + exact bin propensities: the
    # augmentation terms cancel in-bin and AIPW == standardization
    rows = [
        (100, 1, 0), (120, 1, 0), (80, 0, 0), (90, 0, 0),
        (300, 1, 1), (260, 0, 1), (240, 0, 1), (280, 1, 1),
    ]  # (y, t, b)
    per = defaultdict(lambda: defaultdict(list))
    for y, t, b in rows:
        per[b][t].append(y)
    # standardization
    n_tot = len(rows)
    ate_std = sum(
        (sum(d[1]) / len(d[1]) - sum(d[0]) / len(d[0]))
        * (len(d[0]) + len(d[1]))
        for d in per.values()
    ) / n_tot
    # AIPW with constant models m_t = bin-arm mean, e = bin fraction
    fs = []
    for y, t, b in rows:
        d = per[b]
        m1, m0 = sum(d[1]) / len(d[1]), sum(d[0]) / len(d[0])
        e = len(d[1]) / (len(d[0]) + len(d[1]))
        fs.append(m1 - m0 + t * (y - m1) / e - (1 - t) * (y - m0) / (1 - e))
    assert sum(fs) / len(fs) == pytest.approx(ate_std, abs=1e-12)


def test_evalue_matches_closed_form(spark, sf_dir):
    row = q_evalue_sensitivity(spark, sf_dir).collect()[0]
    rr = row["risk_ratio"]
    rr_star = rr if rr >= 1 else 1 / rr
    assert row["e_value"] == pytest.approx(
        rr_star + math.sqrt(rr_star * (rr_star - 1)), abs=1e-3
    )
    assert row["e_value"] >= rr_star


def test_evalue_null_and_monotone_laws():
    def ev(rr):
        rs = rr if rr >= 1 else 1 / rr
        return rs + math.sqrt(rs * (rs - 1))

    assert ev(1.0) == 1.0
    vals = [ev(r) for r in (1.1, 1.5, 2.0, 4.0)]
    assert vals == sorted(vals)
    assert ev(2.0) == pytest.approx(2 + math.sqrt(2), abs=1e-12)
    assert ev(0.5) == ev(2.0)  # symmetric in direction
