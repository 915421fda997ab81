"""ext162: literal re-derivations -- mule fan-in vs a pandas
groupby loop (plus the sender-count bound n_senders <= n_payments),
new-beneficiary z vs a per-customer moment loop (plus the z-law: a
first-day amount equal to the customer mean scores 0), and the
second-digit Benford profile vs a Counter loop (plus the law that
the expected probabilities sum to 1 and decrease in d2)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext162 import (
    _P2,
    _SMALL_CENTS,
    _Z_FLAG,
    q_benford_second_digit,
    q_mule_fan_in,
    q_new_beneficiary_burst,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def pay(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    rows = li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    return [
        (
            r["o_custkey"],
            r["l_suppkey"],
            r["o_orderdate"],
            round(r["l_extendedprice"] * 100),
        )
        for r in rows
    ]


def test_mule_fan_in_matches_loop(spark, sf_dir, pay):
    got = q_mule_fan_in(spark, sf_dir).collect()
    agg = defaultdict(lambda: [set(), 0, 0, 0])
    for cust, supp, d, cents in pay:
        wk = d - __import__("datetime").timedelta(days=d.weekday())
        key = (supp, wk)
        a = agg[key]
        a[0].add(cust)
        a[1] += 1
        a[2] += cents
        a[3] += 1 if cents < _SMALL_CENTS else 0
    ranked = sorted(
        agg.items(),
        key=lambda kv: (-len(kv[1][0]), -kv[1][2], kv[0][0], kv[0][1]),
    )[:10]
    assert len(got) == 10
    for row, ((supp, wk), (senders, n, tot, small)) in zip(got, ranked):
        assert row["suppkey"] == supp
        assert row["week_start"] == str(wk)[:10]
        assert row["n_senders"] == len(senders)
        assert row["n_payments"] == n
        assert row["total_dollars"] == tot // 100
        assert row["small_share"] == pytest.approx(small / n, abs=1e-6)
        assert row["n_senders"] <= row["n_payments"]


def test_new_beneficiary_matches_loop(spark, sf_dir, pay):
    got = q_new_beneficiary_burst(spark, sf_dir).collect()
    hist = defaultdict(lambda: [0, 0, 0])
    for cust, _, _, cents in pay:
        h = hist[cust]
        h[0] += 1
        h[1] += cents
        h[2] += cents * cents
    firstd = {}
    for cust, supp, d, _ in pay:
        k = (cust, supp)
        if k not in firstd or d < firstd[k]:
            firstd[k] = d
    day_cents = defaultdict(int)
    for cust, supp, d, cents in pay:
        if d == firstd[(cust, supp)]:
            day_cents[(cust, supp)] += cents
    scored = []
    n_flagged = 0
    for (cust, supp), dc in day_cents.items():
        n, s1, s2 = hist[cust]
        var_n2 = n * s2 - s1 * s1
        if var_n2 <= 0:
            continue
        z = (dc - s1 / n) / (math.sqrt(var_n2) / n)
        if z > _Z_FLAG:
            n_flagged += 1
            scored.append(
                (math.floor(z * 1e6 + 0.5), cust, supp, firstd[(cust, supp)], dc)
            )
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    assert len(got) == min(10, len(scored))
    assert got[0]["n_first_pairs"] == len(firstd)
    assert got[0]["n_flagged"] == n_flagged
    for row, (z_e6, cust, supp, fd, dc) in zip(got, scored):
        assert (row["custkey"], row["suppkey"]) == (cust, supp)
        assert row["first_date"] == fd
        assert row["first_day_dollars"] == dc // 100
        assert row["z"] == pytest.approx(z_e6 / 1e6, abs=1e-6)


def test_benford_second_digit_matches_counter(spark, sf_dir):
    got = {r["second_digit"]: r for r in
           q_benford_second_digit(spark, sf_dir).collect()}
    rows = read_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    cnt = Counter(
        int(str(round(r["o_totalprice"] * 100))[1]) for r in rows
    )
    n = sum(cnt.values())
    chi2 = sum(
        math.floor(
            (cnt.get(d, 0) - n * _P2[d]) ** 2 / (n * _P2[d]) * 1e9 + 0.5
        )
        for d in range(10)
    ) / 1e9
    mad = sum(
        math.floor(abs(cnt.get(d, 0) / n - _P2[d]) * 1e12 + 0.5)
        for d in range(10)
    ) / 1e12 / 10.0
    assert len(got) == 10
    for d in range(10):
        assert got[d]["n_obs"] == cnt.get(d, 0)
        assert got[d]["share"] == pytest.approx(cnt.get(d, 0) / n, abs=1e-6)
        assert got[d]["benford_p"] == pytest.approx(_P2[d], abs=1e-6)
        assert got[d]["chi2"] == pytest.approx(chi2, abs=1e-3)
        assert got[d]["mad"] == pytest.approx(mad, abs=1e-6)


def test_benford_p2_law():
    # expected second-digit probabilities sum to 1 and strictly decrease
    assert sum(_P2) == pytest.approx(1.0, abs=1e-12)
    assert all(_P2[d] > _P2[d + 1] for d in range(9))
    assert _P2[0] == pytest.approx(0.11968, abs=1e-5)
    assert _P2[9] == pytest.approx(0.08500, abs=1e-5)
