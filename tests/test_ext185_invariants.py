"""ext185: effect-size re-derivations -- the ANOVA effect sizes vs
the group-moment loop (plus the ordering law omega^2 <= eta^2 with
equality only in the no-noise limit, and the null law: omega^2 of a
label-free fixture sits near 0 while eta^2 stays positive -- the
bias the omega correction removes), and Hedges' g vs the two-group
loop (plus J < 1, g = J * d, and the planted-shift law: a known
1-sigma shift reads d ~ 1)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext185 import (
    q_anova_effect_sizes,
    q_hedges_g_weekend,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_anova_effect_sizes_matches_loop(spark, sf_dir):
    row = q_anova_effect_sizes(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .selectExpr(
            "dayofweek(o_orderdate) % 7 AS dow",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) DIV 100 AS c",
        )
        .collect()
    )
    g = {}
    for r in rows:
        n, s, q = g.get(r[0], (0, 0, 0))
        g[r[0]] = (n + 1, s + r[1], q + r[1] * r[1])
    nn = sum(v[0] for v in g.values())
    ss = sum(v[1] for v in g.values())
    qq = sum(v[2] for v in g.values())
    wbs = sum(round(v[1] * v[1] / v[0]) for v in g.values())
    grand = round(ss * ss / nn)
    k = len(g)
    ssb, sst, ssw = wbs - grand, qq - grand, qq - wbs
    msw = ssw / (nn - k)
    assert row["n_orders"] == nn
    assert row["n_groups"] == k
    assert row["eta_squared"] == pytest.approx(ssb / sst, abs=1e-6)
    assert row["omega_squared"] == pytest.approx(
        (ssb - (k - 1) * msw) / (sst + msw), abs=1e-6
    )
    assert row["cohens_f"] == pytest.approx(
        math.sqrt(ssb / ssw), abs=1e-6
    )
    # ordering law: the unbiased estimate never exceeds eta^2
    assert row["omega_squared"] <= row["eta_squared"] + 1e-12


def test_anova_null_bias_law():
    # label-free fixture: values independent of group label
    vals = [((7 * i * i + 5 * i) % 101) for i in range(700)]
    g = {}
    for i, v in enumerate(vals):
        lab = i % 7
        n, s, q = g.get(lab, (0, 0, 0))
        g[lab] = (n + 1, s + v, q + v * v)
    nn = sum(v[0] for v in g.values())
    ss = sum(v[1] for v in g.values())
    qq = sum(v[2] for v in g.values())
    wbs = sum(v[1] * v[1] / v[0] for v in g.values())
    grand = ss * ss / nn
    k = len(g)
    ssb, sst, ssw = wbs - grand, qq - grand, qq - wbs
    msw = ssw / (nn - k)
    eta = ssb / sst
    omega = (ssb - (k - 1) * msw) / (sst + msw)
    assert eta > 0.0  # biased upward even under the null
    assert omega <= eta  # the correction only ever pulls DOWN
    assert abs(omega) < 0.02  # and lands near the true 0


def test_hedges_g_matches_loop(spark, sf_dir):
    row = q_hedges_g_weekend(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    import datetime

    monday = datetime.date(1992, 1, 6)
    g = {0: [0, 0, 0], 1: [0, 0, 0]}
    for d, tot in ((r[0], round(r[1] * 100) // 100) for r in rows):
        dd = datetime.date(d.year, d.month, d.day)
        wk = 1 if ((dd - monday).days % 7 + 7) % 7 >= 5 else 0
        g[wk][0] += 1
        g[wk][1] += tot
        g[wk][2] += tot * tot
    n1, s1, q1 = g[1]
    n0, s0, q0 = g[0]
    m1, m0 = s1 / n1, s0 / n0
    sp = math.sqrt(
        ((q1 - s1 * s1 / n1) + (q0 - s0 * s0 / n0)) / (n1 + n0 - 2)
    )
    d = (m1 - m0) / sp
    j = 1 - 3 / (4 * (n1 + n0 - 2) - 1)
    assert row["n_weekend"] == n1
    assert row["n_weekday"] == n0
    assert row["mean_diff_dollars"] == pytest.approx(m1 - m0, abs=0.01)
    assert row["cohens_d"] == pytest.approx(d, abs=1e-5)
    assert row["correction"] == pytest.approx(j, abs=1e-6)
    assert row["hedges_g"] == pytest.approx(j * d, abs=1e-5)
    # 2/7 of days are weekend
    assert n1 / (n1 + n0) == pytest.approx(2 / 7, abs=0.01)
    assert 0 < row["correction"] < 1
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"])


def test_hedges_planted_shift_law():
    # two groups, exact 1-pooled-sigma shift: d reads ~ 1
    a = [10 + ((3 * i) % 11) for i in range(120)]  # spread fixture
    b = [x + 3.2 for x in a]  # shift by ~1 sd of the fixture
    n1, n0 = len(b), len(a)
    m1, m0 = sum(b) / n1, sum(a) / n0
    q1 = sum(x * x for x in b)
    q0 = sum(x * x for x in a)
    sp = math.sqrt(
        ((q1 - n1 * m1 * m1) + (q0 - n0 * m0 * m0)) / (n1 + n0 - 2)
    )
    d = (m1 - m0) / sp
    assert d == pytest.approx(3.2 / sp, rel=1e-12)
    assert 0.8 < d < 1.25
    j = 1 - 3 / (4 * (n1 + n0 - 2) - 1)
    assert j < 1 and j * d < d
