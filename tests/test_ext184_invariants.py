"""ext184: literal re-derivations -- the theta-sketch intersection vs
a hashlib loop on the exact same 48-bit prefixes (plus the estimator
law: on a planted universe the KMV estimate lands within the
published ~1/sqrt(k) relative-error band of the true intersection),
Fisher vs the basket loop (plus the index laws: L >= F >= P ordering
under the Cauchy-Schwarz-style mean inequality does NOT hold
pointwise but F^2 = L*P does exactly, the base month reads exactly
1.0 on all three, and Fisher satisfies the time-reversal test on a
two-period fixture), and the tracking signal vs the error loop (plus
the bias law: an unbiased-error fixture never alarms, a drifting one
walks |TS| past 4)."""

from __future__ import annotations

import hashlib
import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext184 import (
    _K_SKETCH,
    q_fisher_ideal_index,
    q_theta_sketch_intersection,
    q_tracking_signal,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_TWO48 = float(1 << 48)


def _h48(uid):
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)


def _theta_est(a_ids, b_ids, k_cap=_K_SKETCH):
    ha = sorted(_h48(u) for u in a_ids)
    hb = sorted(_h48(u) for u in b_ids)
    k = min(k_cap, len(ha), len(hb))
    ska, skb = set(ha[:k]), set(hb[:k])
    th = min(ha[k - 1], hb[k - 1])
    c = sum(1 for h in ska & skb if h < th)
    u = sum(1 for h in ska | skb if h < th)
    return k, th, c, u, c * _TWO48 / th


def test_theta_sketch_matches_loop(spark, sf_dir):
    row = q_theta_sketch_intersection(spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .where("event_type in ('purchase', 'error')")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    a = {r[1] for r in ev if r[0] == "purchase"}
    b = {r[1] for r in ev if r[0] == "error"}
    k, th, c, u, est = _theta_est(a, b)
    x = len(a & b)
    assert row["k_eff"] == k
    assert row["exact_intersection"] == x
    assert row["est_intersection"] == pytest.approx(est, abs=0.01)
    assert row["exact_jaccard"] == pytest.approx(
        x / len(a | b), abs=1e-6
    )
    assert row["est_jaccard"] == pytest.approx(
        (c / u) if u else 0.0, abs=1e-6
    )


def test_theta_sketch_estimator_law():
    # planted universe: A = 0..999, B = 500..1499, true overlap 500
    a = range(1000)
    b = range(500, 1500)
    k, th, c, u, est = _theta_est(a, b, k_cap=128)
    assert k == 128
    # KMV relative error ~ 1/sqrt(k) ~ 9%; allow 3 bands
    assert est == pytest.approx(500, rel=0.27)
    # the sampled Jaccard tracks the true 1/3 the same way
    assert (c / u) == pytest.approx(1 / 3, abs=0.15)


@pytest.fixture(scope="module")
def baskets(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    p = read_table(spark, sf_dir, "part")
    rows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(p, p.p_partkey == li.l_partkey)
        .selectExpr(
            "date_format(o_orderdate, 'yyyy-MM') AS m",
            "p_brand AS b",
            "CAST(l_quantity AS BIGINT) AS q",
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v",
        )
        .groupBy("m", "b")
        .sum("q", "v")
        .collect()
    )
    out = {}
    for r in rows:
        out.setdefault(r["m"], {})[r["b"]] = (r[2], r[3])
    return out


def test_fisher_matches_loop(spark, sf_dir, baskets):
    got = {
        r["month"]: r for r in q_fisher_ideal_index(spark, sf_dir).collect()
    }
    m0 = min(baskets)
    base = baskets[m0]
    assert set(got) == set(baskets)
    for m, cur in baskets.items():
        common = sorted(set(cur) & set(base))
        ln = ld = pn = pd_ = 0
        for b in common:
            q0, v0 = base[b]
            qt, vt = cur[b]
            ln += math.floor(q0 * vt / qt * 1e3 + 0.5)
            ld += math.floor(q0 * v0 / q0 * 1e3 + 0.5)
            pn += math.floor(qt * vt / qt * 1e3 + 0.5)
            pd_ += math.floor(qt * v0 / q0 * 1e3 + 0.5)
        lasp, paas = ln / ld, pn / pd_
        assert got[m]["n_brands"] == len(common)
        assert got[m]["laspeyres"] == pytest.approx(lasp, abs=1e-5)
        assert got[m]["paasche"] == pytest.approx(paas, abs=1e-5)
        assert got[m]["fisher"] == pytest.approx(
            math.sqrt(lasp * paas), abs=1e-5
        )
    # base month: all three indices read exactly 1
    assert got[m0]["laspeyres"] == pytest.approx(1.0, abs=1e-5)
    assert got[m0]["paasche"] == pytest.approx(1.0, abs=1e-5)
    assert got[m0]["fisher"] == pytest.approx(1.0, abs=1e-5)


def test_fisher_time_reversal_law():
    # two periods, two goods: F(0->1) * F(1->0) == 1 (L and P fail it)
    p0, q0 = {"x": 10.0, "y": 20.0}, {"x": 8, "y": 2}
    p1, q1 = {"x": 30.0, "y": 10.0}, {"x": 2, "y": 8}

    def lp(pa, qa, pb, qb):
        # Laspeyres of b vs a, Paasche of b vs a
        l = sum(qa[g] * pb[g] for g in pa) / sum(
            qa[g] * pa[g] for g in pa
        )
        p = sum(qb[g] * pb[g] for g in pa) / sum(
            qb[g] * pa[g] for g in pa
        )
        return l, p

    l01, p01 = lp(p0, q0, p1, q1)
    l10, p10 = lp(p1, q1, p0, q0)
    f01 = math.sqrt(l01 * p01)
    f10 = math.sqrt(l10 * p10)
    assert f01 * f10 == pytest.approx(1.0, rel=1e-12)
    assert l01 * l10 != pytest.approx(1.0, rel=1e-3)


def test_tracking_signal_matches_loop(spark, sf_dir):
    row = q_tracking_signal(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    vs = [v for _, v in sorted((r[0], round(r[1] * 100) // 100) for r in rows)]
    es = [vs[t] - vs[t - 7] for t in range(7, len(vs))]
    ce = cae = 0
    mx, mn, alarms = -1e18, 1e18, 0
    for t, e in enumerate(es, start=1):
        ce += e
        cae += abs(e)
        ts = t * ce / cae
        mx, mn = max(mx, ts), min(mn, ts)
        if t * abs(ce) > 4 * cae:
            alarms += 1
    assert row["n_days"] == len(es)
    assert row["mean_error_dollars"] == pytest.approx(
        ce / len(es), abs=0.01
    )
    assert row["max_ts"] == pytest.approx(mx, abs=1e-5)
    assert row["min_ts"] == pytest.approx(mn, abs=1e-5)
    assert row["n_alarm_days"] == alarms


def test_tracking_signal_bias_law():
    def run(es):
        ce = cae = alarms = 0
        for t, e in enumerate(es, start=1):
            ce += e
            cae += abs(e)
            if t * abs(ce) > 4 * cae:
                alarms += 1
        return alarms

    # symmetric alternating errors: TS oscillates near 0, no alarm
    assert run([100, -100] * 200) == 0
    # persistent +drift: TS walks out past 4 and stays
    assert run([100, 90, 110] * 100) > 250
