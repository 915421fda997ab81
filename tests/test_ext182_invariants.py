"""ext182: the drawdown monoid is proven associative and its carried
fold replayed against the straight loop (the property that makes the
22nd live streaming replay exact), Balassa RCA is re-derived by loop
and pinned to the weighted-mean-one identity (global-brand-share
weighted RCA over brands is exactly 1 for every nation), and the
concentration ratios are re-derived with their monotonicity bounds."""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext182 import (
    q_balassa_rca,
    q_concentration_ratio,
    q_streaming_drawdown_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# --- drawdown monoid ------------------------------------------------------


def _stats(seg):
    """(total, maxpref, minpref, dd) over a nonempty segment -- the
    PURE in-segment stats (drawdown against in-segment peaks only;
    the account's initial-0 peak is applied by the carried fold)."""
    pref, mx, mn, dd = 0, None, None, 0
    for d in seg:
        pref += d
        mx = pref if mx is None else max(mx, pref)
        mn = pref if mn is None else min(mn, pref)
        dd = max(dd, mx - pref)
    return pref, mx, mn, dd


def _combine(a, b):
    ta, ma, na, da = a
    tb, mb, nb, db = b
    return (
        ta + tb,
        max(ma, ta + mb),
        min(na, ta + nb),
        max(da, db, ma - ta - nb),
    )


def _carried(batches):
    """The query's carried fold: state (P, runmax, dd)."""
    p, run, dd = 0, 0, 0
    for seg in batches:
        t, m, mn, bdd = _stats(seg)
        dd = max(dd, bdd, run - p - mn)
        run = max(run, p + m)
        p = p + t
    return p, run, dd


def test_drawdown_monoid_associative_and_fold():
    seq = [((7 * i * i + 3 * i) % 211) - 105 for i in range(60)]
    whole = _stats(seq)
    # associativity: any split reconstruction equals the whole
    for cut1 in (1, 13, 30, 59):
        for cut2 in (cut1, 45, 60):
            if cut2 < cut1:
                continue
            parts = [seq[:cut1], seq[cut1:cut2], seq[cut2:]]
            parts = [p for p in parts if p]
            st = _stats(parts[0])
            for p in parts[1:]:
                st = _combine(st, _stats(p))
            assert st == whole
    # the carried (P, runmax, dd) fold equals the straight replay
    p, run, dd = _carried([seq[:20], seq[20:33], seq[33:]])
    pref, best, worst = 0, 0, 0
    for d in seq:
        pref += d
        best = max(best, pref)
        worst = max(worst, best - pref)
    assert (p, run, dd) == (pref, best, worst)


def test_streaming_drawdown_matches_loop(spark, sf_dir):
    rows = q_streaming_drawdown_replay(spark, sf_dir).collect()
    got = {r["user_id"]: r for r in rows}
    ev = (
        read_table(spark, sf_dir, "events")
        .where("event_type in ('purchase', 'error')")
        .selectExpr(
            "user_id",
            "CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100, 0) AS BIGINT)"
            " ELSE -CAST(round(value * 100, 0) AS BIGINT) END AS d",
            "unix_micros(ts) AS us",
            "event_id",
        )
        .collect()
    )
    series = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], r["d"])
        )
    assert set(got) == set(series)
    for uid, evs in series.items():
        evs.sort()
        pref, run, dd = 0, 0, 0
        for _, _, d in evs:
            pref += d
            run = max(run, pref)
            dd = max(dd, run - pref)
        assert got[uid]["n_events"] == len(evs)
        assert got[uid]["peak_dollars"] == pytest.approx(run / 100)
        assert got[uid]["max_drawdown_dollars"] == pytest.approx(
            dd / 100
        )
        assert got[uid]["alarm"] == (dd >= 20_000)


# --- Balassa RCA ----------------------------------------------------------


@pytest.fixture(scope="module")
def cells(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    p = read_table(spark, sf_dir, "part")
    rows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(p, p.p_partkey == li.l_partkey)
        .selectExpr(
            "c_nationkey AS nk",
            "p_brand AS brand",
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("nk", "brand")
        .sum("cents")
        .collect()
    )
    return {(r[0], r[1]): r[2] for r in rows}


def test_balassa_matches_loop(spark, sf_dir, cells):
    rows = q_balassa_rca(spark, sf_dir).collect()
    xn, xb, x = {}, {}, 0
    for (nk, b), v in cells.items():
        xn[nk] = xn.get(nk, 0) + v
        xb[b] = xb.get(b, 0) + v
        x += v
    rca = {
        k: (v * x) / (xn[k[0]] * xb[k[1]]) for k, v in cells.items()
    }
    n_spec = sum(
        1
        for k, v in cells.items()
        if v * x > xn[k[0]] * xb[k[1]]
    )
    top = sorted(rca.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(rows) == 10
    for row, (k, v) in zip(
        sorted(rows, key=lambda r: (-r["rca"], r["nationkey"], r["brand"])),
        top,
    ):
        assert (row["nationkey"], row["brand"]) == k
        assert row["rca"] == pytest.approx(v, abs=1e-5)
        assert row["n_cells"] == len(cells)
        assert row["n_specialized"] == n_spec


def test_balassa_weighted_mean_one_identity(cells):
    xn, xb, x = {}, {}, 0
    for (nk, b), v in cells.items():
        xn[nk] = xn.get(nk, 0) + v
        xb[b] = xb.get(b, 0) + v
        x += v
    for nk in xn:
        s = sum(
            (xb[b] / x) * ((cells.get((nk, b), 0) * x) / (xn[nk] * xb[b]))
            for b in xb
        )
        assert s == pytest.approx(1.0, rel=1e-9)


# --- concentration ratios -------------------------------------------------


def test_concentration_matches_loop(spark, sf_dir):
    row = q_concentration_ratio(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .selectExpr(
            "l_suppkey AS sk",
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents",
        )
        .groupBy("sk")
        .sum("cents")
        .collect()
    )
    by = sorted(((r[1], r[0]) for r in rows), key=lambda t: (-t[0], t[1]))
    s = sum(c for c, _ in by)
    c4 = sum(c for c, _ in by[:4])
    c8 = sum(c for c, _ in by[:8])
    assert row["n_suppliers"] == len(by)
    assert row["cr4_ppm"] == (1000000 * c4) // s
    assert row["cr8_ppm"] == (1000000 * c8) // s
    assert row["cr4"] == pytest.approx(c4 / s, abs=1e-6)
    assert row["cr8"] == pytest.approx(c8 / s, abs=1e-6)
    assert row["cr4"] <= row["cr8"] <= 1.0
    # CR_k lower bound: the top 4 hold at least 4/n of the total
    assert row["cr4"] >= 4.0 / len(by) - 1e-9
