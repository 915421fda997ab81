"""ext140: literal re-derivations -- the Holt fold replayed as a plain
Python loop, Kingman's formula from raw gap/value lists, EOQ from the
textbook square root."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext140 import (
    q_eoq_reorder_policy,
    q_holt_linear_forecast,
    q_kingman_gg1_wait,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def _holt(ys, a=0.3, b=0.1):
    l, t, sse = ys[0], 0.0, 0.0
    for y in ys[1:]:
        sse += (y - (l + t)) ** 2
        nl = a * y + (1 - a) * (l + t)
        t = b * (nl - l) + (1 - b) * t
        l = nl
    return l, t, sse


def test_holt_matches_python_loop(spark, sf_dir):
    row = q_holt_linear_forecast(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    days = sorted(per)
    # same rule as the query: calendar window d > max - 56 days (the
    # sf0.001 tail is sparse, so this can be fewer than 56 rows)
    import datetime

    cut = days[-1] - datetime.timedelta(days=56)
    win = [float(per[d]) for d in days if d > cut]
    l, t, sse = _holt(win)
    assert row["n_fit_days"] == len(win)
    assert row["level_dollars"] == pytest.approx(l / 100, abs=0.01)
    assert row["trend_dollars_per_day"] == pytest.approx(t / 100, abs=0.01)
    assert row["forecast_next7_dollars"] == pytest.approx(
        (7 * l + 28 * t) / 100, abs=0.02
    )
    assert row["rmse_1step_dollars"] == pytest.approx(
        math.sqrt(sse / (len(win) - 1)) / 100, abs=0.01
    )


def test_holt_tracks_a_pure_ramp():
    # on y_t = 10t the fitted trend must converge to ~10/day and the
    # one-step errors shrink toward 0
    ys = [10.0 * t for t in range(1, 101)]
    l, t, _ = _holt(ys)
    assert t == pytest.approx(10.0, rel=0.05)
    assert l == pytest.approx(1000.0, rel=0.02)


def test_kingman_matches_literal(spark, sf_dir):
    rows = {r["rho"]: r for r in q_kingman_gg1_wait(spark, sf_dir).collect()}
    ev = convert_event_ts(read_table(spark, sf_dir, "events")).select(
        "ts", "event_id", "value"
    ).collect()
    per_day = defaultdict(list)
    for r in ev:
        per_day[r["ts"].date()].append(
            (r["ts"], r["event_id"], round(r["value"] * 100))
        )
    gaps = []
    for d, lst in per_day.items():
        lst.sort(key=lambda x: (x[0], x[1]))
        for i in range(1, len(lst)):
            gaps.append(
                int((lst[i][0] - lst[i - 1][0]).total_seconds() * 1e6)
            )
    vals = [round(r["value"] * 100) for r in ev]
    n, sg, sgg = len(gaps), sum(gaps), sum(g * g for g in gaps)
    m, sv, svv = len(vals), sum(vals), sum(v * v for v in vals)
    ca2 = (n * sgg - sg * sg) / sg / sg
    cs2 = (m * svv - sv * sv) / sv / sv
    es = sv / m / 100
    for rho in (0.5, 0.8, 0.9, 0.95):
        r = rows[rho]
        assert r["ca2"] == pytest.approx(ca2, rel=1e-4)
        assert r["cs2"] == pytest.approx(cs2, rel=1e-4)
        vut = (rho / (1 - rho)) * ((ca2 + cs2) / 2)
        assert r["wq_seconds"] == pytest.approx(vut * es, rel=1e-4)
        assert r["lq_jobs"] == pytest.approx(vut * rho, rel=1e-4)
    # queue blows up superlinearly with utilization
    assert rows[0.95]["wq_seconds"] > 3 * rows[0.8]["wq_seconds"]


def test_eoq_matches_textbook(spark, sf_dir):
    got = q_eoq_reorder_policy(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_shipdate"
    ).collect()
    part = {
        r["p_partkey"]: r["p_retailprice"]
        for r in read_table(spark, sf_dir, "part").collect()
    }
    dem = defaultdict(int)
    lo = hi = None
    for r in li:
        dem[r["l_partkey"]] += int(r["l_quantity"])
        d = r["l_shipdate"]
        lo = d if lo is None or d < lo else lo
        hi = d if hi is None or d > hi else hi
    days = (hi - lo).days + 1
    top = sorted(dem.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [r["part_id"] for r in got] == [pk for pk, _ in top]
    for r, (pk, d_units) in zip(got, top):
        rate = 365.0 * d_units / days
        eoq = math.sqrt(2 * rate * 100 / (0.2 * part[pk]))
        assert r["demand_units"] == d_units
        assert r["annual_demand_rate"] == pytest.approx(rate, rel=1e-6)
        assert r["eoq_units"] == pytest.approx(eoq, rel=1e-6)
        assert r["orders_per_year"] == pytest.approx(rate / eoq, rel=1e-6)
        assert r["reorder_point_units"] == pytest.approx(
            7.0 * d_units / days, rel=1e-6
        )
