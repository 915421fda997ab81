"""Definition-level checks for the ext64 batch."""

from __future__ import annotations

import math

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext64 import (
    _HBITS,
    q_hilbert_locality,
    q_nelson_aalen_hazard,
    q_price_index_fisher,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _xy2d(bits: int, x: int, y: int) -> int:
    n = 1 << bits
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_cells_match_reference_and_stay_connected(spark, sf_dir):
    got = {r["h_cell"]: r for r in q_hilbert_locality(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select("user_id", "value").toPandas()
    xs = (ev.user_id.to_numpy() % 64).astype("int64")
    ys = (np.floor(ev.value.to_numpy()).astype("int64") % 64).astype("int64")
    cells = {}
    for x, y in zip(xs, ys):
        c = _xy2d(_HBITS, int(x), int(y)) >> _HBITS
        n, x0, x1, y0, y1 = cells.get(c, (0, 64, -1, 64, -1))
        cells[c] = (n + 1, min(x0, x), max(x1, x), min(y0, y), max(y1, y))
    assert set(got) == set(cells)
    for c, (n, x0, x1, y0, y1) in cells.items():
        r = got[c]
        assert (r["n"], r["x_min"], r["x_max"], r["y_min"], r["y_max"]) == (
            n, x0, x1, y0, y1,
        )
    # Hilbert locality guarantee: a 64-index run covers a CONNECTED
    # region; its bbox never exceeds 16 in either dimension (Morton's
    # seam-adjacent runs can span the full 64-wide grid)
    for r in got.values():
        assert r["x_max"] - r["x_min"] <= 16
        assert r["y_max"] - r["y_min"] <= 16


def test_fisher_index_matches_literal_unit_values(spark, sf_dir):
    row = q_price_index_fisher(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    df["yr"] = df.o_orderdate.dt.year
    df = df[df.yr.isin([1996, 1997])]
    df["c"] = np.floor(df.l_extendedprice * 100 + 0.5).astype("int64")
    g = df.groupby(["l_partkey", "yr"]).agg(
        c=("c", "sum"), q=("l_quantity", "sum")
    )
    parts = set(g.index.get_level_values(0))
    l_num = p_den = sc0 = sc1 = 0
    n_parts = 0
    for pk in parts:
        try:
            a, b = g.loc[(pk, 1996)], g.loc[(pk, 1997)]
        except KeyError:
            continue
        n_parts += 1
        c0, q0, c1, q1 = int(a.c), int(a.q), int(b.c), int(b.q)
        sc0 += c0
        sc1 += c1
        l_num += int(math.floor(1e6 * c1 * q0 / q1 + 0.5))
        p_den += int(math.floor(1e6 * c0 * q1 / q0 + 0.5))
    lasp = l_num / 1e6 / sc0
    paas = 1e6 * sc1 / p_den
    assert row["n_parts"] == n_parts
    assert abs(row["laspeyres"] - lasp) < 1e-6
    assert abs(row["paasche"] - paas) < 1e-6
    assert abs(row["fisher"] - math.sqrt(lasp * paas)) < 1e-6
    # Fisher lies between (or at) its two bounds
    lo, hi = sorted([row["laspeyres"], row["paasche"]])
    assert lo - 1e-6 <= row["fisher"] <= hi + 1e-6


def test_nelson_aalen_matches_literal_risk_sets(spark, sf_dir):
    got = {r["t_days"]: r for r in q_nelson_aalen_hazard(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    ev["day"] = ev.ts.dt.normalize()
    obs = []
    for _, g in ev.groupby("user_id"):
        first, last = g.day.min(), g.day.max()
        p = g[g.event_type == "purchase"].day.min()
        if p is not np.nan and p == p:  # non-NaT
            obs.append(((p - first).days, 1))
        else:
            obs.append(((last - first).days, 0))
    times = sorted({t for t, _ in obs})
    n_total = len(obs)
    cum_h = cum_v = 0
    ended = 0
    for t in times:
        n_risk = n_total - ended
        d = sum(1 for tt, e in obs if tt == t and e == 1)
        ending = sum(1 for tt, _ in obs if tt == t)
        ended += ending
        if d == 0:
            continue
        cum_h += int(math.floor(1e9 * d / n_risk + 0.5))
        cum_v += int(math.floor(1e9 * d * (n_risk - d) / (n_risk**3) + 0.5))
        r = got[t]
        assert r["n_events"] == d and r["n_at_risk"] == n_risk
        assert abs(r["cum_hazard"] - cum_h / 1e9) < 1e-6
        assert abs(r["na_survival"] - math.exp(-cum_h / 1e9)) < 1e-6
        assert abs(r["var_hazard"] - cum_v / 1e9) < 1e-6
    # NA survival dominates KM survival pointwise (exp(-x) >= 1-x)
    assert all(0.0 <= r["na_survival"] <= 1.0 for r in got.values())
