"""Definition-level checks for the ext30 batch: literal python
re-derivations independent of the DuckDB oracle SQL.
"""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext30 import (
    q_conformal_interval,
    q_sequential_ab_looks,
    q_shapley_attribution,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_conformal_matches_literal_split(spark, sf_dir):
    got = q_conformal_interval(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index()
    x = (days.index - pd.Timestamp("1995-01-01")).days.values.astype(float)
    y = days.values.astype(float)
    tr = days.index < pd.Timestamp("1999-01-01")
    cal = (days.index >= pd.Timestamp("1999-01-01")) & (days.index < pd.Timestamp("2000-01-01"))
    te = days.index >= pd.Timestamp("2000-01-01")
    n = int(tr.sum())
    sx, sy = x[tr].sum(), y[tr].sum()
    sxy, sxx = (x[tr] * y[tr]).sum(), (x[tr] * x[tr]).sum()
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    r_cal = np.sort(np.abs(y[cal] - (a + b * x[cal])))
    k = math.ceil(9 * (len(r_cal) + 1) / 10)
    q_hat = r_cal[k - 1]
    r_te = np.abs(y[te] - (a + b * x[te]))
    cov = (1000000 * int((r_te <= q_hat).sum())) // len(r_te)
    assert (int(got.n_train), int(got.n_cal), int(got.n_test)) == (
        n,
        int(cal.sum()),
        int(te.sum()),
    )
    assert math.isclose(float(got.q_hat), q_hat, rel_tol=1e-9, abs_tol=1e-4)
    assert int(got.coverage_ppm) == cov
    # the finite-sample guarantee should put coverage near 90%
    assert 700000 <= int(got.coverage_ppm) <= 1000000


def test_shapley_efficiency_and_literal_values(spark, sf_dir):
    got = q_shapley_attribution(spark, sf_dir).toPandas().set_index("channel")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "value").toPandas()
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    users: dict = defaultdict(lambda: [0, 0])
    for r in ev.itertuples():
        u = users[r.user_id]
        u[0] |= bits.get(r.event_type, 0)
        if r.event_type == "purchase" and r.value > 150:
            u[1] = 1
    sets: dict = defaultdict(lambda: [0, 0])
    for mask, conv in users.values():
        sets[mask][0] += 1
        sets[mask][1] += conv

    def v(mask):
        if mask not in sets or sets[mask][0] == 0:
            return 0.0
        return sets[mask][1] / sets[mask][0]

    fact = {0: 6, 1: 2, 2: 2, 3: 6}
    phis = {}
    for i, ch in enumerate(["view", "click", "signup", "error"]):
        others = [j for j in range(4) if j != i]
        total = 0
        for rsize in range(4):
            for combo in combinations(others, rsize):
                s_mask = sum(1 << j for j in combo)
                t = round(1e9 * fact[rsize] * (v(s_mask | (1 << i)) - v(s_mask)) / 24)
                total += t
        phis[ch] = total
    for ch, want in phis.items():
        assert int(got.loc[ch].phi_e9) == want
    # efficiency: sum of phis ~= v(full) - v(empty) (term-rounding noise only)
    eff = 1e9 * (v(15) - v(0))
    assert abs(sum(phis.values()) - eff) < 64


def test_sequential_looks_cumulative_and_monotone(spark, sf_dir):
    got = q_sequential_ab_looks(spark, sf_dir).toPandas().sort_values("look")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).toPandas()
    m = int(ev.event_id.max())
    ev["look"] = np.minimum(3, (ev.event_id * 4) // (m + 1))
    first = ev.groupby("user_id").look.min()
    conv = (
        ev[(ev.event_type == "purchase") & (ev.value > 150)].groupby("user_id").look.min()
    )
    for L in range(4):
        row = got[got.look == L].iloc[0]
        for variant, (ncol, xcol) in {0: ("n_a", "x_a"), 1: ("n_b", "x_b")}.items():
            uids = first[first.index % 2 == variant]
            n = int((uids <= L).sum())
            cuids = conv[conv.index % 2 == variant]
            xx = int((cuids <= L).sum())
            assert int(row[ncol]) == n
            assert int(row[xcol]) == xx
        if L:
            prev = got[got.look == L - 1].iloc[0]
            assert int(row.n_a) >= int(prev.n_a) and int(row.x_b) >= int(prev.x_b)
    # final look z must match the plain pooled two-proportion z
    # (degenerate looks -- no conversions in either arm -- emit NULL)
    last = got[got.look == 3].iloc[0]
    if not pd.isna(last.z_score):
        pa, pb = last.x_a / last.n_a, last.x_b / last.n_b
        pool = (last.x_a + last.x_b) / (last.n_a + last.n_b)
        z = (pa - pb) / math.sqrt(pool * (1 - pool) * (1 / last.n_a + 1 / last.n_b))
        assert math.isclose(float(last.z_score), z, abs_tol=1e-5)
    else:
        xa, xb = int(last.x_a), int(last.x_b)
        na, nb = int(last.n_a), int(last.n_b)
        assert xa + xb in (0, na + nb) or na == 0 or nb == 0
