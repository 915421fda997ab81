"""ext132: literal re-derivations -- Holm against the stdlib
NormalDist thresholds + step-down property, NB fit vs numpy moments,
Box-Cox vs raw-float profile likelihood."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext132 import (
    _ALPHA_T,
    _LAMBDAS,
    q_box_cox_scan,
    q_holm_bonferroni_screen,
    q_negbin_fit_user_events,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_holm_matches_stdlib_thresholds(spark, sf_dir):
    rows = sorted(
        q_holm_bonferroni_screen(spark, sf_dir).collect(),
        key=lambda r: r["holm_rank"],
    )
    cust = read_table(spark, sf_dir, "customer").collect()
    per = defaultdict(lambda: [0, 0])
    for r in cust:
        cell = per[r["c_nationkey"]]
        cell[0] += 1
        cell[1] += r["c_acctbal"] > 5000
    nn = sum(v[0] for v in per.values())
    kk = sum(v[1] for v in per.values())
    p0 = kk / nn
    m = len(per)
    z = {
        nat: abs((k / n - p0) / math.sqrt(p0 * (1 - p0) / n))
        for nat, (n, k) in per.items()
    }
    order = sorted(z, key=lambda nat: (-z[nat], nat))
    nd = statistics.NormalDist()
    rejecting = True
    for i, nat in enumerate(order, start=1):
        r = rows[i - 1]
        assert r["nation"] == nat and r["holm_rank"] == i
        assert r["abs_z"] == pytest.approx(z[nat], abs=2e-6)
        crit = -nd.inv_cdf((_ALPHA_T / 2) / (m - i + 1))
        assert r["z_crit"] == pytest.approx(crit, abs=5e-6)
        rejecting = rejecting and z[nat] >= crit
        assert r["rejected"] == int(rejecting)
    # Holm thresholds relax monotonically down the ranking
    crits = [r["z_crit"] for r in rows]
    assert all(crits[i] >= crits[i + 1] for i in range(len(crits) - 1))


def test_negbin_matches_numpy(spark, sf_dir):
    got = q_negbin_fit_user_events(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select("user_id").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["user_id"]] += 1
    x = np.array(list(daily.values()), dtype=np.float64)
    mean, var = x.mean(), x.var()
    assert got["n_users"] == len(x)
    assert got["mean_count"] == pytest.approx(mean, abs=1e-5)
    assert got["var_count"] == pytest.approx(var, abs=1e-4)
    assert got["fano"] == pytest.approx(var / mean, abs=1e-5)
    assert got["fano"] > 1  # overdispersed -> NB is defined
    assert got["nb_r"] == pytest.approx(mean * mean / (var - mean), abs=1e-3)
    assert got["nb_p"] == pytest.approx(mean / var, abs=1e-5)
    assert 0 < got["nb_p"] < 1 and got["nb_r"] > 0


def test_box_cox_matches_raw_float(spark, sf_dir):
    rows = {r["lam"]: r for r in q_box_cox_scan(spark, sf_dir).collect()}
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    x = np.array([round(r["o_totalprice"] * 100) / 100 for r in orders])
    lnx = np.log(x).sum()
    lls = {}
    for lam in _LAMBDAS:
        y = np.log(x) if lam == 0 else (np.power(x, lam) - 1) / lam
        lls[lam] = -0.5 * len(x) * math.log(y.var()) + (lam - 1) * lnx
    best = max(lls, key=lambda l: lls[l])
    assert set(rows) == {round(l, 1) for l in _LAMBDAS}
    for lam in _LAMBDAS:
        r = rows[round(lam, 1)]
        assert r["log_likelihood"] == pytest.approx(lls[lam], rel=1e-5, abs=0.05)
        assert r["is_best"] == int(lam == best)
    assert sum(r["is_best"] for r in rows.values()) == 1
