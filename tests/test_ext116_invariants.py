"""ext116: literal from-scratch re-derivations (midranks via numpy, no
spine machinery) of Anderson-Darling k=2, Brunner-Munzel, and Cucconi
-- the shared-formulation guard the oracle can't provide."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext116 import (
    q_anderson_darling_2s,
    q_brunner_munzel,
    q_cucconi_location_scale,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(spark, sf_dir, seg):
    cust = read_table(spark, sf_dir, "customer")
    rows = cust.where(cust.c_mktsegment == seg).select("c_acctbal").collect()
    return np.array([round(r["c_acctbal"] * 100) for r in rows], dtype=np.int64)


def _midranks(pooled):
    """Midrank of each element of `pooled` within `pooled` (ties share
    the average rank), computed the slow literal way."""
    order = np.sort(pooled)
    out = np.empty(len(pooled))
    for i, x in enumerate(pooled):
        lo = np.searchsorted(order, x, "left")
        hi = np.searchsorted(order, x, "right")
        out[i] = (lo + 1 + hi) / 2.0
    return out


def test_anderson_darling_matches_literal(spark, sf_dir):
    got = q_anderson_darling_2s(spark, sf_dir).collect()[0]
    x1 = _cents(spark, sf_dir, "AUTOMOBILE")
    x0 = _cents(spark, sf_dir, "HOUSEHOLD")
    pooled = np.concatenate([x1, x0])
    n1, n0, n = len(x1), len(x0), len(pooled)
    zs = np.unique(pooled)
    inner1 = inner0 = 0.0
    for z in zs:
        b = int((pooled <= z).sum())
        if b >= n:
            continue
        lj = int((pooled == z).sum())
        m1 = int((x1 <= z).sum())
        m0 = int((x0 <= z).sum())
        den = b * (n - b)
        inner1 += lj * (n * m1 - n1 * b) ** 2 / den
        inner0 += lj * (n * m0 - n0 * b) ** 2 / den
    a2 = (inner1 / n1 + inner0 / n0) / n
    assert got["n_auto"] == n1 and got["n_house"] == n0
    assert got["n_distinct_pooled"] == len(zs)
    assert got["a2_stat"] == pytest.approx(a2, abs=2e-6)
    assert got["a2_stat"] >= 0


def test_brunner_munzel_matches_literal(spark, sf_dir):
    got = q_brunner_munzel(spark, sf_dir).collect()[0]
    x1 = _cents(spark, sf_dir, "FURNITURE")
    x0 = _cents(spark, sf_dir, "MACHINERY")
    n1, n0 = len(x1), len(x0)
    n = n1 + n0
    pooled = np.concatenate([x1, x0])
    r = _midranks(pooled)
    r1p, r0p = r[:n1], r[n1:]
    w1, w0 = _midranks(x1), _midranks(x0)
    rbar1, rbar0 = r1p.mean(), r0p.mean()
    s1 = ((r1p - w1 - rbar1 + (n1 + 1) / 2) ** 2).sum() / (n1 - 1)
    s0 = ((r0p - w0 - rbar0 + (n0 + 1) / 2) ** 2).sum() / (n0 - 1)
    p_hat = (rbar1 - (n1 + 1) / 2) / n0
    w = n1 * n0 * (rbar1 - rbar0) / n / math.sqrt(n1 * s1 + n0 * s0)
    assert got["n_furniture"] == n1 and got["n_machinery"] == n0
    assert got["p_hat"] == pytest.approx(p_hat, abs=2e-6)
    assert got["w_stat"] == pytest.approx(w, abs=2e-5)
    assert 0.0 <= got["p_hat"] <= 1.0


def test_cucconi_matches_literal(spark, sf_dir):
    got = q_cucconi_location_scale(spark, sf_dir).collect()[0]
    x1 = _cents(spark, sf_dir, "BUILDING")  # "sample" whose ranks are summed
    x0 = _cents(spark, sf_dir, "AUTOMOBILE")
    n1, n0 = len(x1), len(x0)
    n = n1 + n0
    pooled = np.concatenate([x1, x0])
    r1p = _midranks(pooled)[:n1]
    su = (r1p**2).sum()
    sv = ((n + 1 - r1p) ** 2).sum()
    den = math.sqrt(n1 * n0 * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5.0)
    u = (6 * su - n1 * (n + 1) * (2 * n + 1)) / den
    v = (6 * sv - n1 * (n + 1) * (2 * n + 1)) / den
    rho = 2.0 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert got["n_building"] == n1 and got["n_auto"] == n0
    assert got["u_star"] == pytest.approx(u, abs=2e-6)
    assert got["v_star"] == pytest.approx(v, abs=2e-6)
    assert got["c_stat"] == pytest.approx(c, abs=2e-5)
    assert got["c_stat"] >= 0
