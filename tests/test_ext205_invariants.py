"""ext205: probit re-derivations -- a numpy Fisher-scoring
implementation (A&S erf, same clamp, same 4 rounds, same quantized
sums skipped: plain float sums, tolerance-compared) must match the
query's coefficients; a planted probit DGP is recovered; and the
classic logit/probit slope ratio (~1.6-1.8 on the shared spine) is
pinned against ext137's logistic fit."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext137 import (
    q_logistic_newton_1d,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext205 import (
    _N_ROUNDS,
    q_probit_newton_1d,
)

_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf(x):
    t = 1.0 / (1.0 + 0.3275911 * np.abs(x))
    poly = ((((_A[4] * t + _A[3]) * t + _A[2]) * t + _A[1]) * t + _A[0]) * t
    mag = 1.0 - poly * np.exp(-x * x)
    return np.where(x < 0, -mag, mag)


def _fisher_probit(v, y, c, rounds=_N_ROUNDS):
    v, y, c = (np.asarray(a, float) for a in (v, y, c))
    n = c.sum()
    mu = (v * c).sum() / n
    sg = math.sqrt((c * v * v).sum() / n - mu * mu)
    x = (v - mu) / sg
    b0 = b1 = 0.0
    for _ in range(rounds):
        eta = b0 + b1 * x
        phi = 0.3989422804014327 * np.exp(-0.5 * eta * eta)
        Phi = np.clip(0.5 * (1.0 + _erf(eta * 0.7071067811865476)),
                      1e-10, 1 - 1e-10)
        u = phi * (y - Phi) / (Phi * (1 - Phi))
        lam = phi * phi / (Phi * (1 - Phi))
        g0, g1 = (c * u).sum(), (c * u * x).sum()
        h00, h01 = (c * lam).sum(), (c * lam * x).sum()
        h11 = (c * lam * x * x).sum()
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    return b0, b1


def test_probit_matches_numpy_fisher(spark, sf_dir):
    con = duckdb.connect()
    spine = con.sql(
        f"""SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(count(*) AS BIGINT) AS c
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2"""
    ).df()
    b0, b1 = _fisher_probit(spine["v"], spine["y"], spine["c"])
    row = q_probit_newton_1d(spark, sf_dir).toPandas().iloc[0]
    # e9 term quantization vs plain float sums: agree to ~1e-5
    assert abs(row["beta0"] - b0) < 1e-4
    assert abs(row["beta1_per_sd"] - b1) < 1e-4
    assert 0.0 <= row["mcfadden_r2"] <= 1.0
    assert row["deviance"] > 0


def test_planted_probit_recovered():
    rng = np.random.default_rng(205)
    n = 40000
    x = rng.normal(0, 1, n)
    b0_true, b1_true = -0.4, 0.7
    p = 0.5 * (1.0 + _erf((b0_true + b1_true * x) * 0.7071067811865476))
    y = (rng.random(n) < p).astype(int)
    # spine form: quantize x to keep the weighted-spine shape
    v = np.round(x * 1000).astype(int)
    b0, b1 = _fisher_probit(v, y, np.ones(n), rounds=6)
    # x standardized internally: b1 is per-sd of v ~ per-sd of x
    assert abs(b0 - b0_true) < 0.05
    assert abs(b1 - b1_true) < 0.05


def test_logit_probit_slope_ratio(spark, sf_dir):
    lg = q_logistic_newton_1d(spark, sf_dir).toPandas().iloc[0]
    pr = q_probit_newton_1d(spark, sf_dir).toPandas().iloc[0]
    b_l, b_p = lg["beta1_per_sd"], pr["beta1_per_sd"]
    if abs(b_p) > 1e-4:
        assert 1.3 < b_l / b_p < 2.2  # the classic ~1.6-1.8 band, loose
    # both links must agree on the DIRECTION of the effect
    assert b_l * b_p >= 0
