"""ext169: literal re-derivations -- White LM vs a numpy aux
regression on the SAME quantization recipe (plus the planted law:
variance proportional to x^2 fires the test, homoskedastic noise does
not), Goldfeld-Quandt vs a two-half lstsq loop (plus the antisymmetry
ln F(swap) = -ln F), and RESET vs a numpy quadratic-vs-linear F (plus
the nesting law SSR_quad <= SSR_lin always)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext169 import (
    _GQ_SPLIT,
    q_goldfeld_quandt,
    q_ramsey_reset,
    q_white_het_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def xy(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_quantity")
        .collect()
    )
    y = np.array([round(r["l_extendedprice"] * 100) for r in rows], float)
    x = np.array([int(r["l_quantity"]) for r in rows], float)
    return x, y


def _white_lm(x, y):
    n = len(x)
    b = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    a = (y.sum() - b * x.sum()) / n
    e2q = np.floor((y - a - b * x) ** 2 * 1e-2 + 0.5)
    z = e2q
    X = np.column_stack([np.ones(n), x, x * x])
    coef, *_ = np.linalg.lstsq(X, z, rcond=None)
    zhat = X @ coef
    r2 = 1 - ((z - zhat) ** 2).sum() / ((z - z.mean()) ** 2).sum()
    return n * r2, r2


def test_white_matches_numpy(spark, sf_dir, xy):
    row = q_white_het_test(spark, sf_dir).collect()[0]
    x, y = xy
    lm, r2 = _white_lm(x, y)
    assert row["n_lines"] == len(x)
    assert row["aux_r2"] == pytest.approx(r2, abs=1e-5)
    assert row["lm_stat"] == pytest.approx(lm, rel=1e-4)
    assert row["p_chi2_2"] == pytest.approx(math.exp(-lm / 2), abs=1e-5)
    # flag consistency (this synthetic data's price is near-independent
    # of quantity, so rejection is a data question, not a law)
    assert row["reject_5pct"] == (lm > 5.991464547107979)


def test_white_planted_laws():
    # variance ~ x^2 -> LM large; homoskedastic -> LM small
    ts = np.arange(1, 2001, dtype=float)
    x = (ts % 50) + 1
    noise = np.sin(ts * 12.9898) * 0.7  # deterministic pseudo-noise
    y_het = 100 * x + x * noise * 40
    y_hom = 100 * x + noise * 40
    lm_het, _ = _white_lm(x, y_het * 100)
    lm_hom, _ = _white_lm(x, y_hom * 100)
    assert lm_het > 200
    assert lm_hom < 20


def test_gq_matches_lstsq(spark, sf_dir, xy):
    row = q_goldfeld_quandt(spark, sf_dir).collect()[0]
    x, y = xy

    def ssr_per_df(mask):
        xs, ys = x[mask], y[mask]
        n = len(xs)
        X = np.column_stack([np.ones(n), xs])
        coef, *_ = np.linalg.lstsq(X, ys, rcond=None)
        return ((ys - X @ coef) ** 2).sum() / (n - 2), n

    v0, n0 = ssr_per_df(x <= _GQ_SPLIT)
    v1, n1 = ssr_per_df(x > _GQ_SPLIT)
    fstat = v1 / v0
    z = math.log(fstat) / math.sqrt(2 / (n1 - 2) + 2 / (n0 - 2))
    assert (row["n_low"], row["n_high"]) == (n0, n1)
    assert row["variance_ratio_f"] == pytest.approx(fstat, rel=1e-5)
    assert row["z_lnf"] == pytest.approx(z, abs=1e-3)
    assert row["reject_5pct"] == (abs(z) > 1.959963984540054)
    # antisymmetry: swapping halves negates ln F
    assert math.log(v0 / v1) == pytest.approx(-math.log(v1 / v0), abs=1e-12)


def test_reset_matches_numpy_and_nesting(spark, sf_dir, xy):
    row = q_ramsey_reset(spark, sf_dir).collect()[0]
    x, y = xy
    n = len(x)
    X1 = np.column_stack([np.ones(n), x])
    X2 = np.column_stack([np.ones(n), x, x * x])
    c1, *_ = np.linalg.lstsq(X1, y, rcond=None)
    c2, *_ = np.linalg.lstsq(X2, y, rcond=None)
    ssr1 = ((y - X1 @ c1) ** 2).sum()
    ssr2 = ((y - X2 @ c2) ** 2).sum()
    fstat = (ssr1 - ssr2) / (ssr2 / (n - 3))
    szz = ((y - y.mean()) ** 2).sum()
    assert ssr2 <= ssr1  # nesting law
    assert row["n_lines"] == n
    assert row["resid_share_linear"] == pytest.approx(ssr1 / szz, abs=1e-5)
    assert row["f_reset"] == pytest.approx(fstat, rel=1e-3, abs=0.01)
    assert row["p_chi2_1"] == pytest.approx(
        math.erfc(math.sqrt(max(fstat, 0)) / math.sqrt(2)), abs=1e-5
    )
