"""ext158: literal re-derivations -- SAX words from a plain symbol
loop, the Ledoit-Wolf intensity vs a numpy re-derivation (and its
[0,1] law), and the ESS vs the ACF-loop definition (plus the
independence limit ESS == n when all rho are negative at lag 1)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext158 import (
    _BP,
    _K_ESS,
    q_autocorr_ess_daily,
    q_ledoit_wolf_shrinkage,
    q_sax_symbolic_words,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    return [per[d] for d in sorted(per)]


def test_sax_matches_symbol_loop(spark, sf_dir, series):
    got = [
        (r["sax_word"], r["n_occ"], r["n_distinct_words"])
        for r in q_sax_symbolic_words(spark, sf_dir).collect()
    ]
    xs = [v // 100 for v in series]
    n = len(xs)
    mu = sum(xs) / n
    sd = math.sqrt(n * sum(v * v for v in xs) - sum(xs) ** 2) / n

    def sym(v):
        z = (v - mu) / sd
        return "a" if z < -_BP else "b" if z < 0 else "c" if z < _BP else "d"

    s = "".join(sym(v) for v in xs)
    words = Counter(s[i : i + 3] for i in range(len(s) - 2))
    expected = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(w, c) for w, c, _ in got] == expected
    assert all(d == len(words) for _, _, d in got)


def test_ledoit_wolf_matches_numpy(spark, sf_dir):
    row = q_ledoit_wolf_shrinkage(spark, sf_dir).collect()[0]
    rows = read_table(spark, sf_dir, "embeddings").select("embedding").collect()
    mat = np.array([[float(v) for v in r["embedding"]] for r in rows])
    # quantize products at e6 exactly as the query does
    n, d = mat.shape
    # per-cell moments over quantized products
    b2 = d2 = 0.0
    mu_diag = []
    cells = {}
    for i in range(d):
        for j in range(i, d):
            p = np.floor(mat[:, i] * mat[:, j] * 1e6 + 0.5)
            c = p.sum() / 1e6 / n
            var = (p * p).sum() / 1e12 / n - c * c
            cells[(i, j)] = (c, var)
            if i == j:
                mu_diag.append(c)
    mu = sum(mu_diag) / d
    for (i, j), (c, var) in cells.items():
        w = 1 if i == j else 2
        b2 += w * math.floor(var / n * 1e15 + 0.5) / 1e15
        tgt = mu if i == j else 0.0
        d2 += w * math.floor((c - tgt) ** 2 * 1e15 + 0.5) / 1e15
    lam = min(1.0, b2 / d2)
    assert row["mu_identity_scale"] == pytest.approx(mu, abs=1e-5)
    assert row["b2_noise"] == pytest.approx(b2, rel=1e-4)
    assert row["d2_dispersion"] == pytest.approx(d2, rel=1e-4)
    assert row["lambda_star"] == pytest.approx(lam, abs=1e-5)
    assert 0 <= row["lambda_star"] <= 1


def test_ess_matches_acf_loop(spark, sf_dir, series):
    row = q_autocorr_ess_daily(spark, sf_dir).collect()[0]
    xs = series
    n = len(xs)
    mu = sum(xs) / n

    def acf(k):
        num = sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, n))
        den = sum((v - mu) ** 2 for v in xs)
        return num / den

    rhos = [acf(k) for k in range(1, _K_ESS + 1)]
    kmax = _K_ESS
    for k, r in enumerate(rhos, 1):
        if r < 0:
            kmax = k - 1
            break
    sr = sum(
        math.floor(r * 1e12 + 0.5) / 1e12 for r in rhos[:kmax]
    )
    ess = n / (1 + 2 * sr)
    assert row["n_days"] == n
    assert row["truncation_lag"] == kmax
    assert row["sum_rho"] == pytest.approx(sr, abs=1e-6)
    assert row["ess"] == pytest.approx(ess, abs=0.02)
    assert 0 < row["ess"] <= n + 1e-9


def test_ess_equals_n_for_uncorrelated_formula():
    # law: rho_1 < 0 -> truncation at 0 -> ESS == n
    n, sr = 500, 0.0
    assert n / (1 + 2 * sr) == n
