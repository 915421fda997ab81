"""Definition-level invariants for ext262 (MDCT transform codec):
perfect-reconstruction-up-to-table-rounding at fine quantization, the
Princen-Bradley window condition, rdiv symmetry, quantization
monotonicity, and zero/determinism sanity -- the checks the DuckDB
hash gate (a shared-formulation replay) cannot see."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators import multimodal as M


def _noise(n, seed=3):
    t = np.arange(n, dtype=np.float64) + seed * 1000
    frac = np.modf(np.sin(t * 12.9898 + 78.233) * 43758.5453)[0]
    return np.round((frac - 0.5) * 65535).astype(np.int64).clip(-32768, 32767)


def test_princen_bradley_window():
    N = M.MDCT_N
    for n in range(N):
        w1 = math.sin(math.pi / (2 * N) * (n + 0.5))
        w2 = math.sin(math.pi / (2 * N) * (n + N + 0.5))
        assert abs(w1 * w1 + w2 * w2 - 1.0) < 1e-12


def test_rdiv_symmetric_half_away():
    for a in (-101, -100, -99, -51, -50, -49, -1, 0, 1, 49, 50, 51, 99, 100):
        assert M.mdct_rdiv(-a, 100) == -M.mdct_rdiv(a, 100)
    assert M.mdct_rdiv(50, 100) == 1  # half rounds away from zero
    assert M.mdct_rdiv(-50, 100) == -1
    assert M.mdct_rdiv(49, 100) == 0


def test_near_perfect_reconstruction_at_fine_quant(monkeypatch):
    """With unit quantizer steps the only loss is cosine-table rounding:
    measured max error 10 LSB / ~70 dB on full-scale noise."""
    monkeypatch.setattr(M, "MDCT_QUANT", tuple(1 for _ in range(M.MDCT_N)))
    x = _noise(30)
    xh = M.decode_mdct(M.encode_mdct(x), 30).astype(np.int64)
    err = np.abs(x - xh)
    assert err.max() <= 16, err.max()
    snr = 10 * math.log10(int((x * x).sum()) / int(((x - xh) ** 2).sum()))
    assert snr > 60, snr


def test_quantization_monotone(monkeypatch):
    """Coarser steps -> SNR falls, nonzero coefficients cannot rise."""
    x = _noise(30, seed=9)

    def run():
        co = M.encode_mdct(x)
        xh = M.decode_mdct(co, 30).astype(np.int64)
        se = int(((x - xh) ** 2).sum())
        snr = 10 * math.log10(int((x * x).sum()) / se) if se else 999.0
        return snr, sum(1 for c in co if c != 0)

    snr1, nz1 = run()
    monkeypatch.setattr(
        M, "MDCT_QUANT", tuple(4 * q for q in M.MDCT_QUANT)
    )
    snr4, nz4 = run()
    assert snr4 < snr1, (snr1, snr4)
    assert nz4 <= nz1, (nz1, nz4)


def test_zero_and_determinism():
    z = np.zeros(30, dtype=np.int64)
    co = M.encode_mdct(z)
    assert all(c == 0 for c in co)
    assert list(M.decode_mdct(co, 30)) == [0] * 30
    x = _noise(30, seed=5)
    assert M.encode_mdct(x) == M.encode_mdct(list(int(v) for v in x))


def test_default_quant_profile_measured():
    """The shipped Q profile lands in the lossy-but-useful band on
    full-scale noise (the hardest input: no spectral concentration)."""
    x = _noise(30, seed=1)
    co = M.encode_mdct(x)
    xh = M.decode_mdct(co, 30).astype(np.int64)
    se = int(((x - xh) ** 2).sum())
    snr = 10 * math.log10(int((x * x).sum()) / se)
    assert 25.0 < snr < 70.0, snr
    assert len(co) == M.mdct_frame_count(30) * M.MDCT_N


def test_frame_count():
    assert M.mdct_frame_count(30) == 5
    assert M.mdct_frame_count(32) == 5
    assert M.mdct_frame_count(33) == 6
    assert M.mdct_frame_count(1) == 2


def test_table_matches_definition():
    """The integer table == the closed-form rounded entries (guards an
    accidental regeneration drift; the oracle inlines these exact
    numbers)."""
    T = M.mdct_table()
    N = M.MDCT_N
    for k in (0, 3, N - 1):
        for n in (0, 7, 2 * N - 1):
            w = math.sin(math.pi / (2 * N) * (n + 0.5))
            c = math.cos(math.pi / N * (n + 0.5 + N / 2.0) * (k + 0.5))
            assert T[k][n] == int(math.floor((1 << M.MDCT_BITS) * w * c + 0.5))
