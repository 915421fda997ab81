"""Definition-level invariants for ext238 (PPMI spectral embedding):
PPMI identities (independence => 0, symmetry), the Perron
nonnegativity that removes sign ambiguity, and power-iteration
convergence to the planted dominant block."""

from __future__ import annotations

import math

_E6 = 1_000_000


def _power(cells, vocab, rounds=8):
    v = {w: _E6 for w in vocab}
    for _ in range(rounds):
        u = {w: 0 for w in vocab}
        for (w, c), m in cells.items():
            u[w] += m * v[c]
        my = max(u.values())
        v = {w: (u[w] * _E6) // my for w in vocab}
    return v


def test_ppmi_zero_under_independence():
    """If n_wc = n_w n_c / N exactly, PMI = ln 1 = 0 and PPMI clamps
    at 0 -- independent co-occurrence carries no embedding signal."""
    n_w, n_c, nn = 20, 30, 600
    n_wc = n_w * n_c / nn  # = 1
    assert math.floor(1e9 * math.log(nn * n_wc / (n_w * n_c)) + 0.5) == 0


def test_ppmi_symmetric_for_symmetric_counts():
    """Symmetrized counts give a symmetric PPMI matrix (same marginal
    on both axes), the property the single-matvec iteration relies on."""
    counts = {("a", "b"): 4, ("b", "a"): 4, ("a", "a"): 2, ("b", "b"): 6}
    marg = {}
    for (w, _), n in counts.items():
        marg[w] = marg.get(w, 0) + n
    nn = sum(counts.values())
    p = {
        k: math.floor(1e9 * math.log(nn * n / (marg[k[0]] * marg[k[1]])) + 0.5)
        for k, n in counts.items()
    }
    assert p[("a", "b")] == p[("b", "a")]


def test_power_iteration_finds_planted_block():
    """Two disconnected blocks, one with double the weight: the
    principal direction concentrates on the heavy block and the light
    block's loadings decay toward 0."""
    heavy = {(w, c): 2_000_000_000 for w in "ab" for c in "ab" if w != c}
    light = {(w, c): 1_000_000_000 for w in "cd" for c in "cd" if w != c}
    v = _power({**heavy, **light}, vocab=list("abcd"), rounds=20)
    assert v["a"] == v["b"] == _E6
    assert v["c"] == v["d"] < _E6 // 100


def test_perron_nonnegative_start_stays_nonnegative():
    cells = {("a", "b"): 5, ("b", "a"): 5, ("b", "c"): 3, ("c", "b"): 3}
    v = _power(cells, vocab=list("abc"))
    assert all(x >= 0 for x in v.values())
    assert max(v.values()) == _E6  # renormalization contract
