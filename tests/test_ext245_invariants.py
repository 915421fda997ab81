"""Definition-level invariants for ext245: the Panjer recursion vs
brute-force compound-Poisson convolution in exact fractions, and
Smith's rule vs the brute-force permutation minimum."""

from __future__ import annotations

import itertools
import random
from fractions import Fraction

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext245 import panjer_ratios


def _brute_ratios(lam: Fraction, f: dict, kmax: int):
    """g_k / g_0 by direct convolution: g = sum_n e^-lam lam^n/n! f^{*n};
    in ratio form r_k = sum_n (lam^n / n!) (f^{*n})_k -- exact
    fractions, no e^-lam anywhere."""
    conv = {0: Fraction(1)}  # f^{*0}
    r = [Fraction(0)] * (kmax + 1)
    r[0] = Fraction(1)
    term = Fraction(1)  # lam^n / n!
    for n in range(1, kmax + 1):
        new = {}
        for k, v in conv.items():
            for j, pj in f.items():
                if k + j <= kmax:
                    new[k + j] = new.get(k + j, Fraction(0)) + v * pj
        conv = new
        term *= lam / n
        for k, v in conv.items():
            r[k] += term * v
    return r


def test_panjer_equals_convolution():
    rng = random.Random(73)
    for _ in range(5):
        # random small severity pmf on 1..4, rational lambda < 2
        c = {j: rng.randint(1, 9) for j in range(1, 5)}
        N = sum(c.values())
        P, U, D = rng.randint(5, 60), rng.randint(10, 30), rng.randint(2, 9)
        lam = Fraction(P, U * D)
        if lam >= 2:
            continue
        f = {j: Fraction(cj, N) for j, cj in c.items()}
        kmax = 12
        brute = _brute_ratios(lam, f, kmax)
        fixed = panjer_ratios(P, U, D, N, c, kmax)
        for k in range(kmax + 1):
            exact_e15 = int(brute[k] * 10**15)
            # e15 truncation per step: error bounded by a few units
            # per level of recursion depth
            assert abs(fixed[k] - exact_e15) <= 40 * (k + 1), (
                k,
                fixed[k],
                exact_e15,
            )


def test_panjer_ratios_positive_and_unimodalish():
    r = panjer_ratios(100, 20, 10, 50, {1: 20, 2: 15, 3: 10, 4: 5})
    assert r[0] == 10**15
    assert all(x >= 0 for x in r)


def _wspt_obj(order, p, w):
    t, tot = 0, 0
    for i in order:
        t += p[i]
        tot += w[i] * t
    return tot


def test_smiths_rule_is_optimal_brute_force():
    rng = random.Random(79)
    for _ in range(15):
        n = rng.randint(3, 7)
        p = [rng.randint(1, 20) for _ in range(n)]
        w = [rng.randint(1, 50) for _ in range(n)]
        wspt = sorted(range(n), key=lambda i: (-Fraction(w[i], p[i]), i))
        best = min(
            _wspt_obj(list(perm), p, w)
            for perm in itertools.permutations(range(n))
        )
        assert _wspt_obj(wspt, p, w) == best
