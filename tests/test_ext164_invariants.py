"""ext164: literal re-derivations of the two-sample rank tests --
Siegel-Tukey vs an alternating-assignment loop (plus the law that the
ST ranks are a permutation of 1..N), Mood vs the squared-centered-rank
loop (plus the pooled identity sum over BOTH groups = N(N^2-1)/12),
and Wald-Wolfowitz vs a run-count loop (plus the bound
2 <= R <= 2*min(nx,ny)+1)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext164 import (
    q_mood_scale_test,
    q_siegel_tukey,
    q_wald_wolfowitz_runs2,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _st_ranks(n):
    """Siegel-Tukey alternating ranks a[p] for sorted positions 1..n."""
    a = [0] * (n + 1)
    lo, hi, r = 1, n, 1
    take_low, pair = True, 1
    # canonical assignment: 1->min; 2,3->max pair; 4,5->min pair; ...
    a[1] = 1
    r = 2
    lo = 2
    while lo <= hi:
        # pair from the high end
        if r <= n:
            a[hi] = r
            r += 1
        if hi - 1 >= lo:
            a[hi - 1] = r
            r += 1
        hi -= 2
        # pair from the low end
        if lo <= hi:
            a[lo] = r
            r += 1
        if lo + 1 <= hi:
            a[lo + 1] = r
            r += 1
        lo += 2
    return a[1:]


@pytest.fixture(scope="module")
def merged(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    rows = [(r[0], round(r[1] * 100)) for r in daily]
    rows.sort(key=lambda t: (t[1], t[0]))
    # weekend flag: python weekday() 5=Sat 6=Sun
    def wknd(d):
        wd = d.weekday() if hasattr(d, "weekday") else d.date().weekday()
        return 1 if wd >= 5 else 0

    return [(wknd(d), p + 1) for p, (d, _) in enumerate(rows)]


def test_st_rank_closed_form_is_permutation():
    for n in (4, 5, 9, 10, 37):
        loop = _st_ranks(n)
        closed = []
        for p in range(1, n + 1):
            if p <= (n + 1) // 2:
                a = 2 * p if p % 2 == 0 else 2 * p - 1
            else:
                q = n + 1 - p
                a = 2 * q if q % 2 == 1 else 2 * q - 1
            closed.append(a)
        assert sorted(closed) == list(range(1, n + 1))
        assert closed == loop


def test_siegel_tukey_matches_loop(spark, sf_dir, merged):
    row = q_siegel_tukey(spark, sf_dir).collect()[0]
    n = len(merged)
    nx = sum(g for g, _ in merged)
    ny = n - nx
    w = 0
    for g, p in merged:
        if p <= (n + 1) // 2:
            a = 2 * p if p % 2 == 0 else 2 * p - 1
        else:
            q = n + 1 - p
            a = 2 * q if q % 2 == 1 else 2 * q - 1
        if g == 1:
            w += a
    z = (w - nx * (n + 1) / 2.0) / math.sqrt(nx * ny * (n + 1) / 12.0)
    assert (row["n_weekend"], row["n_weekday"]) == (nx, ny)
    assert row["st_rank_sum"] == w
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_two_sided"] == pytest.approx(
        math.erfc(abs(z) / math.sqrt(2)), abs=2e-6
    )


def test_mood_matches_loop_and_pooled_identity(spark, sf_dir, merged):
    row = q_mood_scale_test(spark, sf_dir).collect()[0]
    n = len(merged)
    nx = sum(g for g, _ in merged)
    ny = n - nx
    m = sum((p - (n + 1) / 2.0) ** 2 for g, p in merged if g == 1)
    both = sum((p - (n + 1) / 2.0) ** 2 for _, p in merged)
    assert both == pytest.approx(n * (n * n - 1) / 12.0, abs=1e-6)
    z = (m - nx * (n * n - 1) / 12.0) / math.sqrt(
        nx * ny * (n + 1) * (n * n - 4) / 180.0
    )
    assert row["mood_m"] == pytest.approx(m, abs=0.01)
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_two_sided"] == pytest.approx(
        math.erfc(abs(z) / math.sqrt(2)), abs=2e-6
    )


def test_ww_runs_matches_loop(spark, sf_dir, merged):
    row = q_wald_wolfowitz_runs2(spark, sf_dir).collect()[0]
    n = len(merged)
    nx = sum(g for g, _ in merged)
    ny = n - nx
    labels = [g for g, _ in sorted(merged, key=lambda t: t[1])]
    runs = 1 + sum(
        1 for i in range(1, len(labels)) if labels[i] != labels[i - 1]
    )
    er = 1 + 2 * nx * ny / n
    z = (runs - er) / math.sqrt(
        2 * nx * ny * (2 * nx * ny - n) / (n * n * (n - 1))
    )
    assert row["n_runs"] == runs
    assert 2 <= runs <= 2 * min(nx, ny) + 1
    assert row["expected_runs"] == pytest.approx(er, abs=0.01)
    assert row["z"] == pytest.approx(z, abs=1e-4)
    assert row["p_too_few_runs"] == pytest.approx(
        0.5 * (1 + math.erf(z / math.sqrt(2))), abs=2e-6
    )
