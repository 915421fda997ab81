"""ext149: literal re-derivations -- a textbook Python BWT (sorted
rotations) on real docs plus the classic 'banana' fixture, the Fano/
branching estimator from a Counter, and winsorized Pearson from plain
loops."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext149 import (
    q_bwt_compressibility_gain,
    q_hawkes_branching_fano,
    q_winsorized_corr,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def _bwt(text: str) -> str:
    n = len(text)
    dd = text + text
    rots = sorted(range(n), key=lambda i: dd[i : i + n])
    return "".join(dd[i + n - 1] for i in rots)


def _runs(s: str) -> int:
    return 1 + sum(1 for a, b in zip(s, s[1:]) if a != b) if s else 0


def test_bwt_on_the_banana_fixture():
    # the canonical worked example: BWT("banana") groups letters
    assert _bwt("banana") == "nnbaaa"
    assert _runs("banana") == 6
    assert _runs("nnbaaa") == 3


def test_bwt_query_matches_python_bwt(spark, sf_dir):
    got = {r["source"]: r for r in q_bwt_compressibility_gain(spark, sf_dir).collect()}
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    agg = {}
    for r in docs:
        t = r["text"]
        if len(t) < 2:
            continue
        a = agg.setdefault(r["source"], [0, 0, 0])
        a[0] += 1
        a[1] += _runs(t)
        a[2] += _runs(_bwt(t))
    assert set(got) == set(agg)
    for src, (nd, raw, bw) in agg.items():
        row = got[src]
        assert row["n_docs"] == nd
        assert row["total_runs_raw"] == raw
        assert row["total_runs_bwt"] == bw
        assert row["bwt_run_ppm"] == 1_000_000 * bw // raw
        # on natural text BWT should not WORSEN run structure much;
        # sanity: ppm stays within [3e5, 1.2e6]
        assert 300_000 <= row["bwt_run_ppm"] <= 1_200_000


def test_hawkes_fano_matches_counter(spark, sf_dir):
    row = q_hawkes_branching_fano(spark, sf_dir).collect()[0]
    ev = convert_event_ts(read_table(spark, sf_dir, "events")).select("ts").collect()
    mins = Counter(
        int(r["ts"].timestamp() * 1e6) // 60_000_000 for r in ev
    )
    n_bins = max(mins) - min(mins) + 1
    sk = sum(mins.values())
    skk = sum(k * k for k in mins.values())
    mean = sk / n_bins
    var = skk / n_bins - mean * mean
    fano = var / mean
    assert row["n_bins"] == n_bins
    assert row["n_occupied"] == len(mins)
    assert row["n_events"] == sk
    assert row["fano_factor"] == pytest.approx(fano, abs=1e-5)
    assert row["hawkes_branching_ratio"] == pytest.approx(
        max(0.0, 1 - 1 / math.sqrt(fano)), abs=1e-5
    )


def test_winsorized_corr_matches_loop(spark, sf_dir):
    row = q_winsorized_corr(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"*": "count", "o_totalprice": "sum"})
        .collect()
    )
    ks = [r["count(1)"] for r in daily]
    cs = [round(r["sum(o_totalprice)"] * 100) for r in daily]
    n = len(ks)

    def clamp(vals):
        sv = sorted(vals)
        # min v with 20*cc >= n  /  >= 19n (cc = rank in sorted order)
        lo = next(v for i, v in enumerate(sv, 1) if 20 * i >= n)
        hi = next(v for i, v in enumerate(sv, 1) if 20 * i >= 19 * n)
        return [min(max(v, lo), hi) for v in vals]

    x, y = clamp(ks), clamp(cs)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n_days"] == n
    assert row["winsorized_pearson"] == pytest.approx(r, abs=1e-6)
    assert -1 <= row["winsorized_pearson"] <= 1
