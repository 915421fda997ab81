"""ext125: literal re-derivations -- James-Stein from raw group means
(+ dominance-direction properties), Mantel-Haenszel from per-stratum
dict cells, Yuen from a literal sort-trim-winsorize."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext125 import (
    _TRIM,
    q_james_stein_means,
    q_mantel_haenszel_pooled,
    q_yuen_trimmed_t,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def test_james_stein_matches_literal(spark, sf_dir):
    got = {r["nation"]: r for r in q_james_stein_means(spark, sf_dir).collect()}
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rows = o.join(c, o.o_custkey == c.c_custkey).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["c_nationkey"]].append(round(r["o_totalprice"] * 100))
    m = {k: np.mean(v) for k, v in groups.items()}
    a = len(groups)
    mbar = np.mean(list(m.values()))
    sse = sum(((np.array(v) - np.mean(v)) ** 2).sum() for v in groups.values())
    ntot = sum(len(v) for v in groups.values())
    vbar = (sse / (ntot - a)) * (np.mean([1 / len(v) for v in groups.values()]))
    bigs = sum((mi - mbar) ** 2 for mi in m.values())
    factor = max(0.0, 1 - (a - 3) * vbar / bigs)
    for k, mi in m.items():
        r = got[k]
        assert r["n"] == len(groups[k])
        assert r["raw_mean_dollars"] == pytest.approx(mi / 100, abs=1e-4)
        assert r["shrink_factor"] == pytest.approx(factor, abs=1e-5)
        assert r["js_mean_dollars"] == pytest.approx(
            (mbar + factor * (mi - mbar)) / 100, abs=1e-3
        )
        # shrinkage moves every estimate TOWARD the grand mean
        lo, hi = sorted((mi / 100, mbar / 100))
        assert lo - 1e-6 <= r["js_mean_dollars"] <= hi + 1e-6
    assert 0.0 <= factor <= 1.0


def test_mantel_haenszel_matches_literal(spark, sf_dir):
    got = q_mantel_haenszel_pooled(spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for r in cust:
        e = 1 if r["c_mktsegment"] in ("BUILDING", "MACHINERY") else 0
        o = 1 if r["c_acctbal"] > 5000 else 0
        idx = {(1, 1): 0, (1, 0): 1, (0, 1): 2, (0, 0): 3}[(e, o)]
        cells[r["c_nationkey"]][idx] += 1
    num = den = ea = va = 0.0
    sa = 0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
        sa += a
        ea += (a + b) * (a + c) / n
        va += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert got["n_strata"] == len(cells)
    assert got["sum_a"] == sa
    assert got["or_mh"] == pytest.approx(num / den, abs=2e-6)
    cmh = (abs(sa - ea) - 0.5) ** 2 / va
    assert got["cmh_stat"] == pytest.approx(cmh, abs=2e-5)


def test_yuen_matches_literal_sort(spark, sf_dir):
    got = q_yuen_trimmed_t(spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").collect()
    arms = {1: [], 0: []}
    for r in cust:
        if r["c_mktsegment"] == "HOUSEHOLD":
            arms[1].append(round(r["c_acctbal"] * 100))
        elif r["c_mktsegment"] == "FURNITURE":
            arms[0].append(round(r["c_acctbal"] * 100))

    def yuen_parts(xs):
        xs = sorted(xs)
        n = len(xs)
        g = int(math.floor(_TRIM * n))
        h = n - 2 * g
        trimmed = xs[g : n - g]
        tmean = sum(trimmed) / h
        lo, hi = xs[g], xs[n - g - 1]
        wins = [min(max(x, lo), hi) for x in xs]
        wvar = (sum(w * w for w in wins) - sum(wins) ** 2 / n) / (n - 1)
        return n, g, h, tmean, wvar

    n1, g1, h1, tm1, wv1 = yuen_parts(arms[1])
    n0, g0, h0, tm0, wv0 = yuen_parts(arms[0])
    assert (got["n_house"], got["n_furn"]) == (n1, n0)
    assert got["trimmed_mean_house"] == pytest.approx(tm1 / 100, abs=1e-4)
    assert got["trimmed_mean_furn"] == pytest.approx(tm0 / 100, abs=1e-4)
    d1 = (n1 - 1) * wv1 / (h1 * (h1 - 1))
    d0 = (n0 - 1) * wv0 / (h0 * (h0 - 1))
    assert got["yuen_t"] == pytest.approx(
        (tm1 - tm0) / math.sqrt(d1 + d0), abs=2e-5
    )
