"""Definition-level checks for the ext73 batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext73 import (
    _RBO_K,
    _RBO_P,
    _VAR_MIN_SEG,
    q_rank_biased_overlap,
    q_token_trend_slopes,
    q_variance_changepoint_scan,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _daily(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    uniq, idx = np.unique(days[order], return_index=True)
    return uniq, np.add.reduceat(cents[order], idx)


def test_variance_changepoint_matches_literal_scan(spark, sf_dir):
    row = q_variance_changepoint_scan(spark, sf_dir).collect()[0]
    days, x = _daily(spark, sf_dir)
    x = x.astype(object)
    n = len(x)
    s1 = np.cumsum(x)
    s2 = np.cumsum(x * x)
    best = None
    for t in range(_VAR_MIN_SEG, n - _VAR_MIN_SEG + 1):
        vb = (t * int(s2[t - 1]) - int(s1[t - 1]) ** 2) / (t * t)
        na = n - t
        va = (
            na * int(s2[-1] - s2[t - 1]) - int(s1[-1] - s1[t - 1]) ** 2
        ) / (na * na)
        if vb <= 0 or va <= 0:
            continue
        score = abs(math.log(va / vb))
        # argmax with earliest-date tiebreak == strictly-greater keeps first
        if best is None or score > best[0] + 1e-15:
            best = (score, t, vb, va)
    score, t, vb, va = best
    assert row["n_days_before"] == t
    assert str(row["split_date"]) == str(days[t - 1])[:10]
    assert abs(row["abs_log_var_ratio"] - score) < 1e-6
    assert abs(row["sd_before_dollars"] - math.sqrt(vb) / 100) < 1e-3
    assert abs(row["sd_after_dollars"] - math.sqrt(va) / 100) < 1e-3


def test_token_trends_match_literal_dense_fit(spark, sf_dir):
    got = {r["token"]: r for r in q_token_trend_slopes(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    counts = defaultdict(Counter)
    n_src = Counter()
    for r in docs.itertuples():
        si = int(r.source[3:])
        toks = r.text.split(" ")
        n_src[si] += len(toks)
        for t in toks:
            counts[t][si] += 1
    slopes = {}
    srcs = sorted(n_src)
    for tok, per in counts.items():
        if sum(per.values()) < 20:
            continue
        pts = [(si, (1000000 * per.get(si, 0)) // n_src[si]) for si in srcs]
        k = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        slopes[tok] = (round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6), sy)
    top = sorted(slopes.items(), key=lambda kv: (-abs(kv[1][0]), kv[0]))[:20]
    assert len(got) == 20
    for tok, (slope, sy) in top:
        assert tok in got, tok
        assert abs(got[tok]["slope_ppm_per_src"] - slope) < 2e-6
        assert got[tok]["total_ppm_mass"] == sy


def test_rbo_matches_literal_prefix_overlap(spark, sf_dir):
    row = q_rank_biased_overlap(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    df["yr"] = df.o_orderdate.dt.year
    df["cents"] = np.floor(df.l_extendedprice * 100 + 0.5).astype("int64")

    def ranking(year):
        rev = df[df.yr == year].groupby("l_partkey").cents.sum()
        ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:_RBO_K]
        return {pk: i + 1 for i, (pk, _) in enumerate(ordered)}

    ra, rb = ranking(1996), ranking(1997)
    common = {pk: max(ra[pk], rb[pk]) for pk in ra if pk in rb}
    rbo = ao = 0
    for d in range(1, _RBO_K + 1):
        x = sum(1 for mr in common.values() if mr <= d)
        rbo += int(math.floor(1e12 * (1 - _RBO_P) * _RBO_P ** (d - 1) * x / d + 0.5))
        ao += int(math.floor(1e12 * x / d / _RBO_K + 0.5))
    assert row["k"] == _RBO_K
    assert row["n_common"] == len(common)
    assert abs(row["rbo_truncated"] - rbo / 1e12) < 1e-6
    assert abs(row["average_overlap"] - ao / 1e12) < 1e-6
    # overlap metrics live in [0, 1]; AO dominates truncated RBO here
    assert 0.0 <= row["rbo_truncated"] <= 1.0
    assert 0.0 <= row["average_overlap"] <= 1.0
