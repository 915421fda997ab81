"""ext155: literal re-derivations -- RRF from sorted-rank dicts,
TOPSIS from numpy-free loops (plus the weight-sum and closeness-range
laws), and the near-dup screen from an O(n^2)-within-customer loop
that ignores the bucketing entirely (so a banding miss shows up)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext155 import (
    _RRF_K,
    q_near_duplicate_payments,
    q_rrf_quality_fusion,
    q_topsis_nation_ranking,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_rrf_matches_sorted_ranks(spark, sf_dir):
    got = [(r["doc_id"], r["rrf_score"]) for r in q_rrf_quality_fusion(spark, sf_dir).collect()]
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    lang_n = Counter(r["lang"] for r in docs)
    sig = {
        r["doc_id"]: (
            len(re.sub(r"[^a-z]", "", r["text"])),
            len(re.findall(r"[a-z]{7,}", r["text"])),
            lang_n[r["lang"]],
        )
        for r in docs
    }

    def ranks(idx):
        order = sorted(sig, key=lambda d: (-sig[d][idx], d))
        return {d: i + 1 for i, d in enumerate(order)}

    r0, r1, r2 = ranks(0), ranks(1), ranks(2)
    fused = {
        d: sum(
            math.floor(1e12 / (_RRF_K + r[d]) + 0.5) for r in (r0, r1, r2)
        )
        for d in sig
    }
    expected = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (d, s), (de, se) in zip(got, expected):
        assert s == pytest.approx(se / 1e12, abs=1e-9)


def test_topsis_matches_loop_and_laws(spark, sf_dir):
    rows = q_topsis_nation_ranking(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(spark, sf_dir, "customer").collect()
    }
    rev, cnt, custs = defaultdict(int), defaultdict(int), defaultdict(set)
    for r in orders:
        nat = cust[r["o_custkey"]]
        rev[nat] += round(r["o_totalprice"] * 100)
        cnt[nat] += 1
        custs[nat].add(r["o_custkey"])
    nations = sorted(rev)
    k = len(nations)
    mats = [
        {n: rev[n] for n in nations},
        {n: cnt[n] for n in nations},
        {n: len(custs[n]) for n in nations},
    ]
    shares = []
    for m in mats:
        tot = sum(m.values())
        shares.append({n: m[n] / tot for n in nations})
    ds = [
        1 + sum(p * math.log(p) for p in s.values()) / math.log(k)
        for s in shares
    ]
    ws = [d / sum(ds) for d in ds]
    close = {}
    for n in nations:
        dp = math.sqrt(
            sum(
                (ws[i] * (shares[i][n] - max(shares[i].values()))) ** 2
                for i in range(3)
            )
        )
        dm = math.sqrt(
            sum(
                (ws[i] * (shares[i][n] - min(shares[i].values()))) ** 2
                for i in range(3)
            )
        )
        close[n] = 0.5 if dp + dm == 0 else dm / (dp + dm)
    by = {r["nation"]: r for r in rows}
    for n in nations:
        assert by[n]["topsis_closeness"] == pytest.approx(close[n], abs=1e-5)
        assert 0 <= by[n]["topsis_closeness"] <= 1
    # output ordered by closeness desc
    cls = [r["topsis_closeness"] for r in rows]
    assert cls == sorted(cls, reverse=True)


def test_near_dup_matches_quadratic_loop(spark, sf_dir):
    row = q_near_duplicate_payments(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).collect()
    per = defaultdict(list)
    for r in orders:
        per[r["o_custkey"]].append(
            (
                r["o_orderkey"],
                math.floor(r["o_totalprice"] * 100 + 0.5),
                r["o_orderdate"],
            )
        )
    pairs = set()
    gaps_c, gaps_d = [], []
    for cust, lst in per.items():
        for i in range(len(lst)):
            for j in range(len(lst)):
                a, b = lst[i], lst[j]
                if (
                    a[0] < b[0]
                    and abs(a[1] - b[1]) <= 100
                    and a[1] != b[1]
                    and a[2] != b[2]
                ):
                    key = (cust, a[0], b[0])
                    if key not in pairs:
                        pairs.add(key)
                        gaps_c.append(abs(a[1] - b[1]))
                        gaps_d.append(abs((a[2] - b[2]).days))
    assert row["n_near_dup_pairs"] == len(pairs)
    assert row["n_flagged_customers"] == len({c for c, _, _ in pairs})
    assert row["min_gap_cents"] == (min(gaps_c) if gaps_c else 0)
    if gaps_d:
        assert row["avg_gap_days"] == pytest.approx(
            sum(gaps_d) / len(gaps_d), abs=1e-5
        )
