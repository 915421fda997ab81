"""Definition-level checks for the ext24 batch: every query re-derived
from first principles in plain python/pandas/numpy (NOT the DuckDB
oracle SQL -- shared-formulation bugs don't survive an independent
recompute; see the ext16 Welch lesson in CLAUDE.md).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext24 import (
    q_adamic_adar_linkpred,
    q_containment_dup_pairs,
    q_hits_scores,
    q_quality_classifier_score,
    q_round_amount_bias,
    q_substring_dup_spans,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _shingles(text: str, w: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) <= w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_substring_dup_spans_matches_literal_recount(spark, sf_dir):
    got = q_substring_dup_spans(spark, sf_dir).toPandas().set_index("doc_id")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    sets = {r.doc_id: _shingles(r.text, 5) for r in docs.itertuples()}
    freq = Counter(t for s in sets.values() for t in s)
    assert len(got) == len(sets)
    for doc_id, s in sets.items():
        dups = sum(1 for t in s if freq[t] >= 2)
        row = got.loc[doc_id]
        assert int(row.n_shingles) == len(s)
        assert int(row.n_dup_shingles) == dups
        assert int(row.dup_ppm) == (1000000 * dups) // len(s)


def test_containment_pairs_match_literal_pairwise(spark, sf_dir):
    got = q_containment_dup_pairs(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    sets = {r.doc_id: _shingles(r.text, 3) for r in docs.itertuples()}
    freq = Counter(t for s in sets.values() for t in s)
    rare = {d: {t for t in s if freq[t] <= 50} for d, s in sets.items()}
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(rare[a] & rare[b])
            if c == 0:
                continue
            ppm = (1000000 * c) // min(len(sets[a]), len(sets[b]))
            if ppm >= 600000:
                expect[(a, b)] = (c, ppm)
    have = {
        (r.doc_a, r.doc_b): (int(r.n_common), int(r.containment_ppm))
        for r in got.itertuples()
    }
    assert have == expect


def test_quality_classifier_matches_literal_hash(spark, sf_dir):
    got = q_quality_classifier_score(spark, sf_dir).toPandas().set_index("doc_id")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    for r in docs.itertuples():
        toks = r.text.split(" ")
        s = 0
        for t in toks:
            bucket = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64
            s += (bucket * 2654435761) % 1001
        row = got.loc[r.doc_id]
        assert int(row.n_toks) == len(toks)
        assert int(row.score_sum) == s
        assert int(row.keep_flag) == int(2 * s >= 1000 * len(toks))


def test_adamic_adar_matches_literal_terms(spark, sf_dir):
    got = q_adamic_adar_linkpred(spark, sf_dir).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    e = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = set(zip(e.o_custkey, e.l_partkey))
    deg = Counter(c for c, _ in edges)
    by_cust = defaultdict(set)
    for c, p in edges:
        if 2 <= deg[c] <= 40:
            by_cust[c].add(p)
    scores: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for c, parts in by_cust.items():
        term = round(1e8 / math.log(deg[c]))
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                scores[(a, b)][0] += 1
                scores[(a, b)][1] += term
    ranked = sorted(
        ((aa, a, b, n) for (a, b), (n, aa) in scores.items() if n >= 2),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:100]
    assert len(got) == len(ranked)
    for row, (aa, a, b, n) in zip(got.itertuples(), ranked):
        assert (row.part_a, row.part_b, int(row.n_common), int(row.aa_e8)) == (a, b, n, aa)


def test_hits_matches_numpy_matrix_iteration(spark, sf_dir):
    got = q_hits_scores(spark, sf_dir).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    e = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = sorted(set(zip(e.o_custkey, e.l_suppkey)))
    custs = sorted({c for c, _ in edges})
    supps = sorted({s for _, s in edges})
    ci = {c: i for i, c in enumerate(custs)}
    si = {s: i for i, s in enumerate(supps)}
    A = np.zeros((len(custs), len(supps)), dtype=np.int64)
    for c, s in edges:
        A[ci[c], si[s]] = 1
    h0 = np.ones(len(custs), dtype=np.int64)
    a1 = A.T @ h0
    h1 = A @ a1
    a2 = A.T @ h1
    ranked = sorted(zip(supps, a1, a2), key=lambda t: (-t[2], t[0]))[:20]
    assert len(got) == len(ranked)
    for row, (s, d, sc) in zip(got.itertuples(), ranked):
        assert (row.suppkey, int(row.in_deg), int(row.auth_score)) == (s, int(d), int(sc))


def test_round_amount_bias_matches_literal_binomial(spark, sf_dir):
    got = q_round_amount_bias(spark, sf_dir).toPandas().set_index("o_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    o["is_round"] = (np.round(o.o_totalprice * 100).astype("int64") % 100 == 0).astype(int)
    g_n, g_k = len(o), int(o.is_round.sum())
    p = g_k / g_n
    per = o.groupby("o_custkey").agg(n=("is_round", "size"), k=("is_round", "sum"))
    per = per[per.n >= 10]
    assert set(got.index) == set(per.index)
    for cust, r in per.iterrows():
        z = (r.k / r.n - p) / math.sqrt(p * (1 - p) / r.n)
        assert math.isclose(float(got.loc[cust].z_score), z, abs_tol=1e-5)
        assert int(got.loc[cust].n_round) == int(r.k)
