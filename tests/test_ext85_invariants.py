"""Definition-level checks for ext85: literal per-row AB scores in
numpy, and brute-force subsequence scans for the support tables."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext85 import (
    q_ansari_bradley,
    q_sequence_support_pairs,
    q_sequence_support_triples,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_ansari_bradley_definition(spark, sf_dir):
    row = q_ansari_bradley(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).toPandas()
    sel = ev[ev.event_type.isin(["purchase", "click"])]
    v = np.floor(sel.value.to_numpy() * 100 + 0.5).astype("int64")
    arm = (sel.event_type == "purchase").to_numpy()
    n = len(v)
    n1, n0 = int(arm.sum()), int((~arm).sum())
    assert row["n_purchase"] == n1 and row["n_click"] == n0
    # literal midrank AB scores
    order = np.argsort(v, kind="stable")
    sv = v[order]
    scores = np.empty(n, dtype="float64")
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        block = np.arange(i + 1, j + 1, dtype="float64")
        a = np.minimum(block, n + 1 - block)
        scores[order[i:j]] = a.mean()
        i = j
    ab = scores[arm].sum()
    # ab_x2 uses per-value floor division: allow the <=1-per-value slack
    assert abs(row["ab_x2"] - 2 * ab) <= len(np.unique(v)) + 1
    e = n1 * scores.sum() / n
    var = (
        n1 * n0 * (n * (scores**2).sum() - scores.sum() ** 2)
        / (n * n * (n - 1))
    )
    z = (ab - e) / np.sqrt(var)
    assert abs(row["z_score"] - z) < 5e-3
    # score sanity: every score within [1, (N+1)/2]
    assert scores.min() >= 1.0 and scores.max() <= (n + 1) / 2


def _events(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    return ev


def test_sequence_pairs_definition(spark, sf_dir):
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in q_sequence_support_pairs(spark, sf_dir).collect()
    }
    ev = _events(spark, sf_dir)
    types = sorted(ev.event_type.unique())
    users = ev.user_id.unique()
    assert len(rows) == len(types) ** 2
    support = {(a, b): 0 for a in types for b in types}
    for _, grp in ev.groupby("user_id"):
        mn = grp.groupby("event_type").ts.min()
        mx = grp.groupby("event_type").ts.max()
        for a in mn.index:
            for b in mx.index:
                if mn[a] < mx[b]:
                    support[(a, b)] += 1
    for (a, b), r in rows.items():
        assert r["n_users"] == support[(a, b)]
        assert abs(r["support_rate"] - support[(a, b)] / len(users)) < 1e-6
    # a->b support can't exceed min of the marginals' user counts
    peru = ev.groupby("event_type").user_id.nunique()
    for (a, b), r in rows.items():
        assert r["n_users"] <= min(peru[a], peru[b])


def test_sequence_triples_definition(spark, sf_dir):
    got = q_sequence_support_triples(spark, sf_dir).collect()
    ev = _events(spark, sf_dir)
    users = ev.user_id.nunique()
    support = {}
    for _, grp in ev.groupby("user_id"):
        mn = grp.groupby("event_type").ts.min()
        mx = grp.groupby("event_type").ts.max()
        seen = set()
        for _, e in grp.iterrows():
            for a in mn.index:
                if mn[a] < e.ts:
                    for c in mx.index:
                        if e.ts < mx[c]:
                            seen.add((a, e.event_type, c))
        for key in seen:
            support[key] = support.get(key, 0) + 1
    expect = sorted(
        support.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1], kv[0][2])
    )[:20]
    assert len(got) == 20
    for r, ((a, b, c), cnt) in zip(got, expect):
        assert (r["type_a"], r["type_b"], r["type_c"]) == (a, b, c)
        assert r["n_users"] == cnt
        assert abs(r["support_rate"] - cnt / users) < 1e-6
