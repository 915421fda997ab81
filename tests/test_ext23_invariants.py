"""Definition-level re-derivations for the ext23 batch (LSH quality
eval, freshness audit, skew profile)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext23 import (
    _J_THRESHOLD,
    q_join_skew_profile,
    q_lsh_recall_eval,
    q_source_freshness_audit,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _shingles(text: str, w: int = 3) -> set:
    toks = text.split(" ")
    if len(toks) <= w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_lsh_eval_truth_matches_python_jaccard(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {r["doc_id"]: _shingles(r["text"]) for r in docs}
    # inverted index -> candidate doc pairs sharing >= 1 shingle
    inv = defaultdict(list)
    for d, s in sh.items():
        for t in s:
            inv[t].append(d)
    cand = set()
    for ds in inv.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                cand.add((a, b))
    truth = {
        (a, b)
        for a, b in cand
        if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= _J_THRESHOLD
    }
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    ddf = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(ddf, "doc_id", "text", n_hashes=8, shingle_w=3)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
        .select("doc_a", "doc_b")
        .collect()
    }
    row = q_lsh_recall_eval(spark, sf_dir).collect()[0]
    assert row["n_truth"] == len(truth)
    assert row["n_candidates"] == len(cands)
    assert row["n_hits"] == len(truth & cands)
    if cands:
        assert math.isclose(
            row["precision"], round(len(truth & cands) / len(cands), 6), abs_tol=1e-9
        )
    if truth:
        assert math.isclose(
            row["recall"], round(len(truth & cands) / len(truth), 6), abs_tol=1e-9
        )
        # the sketch tier must actually be GOOD at test scale
        assert row["recall"] >= 0.8


def test_freshness_matches_python(spark, sf_dir):
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    hw = max(r["us"] for r in ev)
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(r["us"])
    got = {r["event_type"]: r for r in q_source_freshness_audit(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, us in by_type.items():
        r = got[t]
        assert r["n_events"] == len(us)
        assert r["lag_us"] == hw - max(us)
        assert r["lag_seconds"] == (hw - max(us)) // 1000000
        assert r["n_last_24h"] == sum(1 for u in us if u >= hw - 86400000000)


def test_skew_profile_matches_numpy(spark, sf_dir):
    import numpy as np

    counts = defaultdict(int)
    for r in read_table(spark, sf_dir, "orders").select("o_custkey").collect():
        counts[r["o_custkey"]] += 1
    c = np.array(sorted(counts.values()), dtype=float)
    row = q_join_skew_profile(spark, sf_dir).collect()[0]
    assert row["n_keys"] == len(c)
    assert row["n_rows"] == int(c.sum())
    assert row["max_rows"] == int(c.max())
    p99 = round(float(np.percentile(c, 99)), 4)  # linear interpolation
    assert row["p99_rows_e4"] == round(p99 * 10000)
    assert math.isclose(
        row["skew_ratio"], round(c.max() * len(c) / c.sum(), 6), abs_tol=1e-9
    )
