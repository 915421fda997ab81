"""ext115: the streaming minhash/LSH band fold must equal BOTH the
batch operator (Spark vs Spark) and a from-scratch pure-python LSH
re-derivation (definition level -- catches shared-formulation bugs the
oracle can't see)."""

from __future__ import annotations

import hashlib

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext115 import (
    _BAND_SIZE,
    _MAX_BUCKET,
    _N_HASHES,
    q_streaming_minhash_replay,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _py_lsh_pairs(docs: dict[int, str]) -> set[tuple[int, int]]:
    """Literal re-derivation: h_i(tok) = (i%2)-th 16-hex half of
    md5(f'{i//2}:{tok}'), signature = lexicographic min over distinct
    tokens, band hash = md5 of the '|'-joined slice, cap, self-join."""
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in docs.items():
        toks = set(text.split(" "))
        sig = []
        for i in range(_N_HASHES):
            half = slice(16 * (i % 2), 16 * (i % 2) + 16)
            sig.append(
                min(
                    hashlib.md5(f"{i // 2}:{t}".encode()).hexdigest()[half]
                    for t in toks
                )
            )
        for b in range(_N_HASHES // _BAND_SIZE):
            bh = hashlib.md5(
                "|".join(sig[b * _BAND_SIZE : (b + 1) * _BAND_SIZE]).encode()
            ).hexdigest()
            buckets.setdefault((b, bh), []).append(doc_id)
    pairs = set()
    for members in buckets.values():
        if len(members) > _MAX_BUCKET:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                pairs.add((a, b))
    return pairs


def test_streaming_fold_equals_batch_operator(spark, sf_dir):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_streaming_minhash_replay(spark, sf_dir).collect()
    }
    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=_N_HASHES)
    want = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", n_hashes=_N_HASHES, band_size=_BAND_SIZE,
            max_bucket_size=_MAX_BUCKET,
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_fold_matches_python_rederivation(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in q_streaming_minhash_replay(spark, sf_dir).collect()
    }
    assert got == _py_lsh_pairs(docs)
