"""ext130: literal re-derivations -- temperature weights from raw
float powers (+ ordering/flattening properties), boilerplate yield
from dict chunk counting."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext130 import (
    _BOILER_DOC_FRAC,
    _CHUNK,
    _TAUS,
    q_boilerplate_strip_stats,
    q_mixture_temperature_weights,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_temperature_weights_match_literal(spark, sf_dir):
    rows = q_mixture_temperature_weights(spark, sf_dir).collect()
    got = {(r["source"], r["tau"]): r for r in rows}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    q = defaultdict(list)
    for r in docs:
        t = r["text"].split(" ")
        q[r["source"]].append(round(1e6 * len(set(t)) / len(t)))
    qm = {s: sum(v) // len(v) for s, v in q.items()}
    n_total = sum(len(v) for v in q.values())
    for tau in _TAUS:
        pw = {s: (qm[s] / 1e6) ** (1.0 / tau) for s in qm}
        tot = sum(pw.values())
        for s in qm:
            r = got[(s, round(tau, 1))]
            w = pw[s] / tot
            assert r["weight"] == pytest.approx(w, abs=5e-6)
            assert r["oversample_factor"] == pytest.approx(
                w * n_total / len(q[s]), abs=1e-4
            )
        # weights sum to 1 at every temperature
        assert sum(got[(s, round(tau, 1))]["weight"] for s in qm) == pytest.approx(
            1.0, abs=1e-4
        )
    # higher tau flattens: the max weight shrinks monotonically
    maxw = [max(got[(s, round(t, 1))]["weight"] for s in qm) for t in _TAUS]
    assert maxw[0] >= maxw[1] >= maxw[2]


def test_boilerplate_yield_matches_dict(spark, sf_dir):
    got = {r["source"]: r for r in q_boilerplate_strip_stats(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    chunk_docs = defaultdict(set)
    doc_chunks = {}
    for r in docs:
        toks = r["text"].split(" ")
        cs = [
            " ".join(toks[i : i + _CHUNK]) for i in range(0, len(toks), _CHUNK)
        ]
        doc_chunks[r["doc_id"]] = (r["source"], cs)
        for c in cs:
            chunk_docs[c].add(r["doc_id"])
    n_docs = len(docs)
    per_source = defaultdict(lambda: [0, 0, 0, 0])  # docs, in, kept, emptied
    for doc_id, (src, cs) in doc_chunks.items():
        kept = sum(
            len(c.split(" "))
            for c in cs
            if len(chunk_docs[c]) <= _BOILER_DOC_FRAC * n_docs
        )
        total = sum(len(c.split(" ")) for c in cs)
        cell = per_source[src]
        cell[0] += 1
        cell[1] += total
        cell[2] += kept
        cell[3] += kept == 0
    for src, (nd, tin, tkept, emptied) in per_source.items():
        r = got[src]
        assert r["n_docs"] == nd
        assert r["tokens_in"] == tin
        assert r["tokens_kept"] == tkept
        assert r["kept_ppm"] == (1000000 * tkept) // tin
        assert r["docs_emptied"] == emptied
        assert 0 <= r["kept_ppm"] <= 1000000
