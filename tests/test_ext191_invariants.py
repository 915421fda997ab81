"""ext191: a from-scratch reference BPE trainer checked against the
in-engine query, plus the merge-semantics laws the double-separator
replace trick must satisfy (greedy non-overlap on runs, symbol
boundedness with multi-character symbols)."""

from __future__ import annotations

from collections import Counter

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext191 import (
    _ROUNDS,
    q_bpe_merge_training,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _bpe_reference(word_freq: dict, rounds: int):
    """Textbook BPE on (word -> freq): symbols as python tuples, the
    merge applied left-to-right non-overlapping."""
    vocab = {w: tuple(w) for w in word_freq}
    merges = []
    for _ in range(rounds):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += f
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def test_bpe_query_matches_reference(spark, sf_dir):
    row = q_bpe_merge_training(spark, sf_dir).collect()[0]
    words = (
        read_table(spark, sf_dir, "documents")
        .selectExpr("explode(split(text, ' ')) AS w")
        .where("w <> ''")
        .groupBy("w")
        .count()
        .collect()
    )
    wf = {r.w: r["count"] for r in words}
    merges, vocab = _bpe_reference(wf, _ROUNDS)
    for r in range(1, _ROUNDS + 1):
        a, b = merges[r - 1]
        assert getattr(row, f"merge_{r}") == f"{a}+{b}"
    assert row.n_words == len(wf)
    before = sum(f * len(w) for w, f in wf.items())
    after = sum(f * len(vocab[w]) for w, f in wf.items())
    assert (row.tokens_before, row.tokens_after) == (before, after)
    assert row.vocab_symbols_after == len(
        {s for syms in vocab.values() for s in syms}
    )
    assert row.compression_ratio == round(after / before, 6)


def test_reference_merge_laws():
    """The laws the replace trick must reproduce: (a,a) on a run of 4
    merges greedily into 2 (non-overlapping), and a multi-char symbol
    whose SUFFIX equals the merge's left side must not false-match."""
    merges, vocab = _bpe_reference({"aaaa": 1}, 1)
    assert merges[0] == ("a", "a")
    assert vocab["aaaa"] == ("aa", "aa")
    # 'xaxb': after merging (x, a) -> 'xa', a later (a, b) merge must
    # NOT fire inside ('xa', 'x', 'b') even though the string contains
    # 'a' adjacent to nothing -- i.e. only whole-symbol pairs merge
    wf = {"xaxb": 2, "ab": 3}
    merges, vocab = _bpe_reference(wf, 2)
    assert ("a", "b") in merges
    assert vocab["xaxb"].count("ab") == 0  # no symbol-suffix false hit
