"""ext173: literal re-derivations -- Zeta vs a set-based doc-frequency
loop (plus the bounds -1 <= zeta <= 1 and the spam-immunity law: token
repetition inside one doc cannot move zeta), fightin' words vs a
Counter loop (plus the shrinkage law: with equal counts z == 0, and
the prior pulls a rare skewed word's |z| below a frequent one's), and
BY vs the step-up loop (plus the dominance law: BY rejections are a
subset of BH rejections)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext173 import (
    _ALPHA0,
    _ALPHA_FDR,
    _MIN_DF,
    q_by_fdr_dependent,
    q_craigs_zeta_markers,
    q_fightin_words_logodds,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    return [
        (r["doc_id"], 1 if r["lang"] == "en" else 0,
         [t.lower() for t in r["text"].split(" ") if t])
        for r in rows
    ]


def test_zeta_matches_loop(spark, sf_dir, corpus):
    got = q_craigs_zeta_markers(spark, sf_dir).collect()
    na = sum(1 for _, g, _ in corpus if g == 1)
    nb = sum(1 for _, g, _ in corpus if g == 0)
    dfa, dfb = Counter(), Counter()
    for _, g, toks in corpus:
        for t in set(toks):
            (dfa if g == 1 else dfb)[t] += 1
    cands = [
        (math.floor((dfa[t] / na - dfb[t] / nb) * 1e9 + 0.5), t)
        for t in set(dfa) | set(dfb)
        if dfa[t] + dfb[t] >= _MIN_DF
    ]
    cands.sort(key=lambda kv: (-kv[0], kv[1]))
    assert [(r["marker_word"]) for r in got] == [t for _, t in cands[:10]]
    for r, (z_e9, t) in zip(got, cands[:10]):
        assert r["df_english"] == dfa[t]
        assert r["df_other"] == dfb[t]
        assert r["zeta"] == pytest.approx(z_e9 / 1e9, abs=1e-6)
        assert -1.0 - 1e-9 <= r["zeta"] <= 1.0 + 1e-9


def test_zeta_spam_immunity_law():
    # repeating a token 1000x inside one doc changes df by nothing
    doc_a = ["x"] * 1000 + ["y"]
    doc_b = ["x", "z"]
    assert set(doc_a) == {"x", "y"}  # df contribution is set-based
    assert len(set(doc_a) & {"x"}) == len(set(doc_b) & {"x"})


def test_fightin_words_matches_loop(spark, sf_dir, corpus):
    got = q_fightin_words_logodds(spark, sf_dir).collect()
    ya, yb = Counter(), Counter()
    for _, g, toks in corpus:
        for t in toks:
            (ya if g == 1 else yb)[t] += 1
    na, nb = sum(ya.values()), sum(yb.values())
    nn = na + nb
    cands = []
    for t in set(ya) | set(yb):
        tot = ya[t] + yb[t]
        if tot < _MIN_DF:
            continue
        aw = _ALPHA0 * (tot / nn)
        delta = math.log(
            (ya[t] + aw) / (na + _ALPHA0 - ya[t] - aw)
        ) - math.log((yb[t] + aw) / (nb + _ALPHA0 - yb[t] - aw))
        z = delta / math.sqrt(1 / (ya[t] + aw) + 1 / (yb[t] + aw))
        cands.append((math.floor(z * 1e6 + 0.5), t))
    cands.sort(key=lambda kv: (-kv[0], kv[1]))
    assert [r["word"] for r in got] == [t for _, t in cands[:10]]
    for r, (z_e6, t) in zip(got, cands[:10]):
        assert r["count_english"] == ya[t]
        assert r["count_other"] == yb[t]
        assert r["z_logodds"] == pytest.approx(z_e6 / 1e6, abs=1e-6)


def test_fightin_words_shrinkage_laws():
    na = nb = 10000
    nn = na + nb

    def z(ya, yb):
        aw = _ALPHA0 * ((ya + yb) / nn)
        delta = math.log((ya + aw) / (na + _ALPHA0 - ya - aw)) - math.log(
            (yb + aw) / (nb + _ALPHA0 - yb - aw)
        )
        return delta / math.sqrt(1 / (ya + aw) + 1 / (yb + aw))

    assert z(50, 50) == pytest.approx(0.0, abs=1e-12)
    # rare 5-0 word shrinks below a frequent 300-150 word
    assert abs(z(5, 0)) < abs(z(300, 150))


def test_by_matches_loop_and_dominance(spark, sf_dir):
    rows = q_by_fdr_dependent(spark, sf_dir).collect()
    m = len(rows)
    hm = sum(10**12 // k for k in range(1, m + 1)) / 1e12
    ps = sorted((r["p_e8"] / 1e8, r["nation"]) for r in rows)
    k_bh = max(
        (k for k in range(1, m + 1) if ps[k - 1][0] <= _ALPHA_FDR * k / m),
        default=0,
    )
    k_by = max(
        (
            k
            for k in range(1, m + 1)
            if ps[k - 1][0] <= _ALPHA_FDR * k / (m * hm)
        ),
        default=0,
    )
    for r in rows:
        assert r["rejected_bh"] == (1 if r["rank_p"] <= k_bh else 0)
        assert r["rejected_by"] == (1 if r["rank_p"] <= k_by else 0)
        # dominance: BY can only reject a subset of BH
        assert r["rejected_by"] <= r["rejected_bh"]
    assert sum(r["rejected_by"] for r in rows) <= sum(
        r["rejected_bh"] for r in rows
    )
