"""Definition-level checks for ext95: Counter-based keyness, entropy
ladder, and t-score re-derivations."""

from __future__ import annotations

from collections import Counter
from math import log, log2, sqrt

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext95 import (
    q_entropy_rate_ladder,
    q_keyness_loglik,
    q_tscore_collocations,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _corpus(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).toPandas()


def test_keyness_definition(spark, sf_dir):
    rows = q_keyness_loglik(spark, sf_dir).collect()
    docs = _corpus(spark, sf_dir)
    ca, cb = Counter(), Counter()
    for r in docs.itertuples():
        si = int(r.source[3:])
        (ca if si < 10 else cb).update(r.text.split(" "))
    na, nb = sum(ca.values()), sum(cb.values())
    scored = []
    for tok in set(ca) | set(cb):
        a, b = ca[tok], cb[tok]
        ea = (a + b) * na / (na + nb)
        eb = (a + b) * nb / (na + nb)
        g2 = 2 * ((a * log(a / ea) if a else 0) + (b * log(b / eb) if b else 0))
        keyed = "first-half" if a / na > b / nb else "second-half"
        scored.append((tok, a, b, g2, keyed))
    scored.sort(key=lambda t: (-round(t[3] * 1e6), t[0]))
    assert len(rows) == 20
    for r, (tok, a, b, g2, keyed) in zip(rows, scored[:20]):
        assert r["token"] == tok
        assert r["count_first"] == a and r["count_second"] == b
        assert abs(r["g2_keyness"] - g2) < 1e-3
        assert r["keyed_to"] == keyed
    # G2 is nonnegative
    assert all(r["g2_keyness"] >= 0 for r in rows)


def test_entropy_ladder_definition(spark, sf_dir):
    row = q_entropy_rate_ladder(spark, sf_dir).collect()[0]
    docs = _corpus(spark, sf_dir)
    uni, bi = Counter(), Counter()
    for t in docs.text:
        w = t.split(" ")
        uni.update(w)
        bi.update(zip(w[:-1], w[1:]))
    n = sum(uni.values())
    m = sum(bi.values())
    h1 = sum(c / n * log2(n / c) for c in uni.values())
    hj = sum(c / m * log2(m / c) for c in bi.values())
    v = len(uni)
    assert row["vocab"] == v
    assert abs(row["h0_bits"] - log2(v)) < 1e-6
    assert abs(row["h1_bits"] - h1) < 1e-4
    assert abs(row["h2_bits"] - (hj - h1)) < 1e-4
    assert abs(row["redundancy"] - (1 - (hj - h1) / log2(v))) < 1e-4
    # the ladder must descend: context can only reduce entropy
    assert row["h0_bits"] >= row["h1_bits"] >= row["h2_bits"] > 0


def test_tscore_definition(spark, sf_dir):
    rows = q_tscore_collocations(spark, sf_dir).collect()
    docs = _corpus(spark, sf_dir)
    uni, bi = Counter(), Counter()
    for t in docs.text:
        w = t.split(" ")
        uni.update(w)
        bi.update(zip(w[:-1], w[1:]))
    n = sum(uni.values())
    scored = []
    for (a, b), fab in bi.items():
        t = (fab - uni[a] * uni[b] / n) / sqrt(fab)
        scored.append((a, b, fab, t))
    scored.sort(key=lambda x: (-round(x[3] * 1e6), x[0], x[1]))
    assert len(rows) == 20
    for r, (a, b, fab, t) in zip(rows, scored[:20]):
        assert r["bigram"] == f"{a} {b}"
        assert r["pair_count"] == fab
        assert abs(r["t_score"] - t) < 1e-3
