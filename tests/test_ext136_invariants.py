"""ext136: literal re-derivations of the readability indices from
collected document text -- independently coded counts (Python re
module, per-word loops) so a shared regex/formula bug between the
Spark and DuckDB expressions cannot hide behind the hash oracle."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext136 import (
    q_flesch_reading_ease,
    q_readability_indices,
    q_smog_polysyllable,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def per_source(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "documents").select("source", "text").collect()
    )
    acc = defaultdict(
        lambda: {"docs": 0, "w": 0, "c": 0, "lw": 0, "s": 0, "sy": 0, "poly": 0}
    )
    for r in rows:
        a = acc[r["source"]]
        words = re.findall(r"[a-z]+", r["text"])
        a["docs"] += 1
        a["w"] += len(words)
        a["c"] += sum(len(w) for w in words)
        a["lw"] += sum(1 for w in words if len(w) > 6)
        a["s"] += max(len(re.findall(r"[.!?]+", r["text"])), 1)
        for w in words:
            groups = len(re.findall(r"[aeiouy]+", w))
            a["sy"] += groups
            a["poly"] += groups >= 3
    return dict(acc)


def test_readability_indices_match_literal(spark, sf_dir, per_source):
    got = {r["source"]: r for r in q_readability_indices(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for src, a in per_source.items():
        r = got[src]
        assert r["n_docs"] == a["docs"]
        assert r["n_words"] == a["w"]
        ari = 4.71 * a["c"] / a["w"] + 0.5 * a["w"] / a["s"] - 21.43
        cli = 0.0588 * (100 * a["c"] / a["w"]) - 0.296 * (100 * a["s"] / a["w"]) - 15.8
        lix = a["w"] / a["s"] + 100 * a["lw"] / a["w"]
        assert r["ari"] == pytest.approx(ari, abs=1e-5)
        assert r["coleman_liau"] == pytest.approx(cli, abs=1e-5)
        assert r["lix"] == pytest.approx(lix, abs=1e-5)


def test_flesch_matches_literal(spark, sf_dir, per_source):
    got = {r["source"]: r for r in q_flesch_reading_ease(spark, sf_dir).collect()}
    for src, a in per_source.items():
        r = got[src]
        # corpus-wide vowel-group count must equal the per-word sum
        # (word boundaries break groups) -- the no-explode shortcut
        assert r["n_syllables"] == a["sy"]
        ease = 206.835 - 1.015 * a["w"] / a["s"] - 84.6 * a["sy"] / a["w"]
        grade = 0.39 * a["w"] / a["s"] + 11.8 * a["sy"] / a["w"] - 15.59
        assert r["flesch_ease"] == pytest.approx(ease, abs=1e-5)
        assert r["fk_grade"] == pytest.approx(grade, abs=1e-5)


def test_smog_matches_literal(spark, sf_dir, per_source):
    got = {r["source"]: r for r in q_smog_polysyllable(spark, sf_dir).collect()}
    for src, a in per_source.items():
        r = got[src]
        assert r["n_poly"] == a["poly"]
        assert r["n_words"] == a["w"]
        smog = 1.0430 * math.sqrt(a["poly"] * 30.0 / a["s"]) + 3.1291
        assert r["smog_grade"] == pytest.approx(smog, abs=1e-5)


def test_formula_sanity_on_known_text():
    # "the cat sat on the mat. the dog ran." -- hand-computed counts:
    # 9 words, 26 letters, 2 sentences, 9 vowel groups, 0 polysyllabic
    text = "the cat sat on the mat. the dog ran."
    words = re.findall(r"[a-z]+", text)
    assert len(words) == 9
    assert sum(len(w) for w in words) == 26
    assert len(re.findall(r"[.!?]+", text)) == 2
    assert len(re.findall(r"[aeiouy]+", text)) == 9
    assert sum(1 for w in words if len(re.findall(r"[aeiouy]+", w)) >= 3) == 0
    ari = 4.71 * 26 / 9 + 0.5 * 9 / 2 - 21.43
    assert ari == pytest.approx(-5.5733, abs=0.01)
