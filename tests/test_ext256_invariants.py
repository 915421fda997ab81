"""Definition-level invariants for ext256: the shared-SQL soundex
pipeline equals an independent per-letter reference implementation on
canonical fixtures and fuzzed words, in BOTH engines."""

from __future__ import annotations

import random
import string

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext256 import (
    soundex_ref,
    soundex_sql,
)

_CANON = [
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),
    ("Pfister", "P236"),
    ("Honeyman", "H555"),
    ("Jackson", "J250"),
    ("Schmidt", "S530"),
    ("Washington", "W252"),
    ("Lee", "L000"),
    ("Gutierrez", "G362"),
]


def test_reference_matches_canonical_fixtures():
    for w, code in _CANON:
        assert soundex_ref(w) == code, w


def _sql_codes(words):
    con = duckdb.connect()
    expr = soundex_sql("w", duck=True)
    out = {}
    for w in words:
        out[w] = con.execute(
            f"SELECT {expr} FROM (SELECT '{w}' AS w)"
        ).fetchone()[0]
    con.close()
    return out


def test_sql_pipeline_equals_reference_fuzz():
    """The translate/collapse/strip SQL pipeline must agree with the
    per-letter walk on canonical names and on random letter strings
    (covers H/W transparency, vowel separation, first-letter dup, and
    short-word padding)."""
    rng = random.Random(256)
    words = [w for w, _ in _CANON]
    words += [
        "".join(rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    ]
    got = _sql_codes(words)
    for w in words:
        assert got[w] == soundex_ref(w), (w, got[w], soundex_ref(w))


def test_blocking_pair_accounting():
    """candidate_pairs per block == b(b-1)/2 and totals are consistent
    on the real sf0.001 table."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql

    q = {x.name: x for x in registry()}["soundex_blocking"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM"
        " '/root/testdata/sf0.001/part.parquet'"
    )
    df = con.execute(resolve_sql(q, "/root/testdata/sf0.001")).df()
    con.close()
    assert (
        df["candidate_pairs"]
        == df["n_words"] * (df["n_words"] - 1) // 2
    ).all()
    assert df["vocab_size"].nunique() == 1
    assert int(df["n_words"].sum()) <= int(df["vocab_size"].iloc[0])
