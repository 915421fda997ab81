"""Definition-level invariants for ext253: LEB128 round-trip + the SQL
byte-text generator vs the independent Python encoder, and Kemeny's
Condorcet-consistency / pair-accounting laws."""

from __future__ import annotations

import random
from itertools import permutations

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext253 import (
    _VARINT_LEN,
    varint_decode,
    varint_encode,
    varint_text_sql,
)

_SF = "/root/testdata/sf0.001"
_Q = {q.name: q for q in registry()}


def test_varint_roundtrip_fuzz():
    rng = random.Random(253)
    for _ in range(100):
        vals = [rng.randrange(0, 2**34) for _ in range(rng.randint(0, 50))]
        assert varint_decode(varint_encode(vals)) == vals


def test_sql_bytes_equal_python_encoder():
    """The generated SQL byte text (run in DuckDB) must render exactly
    the bytes the independent Python encoder produces, across all
    group-count boundaries."""
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2097151, 2097152,
            268435455, 268435456, 2**34, 999, 54321, 7777777]
    con = duckdb.connect()
    expr = varint_text_sql("v", "//")
    ln = _VARINT_LEN.format(v="v")
    for v in vals:
        txt, n = con.execute(
            f"SELECT {expr}, {ln} FROM (SELECT CAST({v} AS BIGINT) AS v)"
        ).fetchone()
        ref = varint_encode([v])
        assert txt == "".join(f"{b:03d}" for b in ref), v
        assert int(n) == len(ref), v
    con.close()


def test_codec_output_laws():
    """varint_bytes <= fixed_bytes (deltas are small); ratio consistent;
    every day's stream hashes to a 16-char prefix."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{_SF}/events.parquet'")
    df = con.execute(resolve_sql(_Q["varint_delta_codec"], _SF)).df()
    con.close()
    assert (df["varint_bytes"] <= df["fixed_bytes"]).all()
    assert (
        df["ratio_ppm"]
        == (1_000_000 * df["varint_bytes"]) // df["fixed_bytes"]
    ).all()
    assert df["stream_md5_prefix"].str.len().eq(16).all()


def _kemeny_brute(rankings):
    """Independent Kemeny: minimize summed Kendall-tau distance to the
    given rankings (each a tuple of items, best first)."""
    items = sorted(rankings[0])
    best = None
    for perm in permutations(items):
        pos = {c: i for i, c in enumerate(perm)}
        dist = 0
        for r in rankings:
            rp = {c: i for i, c in enumerate(r)}
            for i, a in enumerate(items):
                for b in items[i + 1:]:
                    if (pos[a] < pos[b]) != (rp[a] < rp[b]):
                        dist += 1
        key = (dist, perm)
        if best is None or key < best:
            best = key
    return best


def _fold_kemeny(rankings):
    """The query's formulation: pairwise matrix -> max agreements."""
    items = sorted(rankings[0])
    w = {(a, b): 0 for a in items for b in items if a != b}
    for r in rankings:
        rp = {c: i for i, c in enumerate(r)}
        for a, b in w:
            if rp[a] < rp[b]:
                w[(a, b)] += 1
    best = None
    for perm in permutations(items):
        pos = {c: i for i, c in enumerate(perm)}
        agree = sum(n for (a, b), n in w.items() if pos[a] < pos[b])
        key = (-agree, perm)
        if best is None or key < best:
            best = key
    return best[1]


def test_kemeny_equals_brute_kendall_fuzz():
    """Max-agreement over the pairwise matrix == min summed Kendall
    distance (they are complementary over a fixed pair total)."""
    rng = random.Random(99)
    items = list("abcd")
    for _ in range(40):
        rankings = [
            tuple(rng.sample(items, 4)) for _ in range(rng.randint(1, 9))
        ]
        assert _fold_kemeny(rankings) == _kemeny_brute(rankings)[1]


def test_kemeny_condorcet_consistency():
    """A candidate preferred to every other in a majority of rankings
    heads the Kemeny order (planted profile)."""
    rankings = [
        ("x", "a", "b", "c"),
        ("x", "b", "c", "a"),
        ("x", "c", "a", "b"),
        ("a", "b", "c", "x"),
    ]
    assert _fold_kemeny(rankings)[0] == "x"


def test_kemeny_pair_accounting():
    """agreements + disagreements == 10 * n_days (each unordered pair
    contributes exactly one above-ness per day) on the real output."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{_SF}/events.parquet'")
    df = con.execute(resolve_sql(_Q["kemeny_ranking"], _SF)).df()
    con.close()
    row = df.iloc[0]
    assert (
        int(row["agreements"]) + int(row["disagreements"])
        == 10 * int(row["n_days"])
    )
