"""ext172: literal re-derivations -- mu-law vs the audioop reference
(exhaustive over all int16 values; gated on the module still shipping
audioop) plus the companding idempotence and monotonicity laws; P6
roundtrip properties including comment/whitespace grammar; Schulze
vs a Floyd-Warshall widest-path loop plus the Condorcet-consistency
law (a candidate beating everyone pairwise is the Schulze winner)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.multimodal import (
    decode_pnm,
    decode_ulaw,
    encode_pnm,
    encode_ulaw,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext172 import (
    q_multimodal_pnm_stats,
    q_multimodal_ulaw_stats,
    q_schulze_method_nations,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def test_ulaw_matches_audioop_exhaustively():
    audioop = pytest.importorskip("audioop")
    s = np.arange(-32768, 32768, dtype=np.int16)
    enc = encode_ulaw(s)
    ref = audioop.lin2ulaw(s.astype("<i2").tobytes(), 2)
    assert enc == ref
    dec = decode_ulaw(enc)
    refdec = np.frombuffer(audioop.ulaw2lin(ref, 2), dtype="<i2")
    assert (dec == refdec).all()


def test_ulaw_laws():
    s = np.arange(-32768, 32768, 97, dtype=np.int16)
    codes = encode_ulaw(s)
    shat = decode_ulaw(codes)
    # companding idempotence: re-encoding the decoded signal is stable
    assert encode_ulaw(shat) == codes
    # decode is monotone in the signal: sorting order preserved
    order = np.argsort(s, kind="stable")
    assert (np.diff(shat[order]) >= 0).all()
    # small signals quantize finer than large ones (companding!)
    small_err = np.abs(decode_ulaw(encode_ulaw(
        np.arange(-100, 100, dtype=np.int16))).astype(int)
        - np.arange(-100, 100)).max()
    large = np.arange(20000, 20200, dtype=np.int16)
    large_err = np.abs(
        decode_ulaw(encode_ulaw(large)).astype(int) - large.astype(int)
    ).max()
    assert small_err < 10 < large_err


def test_ulaw_query_matches_loop(spark, sf_dir):
    rows = q_multimodal_ulaw_stats(spark, sf_dir).collect()
    assert len(rows) == 500
    for row in rows[:20]:
        assert row["n_samples"] == 30
        assert row["n_code_bytes"] == 30
        assert row["idempotent_requantize"] is True
        assert row["max_abs_error"] >= 0
        assert row["snr_db"] > 20  # mu-law SNR on full-scale-ish noise


def test_pnm_grammar_and_roundtrip():
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_pnm(img)
    assert len(data) == 71
    assert decode_pnm(data).tobytes() == img.tobytes()
    # comments and extra whitespace in the header
    wild = b"P6  # wide\n#another comment\n  5\n4\t255\n" + img.tobytes()
    assert decode_pnm(wild).tobytes() == img.tobytes()
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n5 4\n255\n" + img.tobytes())
    with pytest.raises(ValueError):
        decode_pnm(data[:-1])


def test_pnm_query_stats(spark, sf_dir):
    rows = q_multimodal_pnm_stats(spark, sf_dir).collect()
    assert len(rows) == 500
    for row in rows[:20]:
        assert row["n_bytes"] == 71
        assert row["roundtrip_exact"] is True
        assert 0 <= row["mean_r"] <= 255
        assert row["gray_range"] >= 0


def _widest_path(d, nodes):
    p = {
        (a, b): (d[(a, b)] if d[(a, b)] > d[(b, a)] else 0)
        for a in nodes
        for b in nodes
        if a != b
    }
    for c in nodes:
        for a in nodes:
            if a == c:
                continue
            for b in nodes:
                if b in (a, c):
                    continue
                p[(a, b)] = max(
                    p[(a, b)], min(p[(a, c)], p[(c, b)])
                )
    return p


def test_schulze_matches_floyd_warshall(spark, sf_dir):
    got = q_schulze_method_nations(spark, sf_dir).collect()
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rows = orders.join(cust, orders.o_custkey == cust.c_custkey).collect()
    rev = defaultdict(int)
    months = set()
    nations = set()
    for r in rows:
        m = str(r["o_orderdate"])[:7]
        months.add(m)
        nations.add(r["c_nationkey"])
        rev[(r["c_nationkey"], m)] += round(r["o_totalprice"] * 100)
    # nations present in customer but with no orders still vote 0
    all_nations = {
        r["c_nationkey"]
        for r in cust.select("c_nationkey").distinct().collect()
    }
    nodes = sorted(all_nations)
    d = defaultdict(int)
    for m in months:
        vals = {nk: rev.get((nk, m), 0) for nk in nodes}
        for a in nodes:
            for b in nodes:
                if a != b and vals[a] > vals[b]:
                    d[(a, b)] += 1
    for a in nodes:
        for b in nodes:
            if a != b:
                d[(a, b)] += 0
    p = _widest_path(d, nodes)
    wins = {
        a: sum(1 for b in nodes if b != a and p[(a, b)] >= p[(b, a)])
        for a in nodes
    }
    ranked = sorted(nodes, key=lambda a: (-wins[a], a))[:5]
    assert [r["nationkey"] for r in got] == ranked
    for r in got:
        assert r["path_wins"] == wins[r["nationkey"]]
        assert r["n_rivals"] == len(nodes) - 1
        assert r["is_schulze_winner"] == (
            wins[r["nationkey"]] == len(nodes) - 1
        )


def test_schulze_condorcet_consistency_law():
    # candidate 0 beats everyone head-to-head -> Schulze winner
    nodes = [0, 1, 2, 3]
    d = defaultdict(int)
    d.update({(0, 1): 7, (1, 0): 3, (0, 2): 6, (2, 0): 4,
              (0, 3): 8, (3, 0): 2,
              (1, 2): 9, (2, 1): 1, (2, 3): 9, (3, 2): 1,
              (3, 1): 9, (1, 3): 1})
    p = _widest_path(d, nodes)
    wins0 = sum(1 for b in nodes if b != 0 and p[(0, b)] >= p[(b, 0)])
    assert wins0 == 3
