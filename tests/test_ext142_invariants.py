"""ext142: literal re-derivations -- the card-testing window logic as
a plain per-user double loop, the LSH S-curve against the closed
formula (plus its monotonicity laws), and the coverage curve from a
Counter."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext142 import (
    _BIG_CENTS,
    _CHARGE_WIN_US,
    _PROBE_WIN_US,
    _SMALL_CENTS,
    q_card_testing_burst,
    q_lsh_s_curve_tuning,
    q_ngram_coverage_curve,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)


def test_card_testing_matches_literal(spark, sf_dir):
    got = [
        (r["card_id"], r["n_flag_events"], r["first_flag_epoch_s"])
        for r in q_card_testing_burst(spark, sf_dir).collect()
    ]
    ev = (
        convert_event_ts(read_table(spark, sf_dir, "events"))
        .where("event_type = 'purchase'")
        .select("user_id", "ts", "value")
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        us = int(r["ts"].timestamp() * 1e6)
        per[r["user_id"]].append((us, round(r["value"] * 100)))
    hits = defaultdict(list)
    for u, lst in per.items():
        lst.sort()
        for i, (us, cents) in enumerate(lst):
            if cents >= _SMALL_CENTS:
                continue
            n_small = sum(
                1
                for us2, c2 in lst
                if us - _PROBE_WIN_US <= us2 <= us and c2 < _SMALL_CENTS
            )
            big = any(
                us <= us2 <= us + _CHARGE_WIN_US and c2 >= _BIG_CENTS
                for us2, c2 in lst
            )
            if n_small >= 3 and big:
                hits[u].append(us)
    expected = sorted(
        ((u, len(v), min(v) // 1_000_000) for u, v in hits.items()),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    assert got == expected


def test_lsh_s_curve_matches_formula_and_laws(spark, sf_dir):
    rows = q_lsh_s_curve_tuning(spark, sf_dir).collect()
    assert len(rows) == 25
    by_rs = {}
    for r in rows:
        b, rr, s = r["n_bands"], r["rows_per_band"], r["jaccard_s"]
        assert b * rr == 16
        p = 1 - (1 - s**rr) ** b
        assert r["p_candidate"] == pytest.approx(p, abs=1e-6)
        assert r["s50_threshold"] == pytest.approx(
            (1 / b) ** (1 / rr), abs=1e-6
        )
        by_rs[(rr, s)] = r["p_candidate"]
    # law: p is increasing in s for fixed (b, r)
    for rr in (1, 2, 4, 8, 16):
        ps = [by_rs[(rr, s)] for s in (0.3, 0.5, 0.7, 0.8, 0.9)]
        assert ps == sorted(ps)
    # law: more rows per band -> stricter (lower p at fixed s < 1)
    ps_at_05 = [by_rs[(rr, 0.5)] for rr in (1, 2, 4, 8, 16)]
    assert ps_at_05 == sorted(ps_at_05, reverse=True)


def test_coverage_curve_matches_counter(spark, sf_dir):
    got = {r["top_k"]: r for r in q_ngram_coverage_curve(spark, sf_dir).collect()}
    import re

    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(re.findall(r"[a-z]+", r["text"]))
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for k in (10, 50, 100, 500, 1000):
        kk = min(k, len(ordered))
        cum = sum(c for _, c in ordered[:kk])
        row = got[k]
        assert row["vocab_size"] == len(ordered)
        assert row["n_tokens"] == total
        assert row["coverage_ppm"] == 1_000_000 * cum // total
    # coverage is nondecreasing in k and <= 1e6
    vals = [got[k]["coverage_ppm"] for k in (10, 50, 100, 500, 1000)]
    assert vals == sorted(vals) and vals[-1] <= 1_000_000
