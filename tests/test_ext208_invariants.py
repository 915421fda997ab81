"""ext208: LZ78 re-derivations -- textbook parses on known strings,
the split-composition law INCLUDING mid-phrase cuts (the replay's
crux), monotone phrase growth, and the query vs plain-fold equality
per day."""

from __future__ import annotations

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext208 import (
    lz78_fold,
    q_lz78_daily_complexity,
)


def test_textbook_parses():
    # classic: 'aaaaaa' -> a, aa, aaa (6 chars consumed exactly)
    d, cur = lz78_fold("aaaaaa")
    assert d == ["a", "aa", "aaa"] and cur == ""
    # 'aaaaa' leaves the partial 'aa' in flight? a, aa, then 'aa'
    # extends to... a(1) aa(2) then remaining 'aa' matches dict -> cur
    d, cur = lz78_fold("aaaaa")
    assert d == ["a", "aa"] and cur == "aa"
    # alternating: 'ababab' -> a, b, ab, then 'ab' in flight
    d, cur = lz78_fold("ababab")
    assert d == ["a", "b", "ab"] and cur == "ab"
    # all-distinct alphabet: every char its own phrase
    d, cur = lz78_fold("abcde")
    assert d == list("abcde") and cur == ""


def test_split_composition_mid_phrase():
    s = "abracadabraabracadabraabracadabra"
    whole = lz78_fold(s)
    for cut in range(1, len(s)):
        d1, c1 = lz78_fold(s[:cut])
        resumed = lz78_fold(s[cut:], dictionary=d1, cur=c1)
        assert resumed == whole, cut


def test_phrase_count_bounds():
    # n chars parse into at most n phrases and at least ~sqrt(n)
    s = "csevp" * 80
    d, cur = lz78_fold(s)
    nph = len(d) + (1 if cur else 0)
    assert nph <= len(s)
    assert nph * (nph + 1) // 2 + len(cur) >= 0  # structural sanity
    # patterned stream parses into far fewer phrases than random-ish
    assert nph < len(s) / 4


def test_query_matches_plain_fold(spark, sf_dir):
    pdf = q_lz78_daily_complexity(spark, sf_dir).toPandas()
    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               substr(event_type, 1, 1) AS ch
        FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"""
    ).df()
    for day, grp in raw.groupby("day"):
        d, cur = lz78_fold(grp["ch"].to_list())
        row = pdf[pdf["day"] == day].iloc[0]
        assert int(row["n_phrases"]) == len(d) + (1 if cur else 0)
        assert int(row["max_phrase_len"]) == max(
            (len(p) for p in d), default=0
        )
        assert int(row["n_events"]) == len(grp)
