"""ext203: Misra-Gries re-derivations -- the frequent-items guarantee
(any key with true count > n/(k+1) survives), the exact decrement
identity n = sum(counters) + d*(k+1), the undercount bound
counter <= true <= counter + d, and the SPLIT-COMPOSITION law the
streaming replay rests on: folding a suffix seeded with the prefix's
state equals the one-pass fold, for every split point."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext203 import (
    _K,
    misra_gries_fold,
    q_mg_heavy_hitters_daily,
)


def _truth(seq):
    t = {}
    for u in seq:
        t[u] = t.get(u, 0) + 1
    return t


def test_guarantee_and_undercount_bound():
    rng = np.random.default_rng(203)
    for _ in range(30):
        n = int(rng.integers(50, 400))
        # skewed stream: a heavy key plus noise
        heavy = [7] * (n // 3)
        noise = rng.integers(100, 160, n - len(heavy)).tolist()
        seq = heavy + noise
        rng.shuffle(seq)
        st = misra_gries_fold(seq)
        truth = _truth(seq)
        d = (len(seq) - sum(st.values())) // (_K + 1)
        # decrement identity is exact
        assert sum(st.values()) + d * (_K + 1) == len(seq)
        # any key above n/(k+1) must survive
        for u, c in truth.items():
            if c > len(seq) / (_K + 1):
                assert u in st
        # undercount bound
        for u, c in st.items():
            assert c <= truth[u] <= c + d


def test_all_distinct_degenerate():
    st = misra_gries_fold(range(1000))
    # k distinct fill, then every arrival decrements: survivors few
    assert len(st) <= _K
    assert sum(st.values()) <= _K


def test_split_composition_law():
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 40, 500).tolist()
    whole = misra_gries_fold(seq)
    for cut in (1, 7, 100, 250, 499):
        prefix = misra_gries_fold(seq[:cut])
        resumed = misra_gries_fold(seq[cut:], state=prefix)
        assert resumed == whole, cut


def test_query_matches_plain_fold(spark, sf_dir):
    import duckdb

    pdf = q_mg_heavy_hitters_daily(spark, sf_dir).toPandas()
    con = duckdb.connect()
    raw = con.sql(
        f"""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase' ORDER BY ts, event_id"""
    ).df()
    for day, grp in raw.groupby("day"):
        st = misra_gries_fold(grp["user_id"].to_list())
        got = pdf[pdf["day"] == day].sort_values("rank")
        assert dict(zip(got["user_id"], got["counter"])) == st
        assert (got["n_events"] == len(grp)).all()
        d = (len(grp) - sum(st.values())) // (_K + 1)
        assert (got["max_undercount"] == d).all()
