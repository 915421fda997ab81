"""Definition-level checks for the ext28 batch: literal python
re-derivations independent of the DuckDB oracle SQL.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext28 import (
    q_nearest_spend_match,
    q_ppr_seeded,
    q_quality_yield_curve,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(price: pd.Series) -> pd.Series:
    return np.round(price * 100).astype("int64")


def test_nearest_match_is_truly_nearest(spark, sf_dir):
    got = q_nearest_spend_match(spark, sf_dir).toPandas().set_index("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    osum = o.groupby("o_custkey").c.sum()
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").toPandas()
    cust["spend"] = cust.c_custkey.map(osum).fillna(0).astype("int64")
    treated = cust[cust.c_mktsegment == "BUILDING"]
    controls = cust[cust.c_mktsegment != "BUILDING"].sort_values(["spend", "c_custkey"])
    cs = controls.spend.values
    ck = controls.c_custkey.values
    assert set(got.index) == set(treated.c_custkey)
    for t in treated.itertuples():
        # literal nearest scan with the prev-wins-on-tie rule under
        # (spend, custkey) ordering
        import bisect

        keys = list(zip(cs, ck))
        pos = bisect.bisect_right(keys, (t.spend, t.c_custkey))
        prev = keys[pos - 1] if pos > 0 else None
        nxt = keys[pos] if pos < len(keys) else None
        if prev is None:
            want_key, want_spend = nxt[1], nxt[0]
        elif nxt is None:
            want_key, want_spend = prev[1], prev[0]
        elif t.spend - prev[0] <= nxt[0] - t.spend:
            want_key, want_spend = prev[1], prev[0]
        else:
            want_key, want_spend = nxt[1], nxt[0]
        row = got.loc[t.c_custkey]
        assert int(row.match_custkey) == want_key
        assert int(row.match_spend_cents) == want_spend
        assert int(row.diff_cents) == abs(t.spend - want_spend)
        # no control is strictly closer than the reported match
        assert int(row.diff_cents) == min(abs(int(s) - t.spend) for s in cs)


def test_ppr_seeded_matches_literal_walk(spark, sf_dir):
    got = q_ppr_seeded(spark, sf_dir).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").toPandas()
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").toPandas()
    seed_nk = int(nat[nat.n_name == "NATION_3"].n_nationkey.iloc[0])
    seeds = set(cust[cust.c_nationkey == seed_nk].c_custkey)
    e = set(
        zip(
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey").o_custkey,
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey").l_suppkey,
        )
    )
    cdeg, sdeg = defaultdict(int), defaultdict(int)
    for c, s in e:
        cdeg[c] += 1
        sdeg[s] += 1
    it1 = defaultdict(int)
    for c, s in e:
        if c in seeds:
            it1[s] += (1000000000 * 85) // (100 * cdeg[c])
    it2 = defaultdict(int)
    for c, s in e:
        if s in it1:
            it2[c] += (it1[s] * 85) // (100 * sdeg[s])
    final = {
        c: (1000000000 * 15 // 100 if c in seeds else 0) + m for c, m in it2.items()
    }
    ranked = sorted(final.items(), key=lambda t: (-t[1], t[0]))[:25]
    assert len(got) == len(ranked)
    for row, (c, m) in zip(got.itertuples(), ranked):
        assert (row.custkey, int(row.ppr_mass)) == (c, m)


def test_yield_curve_is_monotone_in_threshold(spark, sf_dir):
    got = q_quality_yield_curve(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source", "text").toPandas()
    # literal recompute for one (source, threshold) cell
    src = sorted(docs.source.unique())[0]
    sub = docs[docs.source == src]
    kept_docs = kept_toks = all_toks = 0
    for t in sub.itertuples():
        toks = t.text.split(" ")
        s = sum(
            (int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64 * 2654435761)
            % 1001
            for tok in toks
        )
        all_toks += len(toks)
        if s >= 500 * len(toks):
            kept_docs += 1
            kept_toks += len(toks)
    row = got[(got.source == src) & (got.threshold_milli == 500)].iloc[0]
    assert (int(row.kept_docs), int(row.kept_tokens)) == (kept_docs, kept_toks)
    assert int(row.token_yield_ppm) == (1000000 * kept_toks) // all_toks
    # acceptance can only shrink as the threshold rises
    for src2, g in got.groupby("source"):
        g = g.sort_values("threshold_milli")
        assert list(g.kept_tokens) == sorted(g.kept_tokens, reverse=True)
        assert list(g.kept_docs) == sorted(g.kept_docs, reverse=True)
