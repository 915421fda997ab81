"""Definition-level checks for the ext25 batch, each re-derived in
plain python/pandas/numpy independently of the DuckDB oracle SQL.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext25 import (
    q_bootstrap_ci_revenue,
    q_dormancy_reactivation,
    q_permutation_entropy,
    q_psi_price_drift,
    q_tokenizer_fertility,
    q_woe_information_value,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _cents(price: pd.Series) -> pd.Series:
    return np.round(price * 100).astype("int64")


def test_woe_matches_literal_formula(spark, sf_dir):
    got = q_woe_information_value(spark, sf_dir).toPandas().set_index("o_orderpriority")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").toPandas()
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag").toPandas()
    bad_orders = set(li[li.l_returnflag == "R"].l_orderkey)
    o["bad"] = o.o_orderkey.isin(bad_orders).astype(int)
    per = o.groupby("o_orderpriority").bad.agg(["size", "sum"])
    G = int((per["size"] - per["sum"]).sum())
    B = int(per["sum"].sum())
    for prio, r in per.iterrows():
        good, bad = int(r["size"] - r["sum"]), int(r["sum"])
        row = got.loc[prio]
        assert (int(row.n_good), int(row.n_bad)) == (good, bad)
        if good and bad:
            woe = math.log((good / G) / (bad / B))
            assert math.isclose(float(row.woe), woe, abs_tol=1e-5)
            iv = 1e9 * (good / G - bad / B) * woe
            assert abs(int(row.iv_term_e9) - iv) < 2


def test_psi_terms_sum_to_literal_psi(spark, sf_dir):
    got = q_psi_price_drift(spark, sf_dir).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["bin"] = np.minimum(_cents(o.o_totalprice) // 2000000, 25)
    o["period"] = (o.o_orderdate >= pd.Timestamp("1998-07-01")).astype(int)
    per = o.groupby("bin").period.agg(
        n_base=lambda s: int((s == 0).sum()), n_curr=lambda s: int((s == 1).sum())
    )
    nb = len(per)
    tb, tc = int(per.n_base.sum()), int(per.n_curr.sum())
    psi = 0.0
    for _, r in per.iterrows():
        p = (r.n_base + 1) / (tb + nb)
        q = (r.n_curr + 1) / (tc + nb)
        psi += (p - q) * math.log(p / q)
    assert len(got) == nb
    assert math.isclose(got.psi_term_e9.sum() / 1e9, psi, abs_tol=1e-6)


def test_bootstrap_ci_matches_literal_resampling(spark, sf_dir):
    got = q_bootstrap_ci_revenue(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    days = o.groupby("o_orderdate").c.sum().sort_index()
    vals = days.values
    n = len(vals)
    means = []
    for r in range(200):
        idx = [((r * 104729 + i * 999983 + 12289) % 2147483647) % n for i in range(n)]
        means.append((r, int(vals[idx].sum()) // n))
    ordered = sorted(means, key=lambda t: (t[1], t[0]))
    assert int(got.n_days) == n
    assert int(got.point_mean_cents) == int(vals.sum()) // n
    assert int(got.lo_cents) == ordered[4][1]
    assert int(got.hi_cents) == ordered[194][1]
    assert int(got.lo_cents) <= int(got.point_mean_cents) <= int(got.hi_cents)


def test_dormancy_reactivation_matches_literal_scan(spark, sf_dir):
    got = q_dormancy_reactivation(spark, sf_dir).toPandas().set_index("user_id")
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts").toPandas()
    ev["t"] = ev.ts.astype("int64") // 1000  # ns -> us
    expect = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"])
        ts = g.t.tolist()
        best = None
        for a, b in zip(ts, ts[1:]):
            if b - a >= 24 * 3600 * 1000000:
                best = (b - a, b)  # latest qualifying gap wins
        if best is None:
            continue
        gap, react = best
        n_burst = sum(1 for x in ts if react < x <= react + 12 * 3600 * 1000000)
        expect[uid] = (gap, react, n_burst, int(n_burst >= 3))
    assert set(got.index) == set(expect)
    for uid, (gap, react, nb, flag) in expect.items():
        row = got.loc[uid]
        assert (int(row.gap_us), int(row.react_us), int(row.n_burst), int(row.is_burst)) == (
            gap,
            react,
            nb,
            flag,
        )


def test_permutation_entropy_matches_literal_patterns(spark, sf_dir):
    got = q_permutation_entropy(spark, sf_dir).toPandas().set_index("pattern_id")
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = _cents(o.o_totalprice)
    vals = o.groupby("o_orderdate").c.sum().sort_index().values
    pats = {}
    for a, b, e in zip(vals, vals[1:], vals[2:]):
        pid = 4 * int(a >= b) + 2 * int(b >= e) + int(a >= e)
        pats[pid] = pats.get(pid, 0) + 1
    tot = sum(pats.values())
    assert set(got.index) == set(pats)
    ent = 0.0
    for pid, n in pats.items():
        row = got.loc[pid]
        assert int(row.n) == n
        assert int(row.share_ppm) == (1000000 * n) // tot
        p = n / tot
        ent += -p * math.log(p)
        assert abs(int(row.entropy_term_e9) - (-1e9 * p * math.log(p))) < 2
    # entropy of 8 possible tie-merged patterns is bounded by ln(8)
    assert 0.0 <= ent <= math.log(8) + 1e-9


def test_tokenizer_fertility_matches_literal_counts(spark, sf_dir):
    got = q_tokenizer_fertility(spark, sf_dir).toPandas().set_index("lang")
    docs = read_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    for lang, g in docs.groupby("lang"):
        n_tok = int(sum(len(t.split(" ")) for t in g.text))
        n_chr = int(g.text.str.len().sum())
        row = got.loc[lang]
        assert int(row.n_docs) == len(g)
        assert int(row.n_tokens) == n_tok
        assert int(row.n_chars) == n_chr
        assert int(row.chars_per_token_e6) == (1000000 * n_chr) // n_tok
        assert int(row.tokens_per_doc_e3) == (1000 * n_tok) // len(g)
