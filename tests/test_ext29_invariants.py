"""Definition-level checks for the ext29 batch: literal python
re-derivations independent of the DuckDB oracle SQL.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext29 import (
    q_item_bias_model,
    q_l_diversity_audit,
    q_rake_keyphrases,
    q_sign_test_weekly,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_STOPWORDS = {"the", "a", "of", "and", "to", "in"}


def test_l_diversity_matches_literal_entropy(spark, sf_dir):
    got = q_l_diversity_audit(spark, sf_dir).toPandas().set_index(["nk", "bal_bucket"])
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).toPandas()
    cust["bb"] = np.floor(cust.c_acctbal / 1000).astype("int64")
    for (nk, bb), g in cust.groupby(["c_nationkey", "bb"]):
        counts = Counter(g.c_mktsegment)
        n = len(g)
        ent_e9 = sum(round(-1e9 * (c / n) * math.log(c / n)) for c in counts.values())
        row = got.loc[(nk, bb)]
        assert int(row.class_size) == n
        assert int(row.l_distinct) == len(counts)
        assert abs(int(row.entropy_e9) - ent_e9) <= len(counts)
        # distinct-l of 1 must give zero entropy
        if len(counts) == 1:
            assert int(row.entropy_e9) == 0


def test_item_bias_model_beats_baseline_and_matches_literal(spark, sf_dir):
    got = q_item_bias_model(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").toPandas()
    r = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    q = r.l_quantity.astype("int64").values
    users, items = r.o_custkey.values, r.l_partkey.values
    n = len(q)
    mu = (1000000 * int(q.sum())) // n
    bi: dict = defaultdict(lambda: [0, 0])
    for qi, it in zip(q, items):
        bi[it][0] += 1000000 * int(qi) - mu
        bi[it][1] += 1
    bi = {k: v[0] // v[1] for k, v in bi.items()}
    bu: dict = defaultdict(lambda: [0, 0])
    for qi, it, u in zip(q, items, users):
        bu[u][0] += 1000000 * int(qi) - mu - bi[it]
        bu[u][1] += 1
    bu = {k: v[0] // v[1] for k, v in bu.items()}
    mae_base = sum(abs(1000000 * int(qi) - mu) for qi in q) // n
    mae_model = (
        sum(abs(1000000 * int(qi) - (mu + bi[it] + bu[u])) for qi, it, u in zip(q, items, users))
        // n
    )
    assert int(got.n_interactions) == n
    assert int(got.mu_e6) == mu
    assert int(got.mae_baseline_e6) == mae_base
    assert int(got.mae_model_e6) == mae_model
    assert mae_model <= mae_base  # biases must not hurt on train data


def test_rake_matches_literal_extraction(spark, sf_dir):
    got = q_rake_keyphrases(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    phrases = []  # (phrase string, member tokens)
    for t in docs.itertuples():
        cur: list[str] = []
        for tok in t.text.split(" ") + ["the"]:
            if tok in _STOPWORDS:
                if 2 <= len(cur) <= 4:
                    phrases.append(list(cur))
                cur = []
            else:
                cur.append(tok)
    deg: Counter = Counter()
    freq: Counter = Counter()
    for ph in phrases:
        for w in ph:
            deg[w] += len(ph)
            freq[w] += 1
    ws = {w: (1000000 * deg[w]) // freq[w] for w in deg}
    scored: dict[str, list] = {}
    for ph in phrases:
        s = sum(ws[w] for w in ph)
        key = " ".join(ph)
        scored.setdefault(key, [0, s])[0] += 1
    ranked = sorted(((v[1], k, v[0]) for k, v in scored.items()), key=lambda t: (-t[0], t[1]))[:20]
    assert len(got) == len(ranked)
    for row, (s, ph, occ) in zip(got.itertuples(), ranked):
        assert (row.phrase, int(row.n_occurrences), int(row.score)) == (ph, occ, s)


def test_sign_test_matches_literal_pairs(spark, sf_dir):
    got = q_sign_test_weekly(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").toPandas()
    o["c"] = np.round(o.o_totalprice * 100).astype("int64")
    days = o.groupby("o_orderdate").c.sum().sort_index().values
    kp = km = 0
    for a, b in zip(days, days[7:]):
        if b > a:
            kp += 1
        elif b < a:
            km += 1
    assert (int(got.k_plus), int(got.k_minus)) == (kp, km)
    n = kp + km
    z = (kp - n / 2) / math.sqrt(n / 4)
    assert math.isclose(float(got.z_score), z, abs_tol=1e-5)
