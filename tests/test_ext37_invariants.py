"""Definition-level checks for the ext37 batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext37 import (
    _DISC_E9,
    q_f1_scores_langid,
    q_markov_3step_probs,
    q_ndcg_at_k,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_ndcg_matches_literal_ranking_eval(spark, sf_dir):
    got = q_ndcg_at_k(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).toPandas()
    r = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    r["q"] = r.l_quantity.astype("int64")
    split = pd.Timestamp("1998-07-01")
    train = r[r.o_orderdate < split]
    ev = r[r.o_orderdate >= split]
    pop = train.groupby("l_partkey").q.sum()
    ranked = sorted(pop.items(), key=lambda t: (-t[1], t[0]))[:10]
    rank_items = [i for i, _ in ranked]
    rel = ev.groupby(["o_custkey", "l_partkey"]).q.sum()
    ndcgs = []
    for u, g in rel.groupby(level=0):
        rels = {i: int(v) for (_, i), v in g.items()}
        dcg = sum(
            rels.get(item, 0) * _DISC_E9[pos] for pos, item in enumerate(rank_items)
        )
        ideal = sorted(rels.items(), key=lambda t: (-t[1], t[0]))[:10]
        idcg = sum(v * _DISC_E9[pos] for pos, (_, v) in enumerate(ideal))
        if idcg > 0:
            ndcgs.append((1000000 * dcg) // idcg)
    assert int(got.n_users) == len(ndcgs)
    assert int(got.mean_ndcg_ppm) == sum(ndcgs) // len(ndcgs)
    assert int(got.max_ndcg_ppm) == max(ndcgs)
    assert 0 <= int(got.mean_ndcg_ppm) <= 1000000


def test_f1_matches_confusion_identity(spark, sf_dir):
    got = q_f1_scores_langid(spark, sf_dir).toPandas().set_index("lang")
    docs = read_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    preds = []
    for r in docs.itertuples():
        toks = r.text.split(" ")
        h_en = sum(t in ("the", "a", "fast") for t in toks)
        h_es = sum(t in ("data", "row") for t in toks)
        h_zh = sum(t in ("table", "join") for t in toks)
        p = "en" if h_en >= h_es and h_en >= h_zh else ("es" if h_es >= h_zh else "zh")
        preds.append((r.lang, p))
    for c in got.index:
        tp = sum(1 for lg, p in preds if lg == c and p == c)
        fp = sum(1 for lg, p in preds if lg != c and p == c)
        fn = sum(1 for lg, p in preds if lg == c and p != c)
        row = got.loc[c]
        assert (int(row.tp), int(row.fp), int(row.fn)) == (tp, fp, fn)
        if tp + fp:
            assert int(row.precision_ppm) == (1000000 * tp) // (tp + fp)
        else:
            assert pd.isna(row.precision_ppm)
        if 2 * tp + fp + fn:
            assert int(row.f1_ppm) == (2000000 * tp) // (2 * tp + fp + fn)


def test_markov_3step_matches_literal_matrix_power(spark, sf_dir):
    got = q_markov_3step_probs(spark, sf_dir).toPandas()
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).toPandas()
    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"]).event_type.tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    rows: Counter = Counter()
    for (a, _), c in trans.items():
        rows[a] += c
    p1 = {(a, b): (1000000000 * c) // rows[a] for (a, b), c in trans.items()}

    def matmul(x, y):
        out: dict = defaultdict(int)
        for (a, m), px in x.items():
            for (m2, b), py in y.items():
                if m == m2:
                    out[(a, b)] += (px * py) // 1000000000
        return dict(out)

    p3 = matmul(matmul(p1, p1), p1)
    have = {(r.from_state, r.to_state): int(r.p3_e9) for r in got.itertuples()}
    assert have == p3
    # each row of P^3 sums to ~1 (floor-division slack only)
    per_row: Counter = Counter()
    for (a, _), p in p3.items():
        per_row[a] += p
    for a, s in per_row.items():
        assert 1000000000 - 50 <= s <= 1000000000
