"""Definition-level checks for the ext36 batch."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext36 import (
    q_business_days_lead_time,
    q_clustering_coefficient,
    q_stylometry_burrows_delta,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_clustering_coefficient_matches_networkless_recount(spark, sf_dir):
    got = q_clustering_coefficient(spark, sf_dir).toPandas().set_index("doc_id")
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2).toPandas()
    edges = {
        tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b) if a != b
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for n, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            assert n not in got.index
            continue
        tri = sum(1 for u in nbrs for v in nbrs if u < v and v in adj[u])
        row = got.loc[n]
        assert int(row.degree) == d
        assert int(row.n_triangles) == tri
        assert int(row.lcc_ppm) == (2000000 * tri) // (d * (d - 1))
        assert 0 <= int(row.lcc_ppm) <= 1000000


def test_burrows_delta_is_metric_like_and_matches_literal(spark, sf_dir):
    got = q_stylometry_burrows_delta(spark, sf_dir).toPandas()
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    tok_rows = []
    for r in docs.itertuples():
        tok_rows.extend((r.source, t) for t in r.text.split(" "))
    cnt = Counter(t for _, t in tok_rows)
    top = sorted(cnt, key=lambda t: (-cnt[t], t))[:20]
    stot = Counter(s for s, _ in tok_rows)
    f_e9 = defaultdict(dict)
    per = Counter(tok_rows)
    for (s, t), c in per.items():
        if t in top:
            f_e9[t][s] = (1000000000 * c) // stot[s]
    deltas: dict = defaultdict(lambda: [0, 0])
    for t, by_src in f_e9.items():
        vals = list(by_src.values())
        ns = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        if s2 * ns <= s1 * s1:
            continue
        mean = s1 / ns
        sd = math.sqrt(s2 / ns - mean * mean)
        zs = {s: (v - mean) / sd for s, v in by_src.items()}
        for sa in zs:
            for sb in zs:
                if sa < sb:
                    d = deltas[(sa, sb)]
                    d[0] += 1
                    d[1] += round(1e6 * abs(zs[sa] - zs[sb]))
    have = {
        (r.src_a, r.src_b): (int(r.n_tokens), int(r.delta_e6)) for r in got.itertuples()
    }
    want = {k: (v[0], v[1] // v[0]) for k, v in deltas.items()}
    assert have == want
    assert (got.delta_e6 >= 0).all()


def test_business_days_closed_form_equals_weekday_loop(spark, sf_dir):
    got = q_business_days_lead_time(spark, sf_dir).toPandas().set_index("o_orderpriority")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")

    def wb(d: date) -> int:
        k = (d - date(1994, 12, 26)).days
        assert k >= 0
        return 5 * (k // 7) + min(k % 7, 5)

    # closed form vs a literal day-by-day weekday walk on a sample
    sample = df.head(50)
    for r in sample.itertuples():
        a, b = r.o_orderdate.date(), r.l_shipdate.date()
        lo, hi, sign = (a, b, 1) if b >= a else (b, a, -1)
        walked = sign * sum(
            1
            for i in range((hi - lo).days)
            if (lo + timedelta(days=i)).weekday() < 5
        )
        closed = wb(b) - wb(a)
        # wb(d) counts weekdays in [anchor, d), so the difference is
        # the weekday count in [order, ship) -- order date included,
        # ship date excluded -- and is antisymmetric (the synthetic
        # data contains ship-before-order rows; a negative lead is the
        # data-quality signal, not an error)
        assert closed == walked
    df["bd"] = [
        wb(b.date()) - wb(a.date()) for a, b in zip(df.o_orderdate, df.l_shipdate)
    ]
    agg = df.groupby("o_orderpriority").bd.agg(["size", "min", "max", "sum"])
    for prio, r in agg.iterrows():
        row = got.loc[prio]
        assert int(row.n_lines) == int(r["size"])
        assert int(row.min_bd) == int(r["min"])
        assert int(row.max_bd) == int(r["max"])
        assert int(row.avg_bd_e3) == (1000 * int(r["sum"])) // int(r["size"])
