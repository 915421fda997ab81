"""Definition-level checks for the ext39 batch."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext39 import (
    q_asof_nearest_join,
    q_diversified_topk,
    q_set_ops_multiset,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_diversified_topk_respects_cap_and_order(spark, sf_dir):
    got = q_diversified_topk(spark, sf_dir).toPandas()
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    ).toPandas()
    li["c"] = np.round(li.l_extendedprice * 100).astype("int64")
    rev = li.groupby(["l_partkey", "l_suppkey"]).c.sum()
    # literal recompute: per-supplier top-2, then global top-20
    per_supp: dict = {}
    for (part, supp), cents in rev.items():
        per_supp.setdefault(supp, []).append((int(cents), part))
    survivors = []
    for supp, rows in per_supp.items():
        for rank, (cents, part) in enumerate(
            sorted(rows, key=lambda t: (-t[0], t[1]))[:2], start=1
        ):
            survivors.append((cents, part, supp, rank))
    want = sorted(survivors, key=lambda t: (-t[0], t[1]))[:20]
    assert len(got) == len(want)
    for row, (cents, part, supp, rank) in zip(got.itertuples(), want):
        assert (row.part, row.supp, int(row.cents), int(row.supp_rank)) == (
            part,
            supp,
            cents,
            rank,
        )
    assert got.groupby("supp").size().max() <= 2


def test_multiset_ops_match_count_identities(spark, sf_dir):
    got = q_set_ops_multiset(spark, sf_dir).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    ).toPandas()
    a = Counter(o[o.o_totalprice > 200000].o_custkey)
    b = Counter(o[o.o_orderpriority == "1-URGENT"].o_custkey)
    ex = {k: a[k] - b.get(k, 0) for k in a if a[k] - b.get(k, 0) > 0}
    ix = {k: min(a[k], b[k]) for k in a if k in b}
    have_ex = {
        r.k: int(r.multiplicity) for r in got[got.op == "except_all"].itertuples()
    }
    have_ix = {
        r.k: int(r.multiplicity) for r in got[got.op == "intersect_all"].itertuples()
    }
    assert have_ex == ex
    assert have_ix == ix


def test_asof_nearest_matches_literal_scan(spark, sf_dir):
    got = q_asof_nearest_join(spark, sf_dir).toPandas().set_index("error_event_id")
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).toPandas()
    ev = ev[ev.event_type.isin(["error", "purchase"])].copy()
    ev["t"] = ev.ts.astype("int64") // 1000
    expect = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["t", "event_id"])
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != "error":
                continue
            prev = max(
                (x.t for x in rows[:i] if x.event_type == "purchase"), default=None
            )
            nxt = min(
                (x.t for x in rows[i + 1 :] if x.event_type == "purchase"),
                default=None,
            )
            if prev is None and nxt is None:
                continue
            if nxt is None or (prev is not None and r.t - prev <= nxt - r.t):
                dt, direction = r.t - prev, "before"
            else:
                dt, direction = nxt - r.t, "after"
            if dt <= 6 * 3600 * 1000000:
                expect[r.event_id] = (uid, dt, direction)
    assert set(got.index) == set(expect)
    for eid, (uid, dt, direction) in expect.items():
        row = got.loc[eid]
        assert (int(row.user_id), int(row.nearest_dt_us), row.direction) == (
            uid,
            dt,
            direction,
        )
