"""Definition-level checks for the ext43 batch."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext43 import (
    q_boilerplate_prefix_groups,
    q_german_tank_estimate,
    q_interval_union_active_time,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_PAD = 15 * 60 * 1000000


def test_interval_union_matches_literal_sweep(spark, sf_dir):
    got = q_interval_union_active_time(spark, sf_dir).toPandas().set_index("user_id")
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts").toPandas()
    ev["t"] = ev.ts.astype("int64") // 1000
    for uid, g in ev.groupby("user_id"):
        ivs = sorted((t - _PAD, t + _PAD) for t in g.t)
        islands = []
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        total = sum(e - s for s, e in islands)
        row = got.loc[uid]
        assert int(row.n_islands) == len(islands)
        assert int(row.active_us) == total
        assert int(row.active_seconds) == total // 1000000
        # union length can never exceed the naive per-event sum
        assert total <= len(g) * 2 * _PAD


def test_german_tank_matches_literal_estimator(spark, sf_dir):
    got = q_german_tank_estimate(spark, sf_dir).toPandas().iloc[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus").toPandas()
    seen = o[o.o_orderstatus == "F"].o_orderkey.astype("int64")
    k, m = len(seen), int(seen.max())
    assert (int(got.k_observed), int(got.max_serial)) == (k, m)
    assert int(got.n_hat) == m + m // k - 1
    assert int(got.true_max_serial) == int(o.o_orderkey.max())
    # the estimator must land at or above the observed max
    assert int(got.n_hat) >= m


def test_boilerplate_groups_match_literal_prefixes(spark, sf_dir):
    got = q_boilerplate_prefix_groups(spark, sf_dir).toPandas().set_index("prefix")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    groups: dict = {}
    for r in docs.itertuples():
        pref = " ".join(r.text.split(" ")[:8])
        groups.setdefault(pref, []).append(r.doc_id)
    expect = {p: ids for p, ids in groups.items() if len(ids) > 1}
    assert set(got.index) == set(expect)
    for p, ids in expect.items():
        assert int(got.loc[p].n_docs) == len(ids)
        assert int(got.loc[p].sample_doc_id) == min(ids)
