"""Definition-level checks for the ext74 batch."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext74 import (
    _QTE_PCTS,
    q_quantile_treatment_effects,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_qte_matches_literal_order_statistics(spark, sf_dir):
    got = {
        r["quantile_pct"]: r
        for r in q_quantile_treatment_effects(spark, sf_dir).collect()
    }
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    sel = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    v = np.floor(sel.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    urgent = (sel.o_orderpriority == "1-URGENT").to_numpy()

    def quantile(vals, pct):
        s = np.sort(vals)
        n = len(s)
        cc = np.arange(1, n + 1)
        return int(s[np.argmax(100 * cc >= pct * n)])

    assert sorted(got) == sorted(_QTE_PCTS)
    prev_u = prev_l = None
    for pct in _QTE_PCTS:
        qu = quantile(v[urgent], pct)
        ql = quantile(v[~urgent], pct)
        r = got[pct]
        assert r["urgent_cents"] == qu
        assert r["low_cents"] == ql
        assert r["qte_cents"] == qu - ql
        # quantiles are monotone in pct
        if prev_u is not None:
            assert qu >= prev_u and ql >= prev_l
        prev_u, prev_l = qu, ql
