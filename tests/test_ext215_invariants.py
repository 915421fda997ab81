"""Definition-level re-derivations for ext215 (the ndcg/mase/
newsvendor/clark-evans/resource-allocation/Sn batch): plain-python
mirrors from collected rows -- the shared-formulation check the oracle
cannot do."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_Q = {q.name: q.fn for q in registry()}


def _daily_rev(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
        .collect()
    )
    return [r["r"] for r in sorted(rows, key=lambda x: x["o_orderdate"])]


def test_ndcg_bounds_and_idcg_dominates(spark, sf_dir):
    rows = _Q["ndcg_graded_at_k"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["dcg_e9"] <= r["idcg_e9"]  # ideal ranking dominates
        if r["idcg_e9"] > 0:
            assert 0.0 <= r["ndcg_10"] <= 1.0


def test_ndcg_idcg_matches_python_rederivation(spark, sf_dir):
    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }
    got = {r["query_id"]: r for r in _Q["ndcg_graded_at_k"](spark, sf_dir).collect()}
    for qid in range(5):
        _, lq = emb[qid]
        rels = sorted(
            (
                max(0, 2 - abs(lq - lc))
                for vid, (_, lc) in emb.items()
                if vid != qid
            ),
            reverse=True,
        )[:10]
        idcg = sum(
            int(
                math.floor(
                    1.0e9 * float(rel) * math.log(2.0)
                    / math.log(float(pos + 1))
                    + 0.5
                )
            )
            for pos, rel in enumerate(rels, start=1)
        )
        assert got[qid]["idcg_e9"] == idcg


def test_mase_matches_python(spark, sf_dir):
    r = _daily_rev(spark, sf_dir)
    aem = sum(abs(r[t] - r[t - 7]) for t in range(7, len(r)))
    aen = sum(abs(r[t] - r[t - 1]) for t in range(7, len(r)))
    st = sum(
        0
        if r[t] + r[t - 7] == 0
        else int(
            math.floor(
                1.0e9
                * (2.0 * float(abs(r[t] - r[t - 7])))
                / float(r[t] + r[t - 7])
                + 0.5
            )
        )
        for t in range(7, len(r))
    )
    row = _Q["mase_smape_backtest"](spark, sf_dir).first()
    assert row["n_days_scored"] == len(r) - 7
    assert row["sum_ae_seasonal_naive7"] == aem
    assert row["sum_ae_naive1"] == aen
    assert row["mase"] == pytest.approx(aem / aen, abs=1e-6)
    assert row["smape_pct"] == pytest.approx(
        st / (len(r) - 7) / 1e7, abs=1e-6
    )


def test_newsvendor_policy_is_cost_optimal_over_grid(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_shipdate")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("bigint")
            .alias("dmd")
        )
        .collect()
    )
    dmd = sorted(
        (r["dmd"], r["l_shipdate"]) for r in rows
    )
    n = len(dmd)
    kq = (3 * n + 3) // 4
    q_star = dmd[kq - 1][0]

    def cost(q):
        return sum(
            (q - d) if q > d else 3 * (d - q) for d, _ in dmd
        )

    row = _Q["newsvendor_critical_fractile"](spark, sf_dir).first()
    assert row["n_days"] == n
    assert row["q_star"] == q_star
    assert row["cost_at_qstar"] == cost(q_star)
    assert row["cost_at_mean"] == cost(row["q_mean"])
    # the critical-fractile choice is optimal over all observed demands
    assert cost(q_star) == min(cost(d) for d, _ in dmd)
    assert row["cost_at_qstar"] <= row["cost_at_mean"]


def test_clark_evans_matches_brute_force(spark, sf_dir):
    pts = {
        r["vec_id"]: (
            float(np.float32(r["embedding"][0])),
            float(np.float32(r["embedding"][1])),
        )
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(pts)
    arr = np.array([pts[i] for i in ids])
    d2 = ((arr[:, None, :] - arr[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    dq = np.floor(1.0e9 * np.sqrt(d2.min(1)) + 0.5).astype(np.int64)
    n = len(ids)
    mean_nn_e9 = int(dq.sum()) // n
    row = _Q["clark_evans_nn_index"](spark, sf_dir).first()
    assert row["n_points"] == n
    assert row["mean_nn_e9"] == mean_nn_e9
    area = (arr[:, 0].max() - arr[:, 0].min()) * (
        arr[:, 1].max() - arr[:, 1].min()
    )
    expected = 0.5 / math.sqrt(n / area)
    assert row["r_index"] == pytest.approx(
        (mean_nn_e9 / 1e9) / expected, abs=1e-5
    )
    assert row["z_score"] == pytest.approx(
        (mean_nn_e9 / 1e9 - expected)
        / (0.26136 / math.sqrt(n * n / area)),
        abs=1e-3,
    )


def test_resource_allocation_top_rows_match_python(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = {
        (r["o_custkey"], r["l_partkey"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey).collect()
    }
    deg = {}
    for c, _ in edges:
        deg[c] = deg.get(c, 0) + 1
    from collections import defaultdict

    ra = defaultdict(int)
    ncom = defaultdict(int)
    by_c = defaultdict(list)
    for c, p in edges:
        if 2 <= deg[c] <= 40:
            by_c[c].append(p)
    for c, parts in by_c.items():
        t = int(math.floor(100000000.0 / deg[c] + 0.5))
        parts.sort()
        for i, pa in enumerate(parts):
            for pb in parts[i + 1 :]:
                ra[(pa, pb)] += t
                ncom[(pa, pb)] += 1
    want = sorted(
        (
            (-v, k[0], k[1])
            for k, v in ra.items()
            if ncom[k] >= 2
        )
    )[:5]
    got = _Q["resource_allocation_linkpred"](spark, sf_dir).collect()[:5]
    for g, (nv, pa, pb) in zip(got, want):
        assert (g["part_a"], g["part_b"], g["ra_e8"]) == (pa, pb, -nv)
        assert g["n_common"] == ncom[(pa, pb)]


def test_sn_scale_matches_numpy(spark, sf_dir):
    r = np.array(_daily_rev(spark, sf_dir), dtype=np.int64)
    n = len(r)
    diffs = np.abs(r[:, None] - r[None, :])
    h = n // 2 + 1
    himeds = []
    for i in range(n):
        row = np.sort(np.delete(diffs[i], i))
        himeds.append(int(row[h - 2]))  # (h-1)-th order stat, 1-based
    himeds.sort()
    m = (n + 1) // 2
    sn_raw = himeds[m - 1]
    row = _Q["sn_scale_daily"](spark, sf_dir).first()
    assert row["n_days"] == n
    assert row["himed_k"] == h - 1
    assert row["lomed_k"] == m
    assert row["sn_raw_dollars"] == pytest.approx(sn_raw / 100.0, abs=0.01)
    assert row["sn_scaled_dollars"] == pytest.approx(
        1.1926 * sn_raw / 100.0, abs=0.01
    )
