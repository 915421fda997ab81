"""Definition-level checks for the ext76 rank-test batch: literal
numpy re-derivations (per-row midranks, brute-force pair counts on a
sample) against the spine-based query outputs."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext76 import (
    q_cliffs_delta,
    q_kruskal_wallis,
    q_moods_median_test,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _midranks(v):
    """1-based average ranks with ties (literal O(n log n) version)."""
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype="float64")
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_kruskal_wallis_definition(spark, sf_dir):
    row = q_kruskal_wallis(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    v = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    g = o.o_orderpriority.to_numpy()
    n = len(v)
    ranks = _midranks(v)
    groups = sorted(set(g))
    s = 0.0
    for gr in groups:
        m = g == gr
        s += m.sum() * (ranks[m].mean() - (n + 1) / 2.0) ** 2
    _, counts = np.unique(v, return_counts=True)
    tie = (counts.astype("float64") ** 3 - counts).sum()
    h = (12.0 / (n * (n + 1)) * s) / (1 - tie / (n**3 - n))
    assert row["n_total"] == n
    assert row["k_groups"] == len(groups)
    # query floors each group term to an integer -- tolerance covers it
    assert abs(row["h_stat"] - h) < 1e-4
    eps = (h - len(groups) + 1) / (n - len(groups))
    assert abs(row["epsilon_sq"] - eps) < 1e-4
    assert row["h_stat"] >= 0.0


def test_moods_median_definition(spark, sf_dir):
    row = q_moods_median_test(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).toPandas()
    v = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype("int64")
    g = li.l_returnflag.to_numpy()
    sv = np.sort(v)
    n = len(sv)
    # lower median: first value whose cumulative count reaches n/2
    med = int(sv[np.argmax(2 * np.arange(1, n + 1) >= n)])
    assert row["grand_median_dollars"] == round(med / 100, 2)
    groups = sorted(set(g))
    assert row["k_groups"] == len(groups)
    assert row["dof"] == len(groups) - 1
    above = v > med
    ca = int(above.sum())
    chi2 = 0.0
    for gr in groups:
        m = g == gr
        rg = int(m.sum())
        oa = int((above & m).sum())
        for obs, col in ((oa, ca), (rg - oa, n - ca)):
            e = rg * col / n
            chi2 += (obs - e) ** 2 / e
    assert abs(row["chi2_stat"] - chi2) < 1e-2
    assert row["chi2_stat"] >= 0.0


def test_cliffs_delta_definition(spark, sf_dir):
    row = q_cliffs_delta(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    sel = o[o.o_orderpriority.isin(["1-URGENT", "5-LOW"])]
    v = np.floor(sel.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    arm = (sel.o_orderpriority == "1-URGENT").to_numpy()
    x, y = np.sort(v[arm]), np.sort(v[~arm])
    n1, n0 = len(x), len(y)
    assert row["n_urgent"] == n1 and row["n_low"] == n0
    # exact pair counts via searchsorted (O(n log n) literal form)
    gt = np.searchsorted(y, x, side="left").sum()       # pairs x > y
    ge = np.searchsorted(y, x, side="right").sum()      # pairs x >= y
    delta = (gt - (n1 * n0 - ge)) / (n1 * n0)
    a = (gt + (ge - gt) / 2.0) / (n1 * n0)
    assert abs(row["cliffs_delta"] - delta) < 1e-6
    assert abs(row["vd_a"] - a) < 1e-6
    # the two are affinely linked: A = (delta + 1) / 2
    assert abs(row["vd_a"] - (row["cliffs_delta"] + 1) / 2) < 2e-6
    assert -1.0 <= row["cliffs_delta"] <= 1.0
    thresholds = {"negligible": 0.147, "small": 0.33, "medium": 0.474}
    mag = row["magnitude"]
    ad = abs(row["cliffs_delta"])
    if mag in thresholds:
        assert ad < thresholds[mag]
    else:
        assert mag == "large" and ad >= 0.474
