"""Definition-level checks for the ext66 batch."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext66 import (
    _Z_A,
    _Z_B,
    q_ab_sample_size_power,
    q_chao1_richness,
    q_goodman_kruskal_gamma,
    q_pacf_daily_revenue,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_pacf_matches_literal_durbin_levinson(spark, sf_dir):
    row = q_pacf_daily_revenue(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    uniq, idx = np.unique(days[order], return_index=True)
    x = np.add.reduceat(cents[order], idx).astype(object)
    n, sx = len(x), sum(x)
    dev = [n * int(v) - sx for v in x]
    c0 = sum(d * d for d in dev)
    r = {}
    for k in (1, 2, 3):
        r[k] = sum(dev[t] * dev[t + k] for t in range(n - k)) / c0
    assert row["n_days"] == n
    for k in (1, 2, 3):
        assert abs(row[f"acf{k}"] - r[k]) < 1e-6
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = phi11 - phi22 * phi11
    pacf3 = (r[3] - phi21 * r[2] - phi22 * r[1]) / (1 - phi21 * r[1] - phi22 * r[2])
    assert abs(row["pacf1"] - phi11) < 1e-6
    assert abs(row["pacf2"] - phi22) < 1e-6
    assert abs(row["pacf3"] - pacf3) < 1e-6


def test_gamma_matches_literal_pair_counts(spark, sf_dir):
    row = q_goodman_kruskal_gamma(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).toPandas()
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).toPandas()
    df = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    xo = df.o_orderpriority.str[0].astype(int).to_numpy()
    q = df.l_quantity.to_numpy()
    yo = np.where(q <= 16, 1, np.where(q <= 33, 2, 3))
    cells = Counter(zip(xo.tolist(), yo.tolist()))
    conc = disc = tie_x = tie_y = 0
    items = sorted(cells.items())
    for i, ((x1, y1), n1) in enumerate(items):
        # lexicographic order means (x2, y2) > (x1, y1) for every later
        # item, exactly the SQL pair condition (each unordered pair once)
        for (x2, y2), n2 in items[i + 1 :]:
            p = n1 * n2
            if x2 > x1 and y2 > y1:
                conc += p
            elif x2 > x1 and y2 < y1:
                disc += p
            elif x2 > x1 and y2 == y1:
                tie_y += p
            elif x2 == x1 and y2 != y1:
                tie_x += p
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert abs(row["gk_gamma"] - (conc - disc) / (conc + disc)) < 1e-6
    assert abs(row["somers_d_yx"] - (conc - disc) / (conc + disc + tie_y)) < 1e-6
    assert abs(row["somers_d_xy"] - (conc - disc) / (conc + disc + tie_x)) < 1e-6
    assert -1.0 <= row["somers_d_yx"] <= row["gk_gamma"] <= 1.0 or (
        row["gk_gamma"] <= row["somers_d_yx"] <= 1.0
    )


def test_chao1_matches_literal_spectrum(spark, sf_dir):
    got = {r["source"]: r for r in q_chao1_richness(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    for src, g in docs.groupby("source"):
        counts = Counter(t for text in g.text for t in text.split(" "))
        s_obs, n_tok = len(counts), sum(counts.values())
        f1 = sum(1 for c in counts.values() if c == 1)
        f2 = sum(1 for c in counts.values() if c == 2)
        r = got[src]
        assert (r["s_obs"], r["n_tokens"], r["f1"], r["f2"]) == (s_obs, n_tok, f1, f2)
        assert abs(r["chao1"] - (s_obs + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-6
        assert abs(r["good_turing_p0"] - f1 / n_tok) < 1e-6
        assert r["chao1"] >= s_obs  # richness estimate never below observed


def test_sample_size_matches_literal_formula(spark, sf_dir):
    row = q_ab_sample_size_power(spark, sf_dir).collect()[0]
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).toPandas()
    conv = (
        ev.assign(c=((ev.event_type == "purchase") & (ev.value > 150)).astype(int))
        .groupby("user_id")
        .c.max()
    )
    arms = {0: [0, 0], 1: [0, 0]}
    for uid, c in conv.items():
        arms[uid % 2][0] += 1
        arms[uid % 2][1] += int(c)
    (n_a, x_a), (n_b, x_b) = arms[0], arms[1]
    p_a, p_b = x_a / n_a, x_b / n_b
    pbar = (x_a + x_b) / (n_a + n_b)
    assert (row["n_a"], row["x_a"], row["n_b"], row["x_b"]) == (n_a, x_a, n_b, x_b)
    if p_a == p_b:
        assert row["n_per_arm_80pct"] is None
    else:
        n_req = math.ceil(
            (
                _Z_A * math.sqrt(2 * pbar * (1 - pbar))
                + _Z_B * math.sqrt(p_a * (1 - p_a) + p_b * (1 - p_b))
            )
            ** 2
            / (p_a - p_b) ** 2
        )
        assert row["n_per_arm_80pct"] == n_req
        # sanity: detecting a small delta needs more users than we have
        # arms if the observed delta is small relative to noise
        assert n_req >= 1
