"""Definition-level checks for the ext14 batch: Gini against the
literal O(n^2) pairwise definition, Lorenz convexity, MI against
sklearn-free python, Kaplan-Meier against a lifelines-free
product-limit replay, kNN against a numpy brute force.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext14 import (
    q_gini_coefficient,
    q_kaplan_meier_survival,
    q_knn_loo_accuracy,
    q_lorenz_curve,
    q_mutual_information,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_gini_identity_matches_pairwise_definition(spark, sf_dir):
    got = q_gini_coefficient(spark, sf_dir).toPandas().iloc[0]
    x = (
        read_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"))
        .toPandas()["x"]
        .to_numpy()
    )
    n = len(x)
    assert int(got["n"]) == n
    # literal definition: mean absolute pairwise difference / (2 * mean)
    diffs = np.abs(x[:, None] - x[None, :]).sum()
    gini_literal = diffs / (2 * n * n * x.mean())
    assert math.isclose(float(got["gini"]), gini_literal, abs_tol=1e-6)
    assert 0 <= float(got["gini"]) <= 1


def test_lorenz_curve_is_convex_below_diagonal(spark, sf_dir):
    got = q_lorenz_curve(spark, sf_dir).toPandas().sort_values("decile")
    shares = got["cum_revenue_share"].to_list()
    # ends at 1, monotone, convex, below the diagonal
    assert math.isclose(shares[-1], 1.0, abs_tol=1e-9)
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    increments = [b - a for a, b in zip([0] + shares, shares)]
    assert all(b >= a - 1e-9 for a, b in zip(increments, increments[1:]))
    for r in got.itertuples():
        assert r.cum_revenue_share <= r.pop_share + 1e-9


def test_mutual_information_matches_python(spark, sf_dir):
    got = q_mutual_information(spark, sf_dir).toPandas().iloc[0]
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").toPandas()
    joint = li.value_counts()
    n = len(li)
    pa = li["l_returnflag"].value_counts()
    pb = li["l_linestatus"].value_counts()
    mi = sum(
        (c / n) * math.log(c * n / (pa[a] * pb[b])) for (a, b), c in joint.items()
    )
    assert math.isclose(float(got["mi_nats"]), mi, abs_tol=1e-6)
    assert float(got["mi_nats"]) >= 0
    assert int(got["n_cells"]) == len(joint)


def test_kaplan_meier_matches_product_limit_replay(spark, sf_dir):
    got = q_kaplan_meier_survival(spark, sf_dir).toPandas().sort_values("t_days")
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"), "event_type")
        .toPandas()
    )
    obs = []
    for uid, grp in ev.groupby("user_id"):
        first = grp["d"].min()
        p = grp[grp.event_type == "purchase"]["d"].min()
        if pd.notna(p):
            obs.append(((p - first).days, 1))
        else:
            obs.append(((grp["d"].max() - first).days, 0))
    df = pd.DataFrame(obs, columns=["t", "ev"]).sort_values("t")
    s, out = 1.0, {}
    total = len(df)
    for t in sorted(df["t"].unique()):
        d = int(df[(df.t == t)]["ev"].sum())
        n_risk = int((df["t"] >= t).sum())
        if d > 0:
            s = s * (1 - d / n_risk) if d < n_risk else 0.0
            out[t] = (d, n_risk, s)
    assert len(got) == len(out)
    for r in got.itertuples():
        d, n_risk, s = out[r.t_days]
        assert (r.n_events, r.n_at_risk) == (d, n_risk)
        assert math.isclose(r.survival, s, abs_tol=1e-5)
    # survivor function is non-increasing
    assert all(
        b <= a + 1e-9
        for a, b in zip(got["survival"], got["survival"][1:])
    )


def test_knn_matches_numpy_bruteforce(spark, sf_dir):
    got = q_knn_loo_accuracy(spark, sf_dir).toPandas().iloc[0]
    emb = read_table(spark, sf_dir, "embeddings").toPandas()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    labels = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    norms = np.linalg.norm(V, axis=1)
    correct = 0
    probe_idx = np.where(ids < 100)[0]
    for i in probe_idx:
        cos = np.round((V @ V[i]) / (norms * norms[i]), 6)
        order = sorted(
            [(j, cos[j]) for j in range(len(ids)) if ids[j] != ids[i]],
            key=lambda t: (-t[1], ids[t[0]]),
        )[:5]
        votes = {}
        for j, _ in order:
            votes[labels[j]] = votes.get(labels[j], 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        correct += int(pred == labels[i])
    assert int(got["n_probes"]) == len(probe_idx)
    assert int(got["n_correct"]) == correct
    assert math.isclose(float(got["accuracy"]), correct / len(probe_idx), abs_tol=1e-6)
