"""Definition-level invariants for ext251 (LLM-curation extensions):
the logistic fit's fixed-point / calibration-in-the-large law, exact
Newton recovery on a planted logistic sample, and the gaps-and-islands
longest-run identity against a direct scan implementation."""

from __future__ import annotations

import math
import random

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql

_Q = {q.name: q for q in registry()}
_SF = "/root/testdata/sf0.001"


def _oracle(name: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{_SF}/{t}.parquet'"
        )
    df = con.execute(resolve_sql(_Q[name], _SF)).df()
    con.close()
    return df


def test_calibration_in_the_large():
    """At the logistic MLE the score equation g0 = sum(y - p) = 0, so
    the total predicted mass equals the total target count. Three
    Newton rounds from the logit-rate init get within a fraction of a
    document on this data -- the calibration-in-the-large law that
    makes the classifier usable as a curation gate."""
    df = _oracle("quality_classifier_calibration")
    assert len(df) == 10
    n = int(df["n_docs"].sum())
    assert n == 500  # every document is scored exactly once
    pred_docs = float((df["pred_ppm"] * df["n_docs"]).sum()) / 1e6
    target_docs = float(df["n_target"].sum())
    assert abs(pred_docs - target_docs) < 1.0
    # per-decile identities
    assert (df["gap_ppm"] == df["pred_ppm"] - df["rate_ppm"]).all()
    assert df["brier_ppm"].nunique() == 1
    assert 0 < int(df["brier_ppm"].iloc[0]) < 250_000  # beats p=0.5 always


def _newton_1d(xs, ys, rounds=3):
    """Reference Newton on raw doubles (NOT the e9 fold -- an
    independent formulation, so a shared quantization bug can't hide)."""
    n = len(xs)
    mu = sum(xs) / n
    sg = math.sqrt(sum(x * x for x in xs) / n - mu * mu)
    sy = sum(ys)
    b0, b1 = math.log(sy / (n - sy)), 0.0
    for _ in range(rounds):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y in zip(xs, ys):
            z = (x - mu) / sg
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * z)))
            g0 += y - p
            g1 += (y - p) * z
            h00 += p * (1 - p)
            h01 += p * (1 - p) * z
            h11 += p * (1 - p) * z * z
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    return b0, b1


def test_newton_recovers_planted_slope():
    """On a sample drawn from a true logistic law, 3 Newton rounds
    recover a positive slope close to truth (sign + magnitude), and
    the fitted mean prediction matches the empirical rate."""
    rng = random.Random(251)
    xs, ys = [], []
    for _ in range(4000):
        x = rng.uniform(0, 100)
        p = 1.0 / (1.0 + math.exp(-(-2.0 + 0.05 * x)))
        xs.append(x)
        ys.append(1 if rng.random() < p else 0)
    b0, b1 = _newton_1d(xs, ys)
    sg = math.sqrt(
        sum(x * x for x in xs) / len(xs) - (sum(xs) / len(xs)) ** 2
    )
    assert b1 > 0
    assert abs(b1 / sg - 0.05) < 0.01  # de-standardized slope near truth


def _longest_run_scan(hit_flags):
    best = cur = 0
    for h in hit_flags:
        cur = cur + 1 if h else 0
        best = max(best, cur)
    return best


def test_islands_identity_fuzz():
    """The p - row_number() gaps-and-islands grouping used by the
    query equals the direct linear scan on random hit sequences."""
    rng = random.Random(77)
    for _ in range(300):
        flags = [rng.random() < 0.4 for _ in range(rng.randint(0, 40))]
        hits = [p for p, h in enumerate(flags, start=1) if h]
        groups: dict[int, int] = {}
        for rank, p in enumerate(hits, start=1):
            groups[p - rank] = groups.get(p - rank, 0) + 1
        assert max(groups.values(), default=0) == _longest_run_scan(flags)


def test_decontamination_laws():
    """longest_run <= n_matched <= n_shingles on every emitted row;
    contaminated == (longest_run >= 8); global counters constant."""
    df = _oracle("decontamination_span_filter")
    assert (df["longest_run"] <= df["n_matched"]).all()
    assert (df["n_matched"] <= df["n_shingles"]).all()
    assert (
        (df["contaminated"] == 1) == (df["longest_run"] >= 8)
    ).all()
    assert df["n_eval_docs"].nunique() == 1
    assert df["n_flagged"].nunique() == 1
    # the split is deterministic: ~19% of doc ids hash into the ring
    n_eval = int(df["n_eval_docs"].iloc[0])
    assert 0 < n_eval < 500
