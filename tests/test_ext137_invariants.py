"""ext137: literal re-derivations of the GLM Newton folds and the
ulcer index in raw Python floats (no e9 quantization), so a shared
gradient/Hessian formulation bug between the Spark and DuckDB
expressions cannot hide behind the hash oracle."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext137 import (
    q_logistic_newton_1d,
    q_poisson_glm_loglink,
    q_ulcer_index_daily,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _newton_rounds(cells, init_b0, n_rounds=3, link="logit"):
    """cells: list of (x_std, y, weight). Returns (b0, b1) after
    n_rounds Newton steps, matching the query's update exactly."""
    b0, b1 = init_b0, 0.0
    for _ in range(n_rounds):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y, c in cells:
            z = b0 + b1 * x
            if link == "logit":
                p = 1.0 / (1.0 + math.exp(-z))
                w = p * (1.0 - p)
                r = y - p
            else:  # poisson log link
                w = math.exp(z)
                r = y - w
            g0 += c * r
            g1 += c * r * x
            h00 += c * w
            h01 += c * w * x
            h11 += c * w * x * x
        det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
    return b0, b1


def test_logistic_matches_literal_newton(spark, sf_dir):
    row = q_logistic_newton_1d(spark, sf_dir).collect()[0]
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_returnflag")
        .collect()
    )
    counts = defaultdict(int)
    for r in li:
        v = round(r["l_extendedprice"] * 100)
        y = 1 if r["l_returnflag"] == "R" else 0
        counts[(v, y)] += 1
    n = sum(counts.values())
    sx = sum(v * c for (v, _), c in counts.items())
    sxx = sum(v * v * c for (v, _), c in counts.items())
    sy = sum(y * c for (_, y), c in counts.items())
    mu = sx / n
    sg = math.sqrt(n * sxx - sx * sx) / n
    cells = [((v - mu) / sg, y, c) for (v, y), c in counts.items()]
    b0, b1 = _newton_rounds(cells, math.log(sy / (n - sy)))
    assert row["n_rows"] == n
    assert row["beta0"] == pytest.approx(b0, abs=1e-4)
    assert row["beta1_per_sd"] == pytest.approx(b1, abs=1e-4)
    assert row["odds_ratio_per_sd"] == pytest.approx(math.exp(b1), abs=1e-4)
    ll = sum(
        c
        * (
            y * math.log(1 / (1 + math.exp(-(b0 + b1 * x))))
            + (1 - y) * math.log(1 - 1 / (1 + math.exp(-(b0 + b1 * x))))
        )
        for x, y, c in cells
    )
    rate = sy / n
    ll0 = sum(
        c * (y * math.log(rate) + (1 - y) * math.log(1 - rate))
        for x, y, c in cells
    )
    assert row["deviance"] == pytest.approx(-2 * ll, rel=1e-5)
    assert row["mcfadden_r2"] == pytest.approx(1 - ll / ll0, abs=1e-5)


def test_logistic_recovers_planted_signal():
    # pure formula check on separable-ish synthetic cells: y depends
    # on x with known slope; 3 Newton rounds from the base-rate init
    # must move beta1 decisively positive.
    cells = []
    for i in range(-50, 51):
        x = i / 25.0
        p = 1.0 / (1.0 + math.exp(-(0.5 + 2.0 * x)))
        # deterministic pseudo-labels: weight cells by p instead of
        # sampling -- two cells (x, 1, p*100) and (x, 0, (1-p)*100)
        cells.append((x, 1, p * 100))
        cells.append((x, 0, (1 - p) * 100))
    b0, b1 = _newton_rounds(cells, 0.0)
    assert b1 == pytest.approx(2.0, abs=0.05)
    assert b0 == pytest.approx(0.5, abs=0.05)


def test_poisson_matches_literal_newton(spark, sf_dir):
    row = q_poisson_glm_loglink(spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    orders = read_table(spark, sf_dir, "orders").select("o_custkey").collect()
    k = defaultdict(int)
    for r in orders:
        k[r["o_custkey"]] += 1
    cells_raw = [(round(r["c_acctbal"] * 100), k.get(r["c_custkey"], 0)) for r in cust]
    n = len(cells_raw)
    sx = sum(v for v, _ in cells_raw)
    sxx = sum(v * v for v, _ in cells_raw)
    sk = sum(y for _, y in cells_raw)
    mu = sx / n
    sg = math.sqrt(n * sxx - sx * sx) / n
    cells = [((v - mu) / sg, y, 1) for v, y in cells_raw]
    b0, b1 = _newton_rounds(cells, math.log(sk / n), link="poisson")
    assert row["n_customers"] == n
    assert row["n_orders"] == sk
    assert row["beta0"] == pytest.approx(b0, abs=1e-4)
    assert row["beta1_per_sd"] == pytest.approx(b1, abs=1e-4)
    x2 = sum(
        (y - math.exp(b0 + b1 * x)) ** 2 / math.exp(b0 + b1 * x)
        for x, y, _ in cells
    )
    assert row["pearson_dispersion"] == pytest.approx(x2 / (n - 2), rel=1e-4)


def test_ulcer_index_matches_literal(spark, sf_dir):
    row = q_ulcer_index_daily(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) for r in daily}
    xs = [per[d] for d in sorted(per)]
    peak, s2, under = 0, 0.0, 0
    for v in xs:
        peak = max(peak, v)
        dd = 100.0 * (peak - v) / peak
        s2 += dd * dd
        under += v < peak
    assert row["n_days"] == len(xs)
    assert row["n_underwater_days"] == under
    assert row["ulcer_index_pct"] == pytest.approx(
        math.sqrt(s2 / len(xs)), abs=1e-5
    )
