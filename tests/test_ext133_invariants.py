"""ext133: literal re-derivations -- Somers' D from ROW-level pair
counting (not cells), lambda from dict modes, uncertainty coefficient
from scipy-free entropy."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext133 import (
    q_goodman_kruskal_lambda,
    q_somers_d_priority_price,
    q_uncertainty_coefficient,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def test_somers_d_matches_cell_pairs(spark, sf_dir):
    got = q_somers_d_priority_price(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()

    def band(p):
        return 1 if p < 50000 else 2 if p < 150000 else 3 if p < 300000 else 4

    cells = Counter(
        (int(r["o_orderpriority"][0]), band(r["o_totalprice"])) for r in orders
    )
    c = d = ty = 0
    for (x1, y1), n1 in cells.items():
        for (x2, y2), n2 in cells.items():
            if x2 > x1:
                if y2 > y1:
                    c += n1 * n2
                elif y2 < y1:
                    d += n1 * n2
                else:
                    ty += n1 * n2
    assert got["n_concordant"] == c
    assert got["n_discordant"] == d
    want = (c - d) / (c + d + ty)
    assert got["somers_d_y_given_x"] == pytest.approx(want, abs=1e-6)
    assert -1.0 <= got["somers_d_y_given_x"] <= 1.0


def test_lambda_matches_dict_modes(spark, sf_dir):
    got = q_goodman_kruskal_lambda(spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").collect()
    per_x = defaultdict(Counter)
    col = Counter()
    for r in cust:
        per_x[r["c_nationkey"]][r["c_mktsegment"]] += 1
        col[r["c_mktsegment"]] += 1
    sum_rowmax = sum(max(c.values()) for c in per_x.values())
    max_col = max(col.values())
    n = len(cust)
    assert got["n"] == n
    assert got["sum_rowmax"] == sum_rowmax
    assert got["max_col"] == max_col
    lam = (sum_rowmax - max_col) / (n - max_col)
    assert got["lambda_y_given_x"] == pytest.approx(lam, abs=1e-6)
    assert 0.0 <= got["lambda_y_given_x"] <= 1.0


def test_uncertainty_coefficient_matches_entropy(spark, sf_dir):
    got = q_uncertainty_coefficient(spark, sf_dir).collect()[0]
    cust = read_table(spark, sf_dir, "customer").collect()
    xy = Counter((r["c_nationkey"], r["c_mktsegment"]) for r in cust)
    x = Counter(r["c_nationkey"] for r in cust)
    y = Counter(r["c_mktsegment"] for r in cust)
    n = len(cust)

    def h(counts):
        return -sum(v / n * math.log(v / n) for v in counts.values())

    hx, hy, hxy = h(x), h(y), h(xy)
    mi = hx + hy - hxy
    assert got["h_segment"] == pytest.approx(hy, abs=2e-6)
    assert got["h_nation"] == pytest.approx(hx, abs=2e-6)
    assert got["mutual_info"] == pytest.approx(mi, abs=5e-6)
    assert got["u_segment_given_nation"] == pytest.approx(mi / hy, abs=5e-6)
    assert 0.0 <= got["u_segment_given_nation"] <= 1.0
