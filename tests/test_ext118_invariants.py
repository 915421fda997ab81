"""ext118: literal re-derivations -- Erlang B via the textbook
RECURSION (vs the query's log-space grid), Little's law via per-span
window overlap (vs the boundary sweep), Croston via the sequential SES
recursion (vs the prefix-sum unroll)."""

from __future__ import annotations

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext118 import (
    _BIG_TICKET,
    _CROSTON_ALPHA,
    _CROSTON_W,
    _MAX_C,
    q_croston_intermittent,
    q_erlang_b_blocking,
    q_littles_law_window,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table
from pyspark.sql import functions as F


def test_erlang_b_matches_recursion(spark, sf_dir):
    rows = {r["servers"]: r for r in q_erlang_b_blocking(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, _MAX_C + 1))
    a = rows[1]["offered_erlangs"]
    b = 1.0
    prev = None
    for c in range(1, _MAX_C + 1):
        b = a * b / (c + a * b)  # textbook Erlang B recursion
        assert rows[c]["p_block"] == pytest.approx(b, abs=5e-6)
        assert rows[c]["carried_erlangs"] == pytest.approx(a * (1 - b), abs=5e-6)
        if prev is not None:
            assert rows[c]["p_block"] <= prev + 1e-12  # monotone in servers
        prev = rows[c]["p_block"]
        assert 0.0 <= rows[c]["p_block"] <= 1.0


def test_littles_law_matches_span_overlap(spark, sf_dir):
    got = q_littles_law_window(spark, sf_dir).collect()[0]
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = [
        (r["o_orderdate"].toordinal(), r["en"].toordinal())
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("en"))
        .where(F.col("en") > F.col("o_orderdate"))
        .collect()
    ]
    import datetime

    y = int(got["window_year"])
    w0 = datetime.date(y, 1, 1).toordinal()
    w1 = datetime.date(y + 1, 1, 1).toordinal()
    # integral of the open-count level over the window == sum of
    # per-span overlaps (independent of the boundary-sweep machinery)
    area = sum(max(0, min(en, w1) - max(st, w0)) for st, en in spans)
    t = w1 - w0
    assert got["t_days"] == t
    assert got["l_timeavg"] == pytest.approx(area / t, abs=2e-6)
    arr = [(st, en) for st, en in spans if w0 <= st < w1]
    assert got["n_arr"] == len(arr)
    lam = len(arr) / t
    wbar = sum(en - st for st, en in arr) / len(arr)
    assert got["lambda_per_day"] == pytest.approx(lam, abs=2e-6)
    assert got["w_mean_days"] == pytest.approx(wbar, abs=2e-6)
    assert got["littles_ratio"] == pytest.approx(lam * wbar / (area / t), abs=2e-5)


def test_croston_matches_sequential_ses(spark, sf_dir):
    got = q_croston_intermittent(spark, sf_dir).collect()[0]
    nz = sorted(
        (r["d"], r["z"])
        for r in read_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _BIG_TICKET)
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("z"))
        .collect()
    )
    assert got["n_nonzero_days"] == len(nz)
    lastw = nz[-_CROSTON_W:]
    sizes = [z for _, z in lastw[1:]]
    gaps = [(lastw[k][0] - lastw[k - 1][0]).days for k in range(1, len(lastw))]
    assert got["n_fit_points"] == len(sizes)

    def ses(xs):
        s = xs[0]
        for x in xs[1:]:
            s = _CROSTON_ALPHA * x + (1 - _CROSTON_ALPHA) * s
        return s

    z_hat, p_hat = ses(sizes), ses(gaps)
    assert got["z_hat"] == pytest.approx(z_hat, abs=2e-5)
    assert got["p_hat_days"] == pytest.approx(p_hat, abs=2e-5)
    assert got["croston_rate"] == pytest.approx(z_hat / p_hat, abs=2e-5)
    assert got["sba_rate"] == pytest.approx(
        (1 - _CROSTON_ALPHA / 2) * z_hat / p_hat, abs=2e-5
    )
    assert got["sba_rate"] < got["croston_rate"]
