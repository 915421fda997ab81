"""ext204: X-mR chart re-derivation (pandas moving ranges + the d2/D4
constants) and Qini laws -- the endpoint identity, the null behavior
on hash-random treatment, and a planted heterogeneous effect whose
qini curve the formula must recover as concave-rising."""

from __future__ import annotations

import duckdb
import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext204 import (
    q_qini_uplift_deciles,
    q_xmr_individuals_chart,
)


def test_xmr_rederived(spark, sf_dir):
    pdf = (
        q_xmr_individuals_chart(spark, sf_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    cents = daily["cents"].to_list()
    mrs = [abs(a - b) for a, b in zip(cents[1:], cents[:-1])]
    xbar = sum(cents) / len(cents)
    mrbar = sum(mrs) / len(mrs)
    assert len(pdf) == len(cents)
    assert float(pdf["xbar_cents"].iloc[0]) == round(xbar, 4)
    assert float(pdf["ucl_x"].iloc[0]) == round(xbar + 2.66 * mrbar, 4)
    assert float(pdf["ucl_mr"].iloc[0]) == round(3.267 * mrbar, 4)
    # violation flags agree with the recomputed limits
    for _, r in pdf.iterrows():
        beyond = (
            r["cents"] > xbar + 2.66 * mrbar
            or r["cents"] < xbar - 2.66 * mrbar
        )
        assert bool(r["x_beyond"]) == beyond
    # first day has no moving range
    assert pdf["mrange"].isna().sum() == 1


def _qini_curve(rows):
    """rows: (decile, treated, y) -> list of (decile, qini)."""
    per: dict[int, list[int]] = {}
    for d, t, y in rows:
        acc = per.setdefault(d, [0, 0, 0, 0])
        if t:
            acc[0] += 1
            acc[1] += y
        else:
            acc[2] += 1
            acc[3] += y
    out, cnt, cyt, cnc, cyc = [], 0, 0, 0, 0
    for d in sorted(per):
        nt, yt, nc, yc = per[d]
        cnt, cyt, cnc, cyc = cnt + nt, cyt + yt, cnc + nc, cyc + yc
        out.append((d, cyt - cyc * cnt / cnc))
    return out


def test_planted_heterogeneous_effect_recovered():
    rng = np.random.default_rng(204)
    rows = []
    for i in range(20000):
        d = (i % 10) + 1  # decile by construction
        t = int(rng.integers(0, 2))
        base = 0.2
        lift = 0.3 if d <= 3 else 0.0  # effect concentrated up top
        p = base + (lift if t else 0.0)
        rows.append((d, t, int(rng.random() < p)))
    curve = _qini_curve(rows)
    q3 = dict(curve)[3]
    q10 = dict(curve)[10]
    # curve rises through the responsive deciles then flattens:
    # most of the final qini is earned by decile 3
    assert q3 > 0.7 * q10 > 0
    # null treatment: curve stays near zero
    null_rows = [(d, t, int(rng.random() < 0.25)) for d, t, _ in rows]
    nc = _qini_curve(null_rows)
    assert abs(dict(nc)[10]) < 0.05 * q10 + 50


def test_qini_query_identities(spark, sf_dir):
    pdf = q_qini_uplift_deciles(spark, sf_dir).toPandas().sort_values(
        "decile"
    )
    assert list(pdf["decile"]) == list(range(1, 11))
    # endpoint identity: last qini = Yt - Yc * Nt / Nc over everything
    nt, yt = int(pdf["n_t"].sum()), int(pdf["y_t"].sum())
    nc, yc = int(pdf["n_c"].sum()), int(pdf["y_c"].sum())
    assert float(pdf["qini"].iloc[-1]) == round(yt - yc * nt / nc, 6) + 0.0
    # per-decile uplift recomputes from the emitted counts
    for _, r in pdf.iterrows():
        if r["n_t"] and r["n_c"]:
            assert float(r["uplift"]) == round(
                r["y_t"] / r["n_t"] - r["y_c"] / r["n_c"], 6
            ) + 0.0
