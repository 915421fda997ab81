"""Definition-level checks for the ext62 batch (pure Python/numpy
re-derivations on the sf0.001 tables, per CLAUDE.md discipline)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext62 import (
    _EULER_GAMMA,
    q_gumbel_block_maxima,
    q_markov_entropy_rate,
    q_net_revenue_retention,
    q_page_hinkley_drift,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _orders_pdf(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )


def _daily(o):
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype("int64")
    days = o.o_orderdate.to_numpy()
    order = np.argsort(days, kind="mergesort")
    days, cents = days[order], cents[order]
    uniq, idx = np.unique(days, return_index=True)
    return uniq, np.add.reduceat(cents, idx)


def test_page_hinkley_matches_literal_scan(spark, sf_dir):
    row = q_page_hinkley_drift(spark, sf_dir).collect()[0]
    o = _orders_pdf(spark, sf_dir)
    days, x = _daily(o)
    n, s = len(x), int(x.sum())
    # m_t scaled by n: M_t = n*prefix_t - t*s, PH_t = M_t - running min
    pref = np.cumsum(x.astype(object))
    m = np.array([n * int(pref[t]) - (t + 1) * s for t in range(n)], dtype=object)
    running_min = np.minimum.accumulate(m)
    ph = m - running_min
    peak_idx = int(np.argmax(ph))  # ties -> earliest, matching the date tiebreak
    assert row["n_days"] == n
    assert row["max_ph_cents"] == int(ph[peak_idx]) // n
    assert str(row["peak_date"])[:10] == str(days[peak_idx])[:10]
    alarm_idx = min(t for t in range(n) if 2 * ph[t] >= ph[peak_idx])
    assert str(row["first_half_alarm_date"])[:10] == str(days[alarm_idx])[:10]


def test_gumbel_fit_matches_literal_moments(spark, sf_dir):
    row = q_gumbel_block_maxima(spark, sf_dir).collect()[0]
    o = _orders_pdf(spark, sf_dir)
    days, x = _daily(o)
    months = days.astype("datetime64[M]")
    mx = {}
    for m, v in zip(months, x):
        mx[m] = max(mx.get(m, 0), int(v))
    vals = np.array(sorted(mx.values()), dtype="float64")
    nb = len(mx)
    mean, sd = vals.mean(), vals.std()  # population std, like the query
    beta = math.sqrt(6) * sd / math.pi
    mu = mean - _EULER_GAMMA * beta
    thresh = 3 * sum(int(v) for v in mx.values()) // (2 * nb)
    p = 1 - math.exp(-math.exp(-(thresh - mu) / beta))
    assert row["n_blocks"] == nb
    assert abs(row["mean_max_cents"] - mean) < 1e-3
    assert abs(row["sd_max_cents"] - sd) < 1e-3
    assert abs(row["beta_cents"] - beta) < 1e-3
    assert abs(row["mu_cents"] - mu) < 1e-3
    assert row["thresh_cents"] == thresh
    assert abs(row["p_exceed_thresh"] - p) < 1e-6
    # the Gumbel CDF at the fitted location should put the threshold in
    # the upper tail (it is 1.5x the mean block max)
    assert 0.0 <= row["p_exceed_thresh"] < 0.5


def test_nrr_matches_literal_cohorts(spark, sf_dir):
    got = {
        (r["cohort_year"], r["cohort_month"], r["month_offset"]): r
        for r in q_net_revenue_retention(spark, sf_dir).collect()
    }
    o = _orders_pdf(spark, sf_dir)
    midx = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    o = o.assign(midx=midx, cents=np.floor(o.o_totalprice * 100 + 0.5).astype("int64"))
    cohort = o.groupby("o_custkey").midx.min()
    o = o.assign(k=o.midx - cohort.loc[o.o_custkey].to_numpy())
    rev = o.groupby([cohort.loc[o.o_custkey].to_numpy(), o.k]).agg(
        rev=("cents", "sum"), n=("o_custkey", "nunique")
    )
    for (cm, k), r in rev.iterrows():
        if k > 5:
            continue
        rev0 = int(rev.loc[(cm, 0), "rev"])
        key = ((cm - 1) // 12, (cm - 1) % 12 + 1, k)
        assert key in got, key
        assert got[key]["rev_cents"] == int(r["rev"])
        assert got[key]["n_active"] == int(r["n"])
        assert got[key]["nrr_ppm"] == (1000000 * int(r["rev"])) // rev0
    assert all(got[k]["nrr_ppm"] == 1000000 for k in got if k[2] == 0)


def test_markov_entropy_matches_literal_chain(spark, sf_dir):
    got = {r["from_state"]: r for r in q_markov_entropy_rate(spark, sf_dir).collect()}
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    )
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    outd = defaultdict(int)
    for (a, _), c in trans.items():
        outd[a] += c
    h_e9 = defaultdict(int)
    for (a, _), c in trans.items():
        p = c / outd[a]
        # HALF-UP rounding like both engines' round()
        h_e9[a] += int(math.floor(-1e9 * p * math.log2(p) + 0.5))
    n = sum(outd.values())
    for a, ni in outd.items():
        assert got[a]["n_out"] == ni
        # query output is round(6); the literal sum is full e9 precision
        assert abs(got[a]["h_bits"] - h_e9[a] / 1e9) < 5.1e-7
    rate = sum(ni * h_e9[a] for a, ni in outd.items()) / n / 1e9
    assert got["ALL"]["n_out"] == n
    assert abs(got["ALL"]["h_bits"] - rate) < 1e-6
