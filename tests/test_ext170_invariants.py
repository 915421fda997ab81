"""ext170: literal re-derivations -- Laney p' vs a day-loop on the
same quantization (plus the law sigma_z ~ 1 recovers the classic
chart: Laney and classic violations coincide when sigma_z == 1),
Crow-AMSAA vs the MLE loop (plus the planted laws: uniform arrival
times -> beta ~ 1, front-loaded times t_i = T (i/n)^2 -> beta ~ 0.5),
and Phillips-Perron vs a numpy replay (plus the planted unit-root
law: a random walk keeps Z_tau near 0 while a strongly mean-reverting
AR(1) sends it far negative)."""

from __future__ import annotations

import math

import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext170 import (
    _D2,
    _L_PP,
    q_crow_amsaa_growth,
    q_laney_pchart,
    q_phillips_perron,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import (
    convert_event_ts,
    read_table,
)
from pyspark.sql import functions as F


def test_laney_matches_loop(spark, sf_dir):
    row = q_laney_pchart(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "events")
        .select(
            convert_event_ts(F.col("ts")).cast("date").alias("d"),
            "event_type",
        )
        .collect()
    )
    per = {}
    for r in rows:
        n, k = per.get(r["d"], (0, 0))
        per[r["d"]] = (n + 1, k + (1 if r["event_type"] == "error" else 0))
    days = sorted(per)
    nn = sum(n for n, _ in per.values())
    kk = sum(k for _, k in per.values())
    pbar = kk / nn
    zs = [
        (per[d][1] / per[d][0] - pbar)
        / math.sqrt(pbar * (1 - pbar) / per[d][0])
        for d in days
    ]
    mrs = [
        math.floor(abs(zs[i] - zs[i - 1]) * 1e9 + 0.5)
        for i in range(1, len(zs))
    ]
    sigz = sum(mrs) / 1e9 / len(mrs) / _D2
    viol_classic = sum(1 for z in zs if abs(z) > 3)
    viol_laney = sum(1 for z in zs if abs(z) > 3 * sigz)
    assert row["n_days"] == len(days)
    assert row["p_bar"] == pytest.approx(pbar, abs=1e-6)
    assert row["sigma_z"] == pytest.approx(sigz, abs=1e-4)
    assert row["violations_classic_p"] == viol_classic
    assert row["violations_laney_p"] == viol_laney
    assert row["overdispersed"] == (sigz > 1.0)


def test_laney_reduces_to_classic_when_sigz_one():
    zs = [1.0, -2.0, 3.5, 0.2, -3.2]
    viol3 = sum(1 for z in zs if abs(z) > 3)
    assert viol3 == sum(1 for z in zs if abs(z) > 3 * 1.0)


def _amsaa_beta(ts_rel, span):
    n = len(ts_rel)
    sl = sum(
        math.floor(math.log(span / t) * 1e9 + 0.5) for t in ts_rel
    )
    return n / (sl / 1e9)


def test_crow_amsaa_matches_loop(spark, sf_dir):
    row = q_crow_amsaa_growth(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "events")
        .where("event_type = 'error'")
        .select(F.unix_micros(convert_event_ts(F.col("ts"))).alias("us"))
        .collect()
    )
    us = sorted(r["us"] for r in rows)
    t0 = us[0]
    span = us[-1] - t0 + 1
    rel = [u - t0 + 1 for u in us]
    beta = _amsaa_beta(rel, span)
    n = len(us)
    span_days = span / 86400e6
    assert row["n_failures"] == n
    assert row["span_days"] == pytest.approx(span_days, abs=0.01)
    assert row["beta"] == pytest.approx(beta, abs=1e-5)
    assert row["lambda_per_day_scale"] == pytest.approx(
        n / span_days**beta, rel=1e-3
    )
    assert row["instantaneous_mtbf_hours"] == pytest.approx(
        span_days / (n * beta) * 24, abs=0.01
    )
    # a homogeneous stream should sit near beta = 1
    assert 0.8 < row["beta"] < 1.2


def test_crow_amsaa_planted_laws():
    n, span = 500, 1_000_000
    uniform = [span * (i + 0.5) / n for i in range(n)]
    assert _amsaa_beta(uniform, span) == pytest.approx(1.0, abs=0.05)
    early = [span * ((i + 0.5) / n) ** 2 for i in range(n)]
    assert _amsaa_beta(early, span) == pytest.approx(0.5, abs=0.03)


def _pp_ztau(vs):
    n_all = len(vs)
    dy = [vs[t] - vs[t - 1] for t in range(1, n_all)]
    yl = vs[:-1]
    n = len(dy)
    sy, syy = sum(yl), sum(v * v for v in yl)
    sd = sum(dy)
    sdy = sum(d * y for d, y in zip(dy, yl))
    rho = (n * sdy - sy * sd) / (n * syy - sy * sy)
    alpha = (sd - rho * sy) / n
    cyy = (n * syy - sy * sy) / n
    u = [
        math.floor((d - alpha - rho * y) * 1e3 + 0.5)
        for d, y in zip(dy, yl)
    ]
    g = {
        j: sum(u[t] * u[t - j] for t in range(j, n))
        for j in range(0, _L_PP + 1)
    }
    g0 = g[0] / 1e6 / n
    lam2 = (
        g[0] + 2.0 * sum((_L_PP + 1 - j) * g[j] for j in range(1, _L_PP + 1))
        / (_L_PP + 1)
    ) / 1e6 / n
    se = math.sqrt(g0 / cyy)  # cyy is already sum (y - ybar)^2
    tau = rho / se
    z = math.sqrt(g0 / lam2) * tau - (lam2 - g0) / (
        2 * math.sqrt(lam2)
    ) * (n * se / math.sqrt(g0))
    return rho, tau, z


def test_pp_matches_loop(spark, sf_dir):
    row = q_phillips_perron(spark, sf_dir).collect()[0]
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) // 100 for r in daily}
    vs = [per[d] for d in sorted(per)]
    rho, tau, z = _pp_ztau(vs)
    assert row["n_obs"] == len(vs) - 1
    assert row["rho_hat"] == pytest.approx(rho, abs=1e-6)
    assert row["tau_df"] == pytest.approx(tau, abs=1e-3)
    assert row["z_tau_pp"] == pytest.approx(z, abs=1e-3)
    assert row["reject_unit_root_5pct"] == (round(z, 4) < -2.86)
    # iid-ish daily revenue is strongly mean reverting
    assert row["z_tau_pp"] < -10


def test_pp_planted_unit_root_law():
    # deterministic pseudo-noise, demeaned so the walk has NO drift
    # (a drifting walk is a different null than the constant-only DF
    # regression tests)
    noise, x = [], 48271
    for _ in range(1500):
        x = (16807 * x) % 2147483647
        noise.append((x / 2147483647.0 - 0.5) * 1000)
    mbar = sum(noise) / len(noise)
    noise = [e - mbar for e in noise]
    walk = [0.0]
    for e in noise:
        walk.append(walk[-1] + e)
    ar, prev = [0.0], 0.0
    for e in noise:
        prev = 0.2 * prev + e
        ar.append(prev)
    _, _, z_walk = _pp_ztau([int(v) for v in walk])
    _, _, z_ar = _pp_ztau([int(v) for v in ar])
    assert z_walk > -2.86  # cannot reject unit root for a true walk
    assert z_ar < -15  # strongly rejects for stationary AR(1)
