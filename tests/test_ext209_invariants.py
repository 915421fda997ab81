"""ext209: TA re-derivations -- Bollinger limits vs a pandas rolling
recompute, Wilder RSI vs an independent python EWMA on planted and
real series (monotone gains -> RSI 100-side; monotone losses -> 0),
MACD crossover counting on a planted sinusoid, and fold/window
identities."""

from __future__ import annotations

import duckdb
import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext209 import (
    _W,
    q_bollinger_bands_daily,
    q_macd_crossover_daily,
    q_rsi_wilder_daily,
)


def _rsi_fold(deltas, alpha=1.0 / 14.0):
    g, l = max(deltas[0], 0.0), max(-deltas[0], 0.0)
    over = under = 0
    for d in deltas[1:]:
        g += alpha * (max(d, 0.0) - g)
        l += alpha * (max(-d, 0.0) - l)
        if l > 0:
            rsi = 100.0 - 100.0 / (1.0 + g / l)
            over += rsi > 70.0
            under += rsi < 30.0
    return g, l, over, under


def test_bollinger_vs_pandas(spark, sf_dir):
    pdf = (
        q_bollinger_bands_daily(spark, sf_dir)
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
    s = daily["cents"].astype(float)
    mid = s.rolling(_W).mean()
    sd = s.rolling(_W).std(ddof=0)
    full = daily[~mid.isna()].reset_index(drop=True)
    assert len(pdf) == len(full)
    k = 37  # spot-check a row deep in the series
    assert pdf.loc[k, "day"] == full.loc[k, "day"]
    assert abs(pdf.loc[k, "mid_cents"] - mid.dropna().iloc[k]) < 1e-4
    assert abs(
        pdf.loc[k, "upper_band"]
        - (mid.dropna().iloc[k] + 2 * sd.dropna().iloc[k])
    ) < 1e-3
    # breach flags consistent with emitted bands
    assert (
        (pdf["above"] == 1)
        == (pdf["cents"] > pdf["upper_band"])
    ).all()
    # pct_b is 0 at the lower band, 1 at the upper (by construction)
    inside = pdf.dropna(subset=["pct_b"])
    assert ((inside["above"] == 1) == (inside["pct_b"] > 1.0)).all()


def test_rsi_planted_extremes_and_real(spark, sf_dir):
    # monotone gains: l decays toward 0 from a zero seed, RSI ~ 100
    g, l, over, _ = _rsi_fold([5.0] * 60)
    assert l == 0.0 and over == 0  # l stays exactly 0 -> guarded NULL
    # alternate with one loss so l > 0: RSI high but finite
    g, l, over, under = _rsi_fold([-1.0] + [5.0] * 80)
    assert l > 0
    rsi = 100 - 100 / (1 + g / l)
    assert rsi > 90 and over > 40 and under <= 2  # loss seed dips first
    # symmetric: pure losses mirror to the oversold side
    g2, l2, over2, under2 = _rsi_fold([1.0] + [-5.0] * 80)
    assert 100 - 100 / (1 + g2 / l2) < 10 and under2 > 40
    row = q_rsi_wilder_daily(spark, sf_dir).toPandas().iloc[0]
    if row["avg_loss"] > 0:
        assert abs(
            row["rsi"]
            - (100 - 100 / (1 + row["avg_gain"] / row["avg_loss"]))
        ) < 1e-3
    assert row["days_overbought"] + row["days_oversold"] <= row["n_deltas"]


def _macd_fold(ys, a12=2 / 13, a26=2 / 27, a9=2 / 10):
    e12 = e26 = ys[0]
    sig, sgn, crosses = 0.0, 0, 0
    for y in ys[1:]:
        e12 += a12 * (y - e12)
        e26 += a26 * (y - e26)
        sig += a9 * (e12 - e26 - sig)
        h = e12 - e26 - sig
        ns = 1 if h > 0 else (-1 if h < 0 else 0)
        if sgn != 0 and ns not in (0, sgn):
            crosses += 1
        if ns != 0:
            sgn = ns
    return e12, e26, sig, crosses


def test_macd_planted_sinusoid_crossovers():
    t = np.arange(400)
    ys = list(100 + 30 * np.sin(2 * np.pi * t / 50))
    e12, e26, sig, crosses = _macd_fold(ys)
    # a 50-day cycle crosses the signal line ~twice per period
    assert 10 <= crosses <= 20
    # constant series: EMAs collapse to the constant, zero crossings
    assert _macd_fold([42.0] * 100)[3] == 0


def test_macd_query_identity(spark, sf_dir):
    row = q_macd_crossover_daily(spark, sf_dir).toPandas().iloc[0]
    assert abs(row["macd"] - (row["ema12"] - row["ema26"])) < 2e-4
    assert abs(
        row["histogram"] - (row["macd"] - row["signal"])
    ) < 2e-4
    assert 0 <= row["n_signal_crossovers"] <= row["n_fit_days"]
