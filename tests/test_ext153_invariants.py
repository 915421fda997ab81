"""ext153: literal re-derivations -- a numpy matrix profile (all
z-normalized window pairs), the energy statistic from raw pair loops,
and the PIT histogram via math.erf; plus a planted-motif fixture
proving the z-normalized distance finds shape, not level."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext153 import (
    _ENERGY_CAP,
    _EXCL,
    _M,
    q_embedding_energy_2sample,
    q_matrix_profile_motifs,
    q_pit_histogram_calibration,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _znd(a, b):
    m = len(a)
    dot = float(np.dot(a, b))
    corr = (m * dot - a.sum() * b.sum()) / (
        math.sqrt(m * (a * a).sum() - a.sum() ** 2)
        * math.sqrt(m * (b * b).sum() - b.sum() ** 2)
    )
    return math.sqrt(max(2 * m * (1 - min(1.0, corr)), 0.0))


@pytest.fixture(scope="module")
def dollars(spark, sf_dir):
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg({"o_totalprice": "sum"})
        .collect()
    )
    per = {r[0]: round(r[1] * 100) // 100 for r in daily}
    return np.array([float(per[d]) for d in sorted(per)])


def test_matrix_profile_matches_numpy(spark, sf_dir, dollars):
    row = q_matrix_profile_motifs(spark, sf_dir).collect()[0]
    xs = dollars
    nwin = len(xs) - _M + 1
    wins = [xs[t : t + _M] for t in range(nwin)]
    best = (None, None, float("inf"))
    nn = [float("inf")] * nwin
    for i in range(nwin):
        for j in range(i + _EXCL + 1, nwin):
            d = _znd(wins[i], wins[j])
            if d < best[2]:
                best = (i + 1, j + 1, d)  # 1-based rn
            nn[i] = min(nn[i], d)
            nn[j] = min(nn[j], d)
    disc = max(range(nwin), key=lambda i: (nn[i], -i))
    assert (row["motif_start_day_a"], row["motif_start_day_b"]) == best[:2]
    assert row["motif_znorm_dist"] == pytest.approx(best[2], abs=1e-5)
    assert row["discord_start_day"] == disc + 1
    assert row["discord_znorm_dist"] == pytest.approx(nn[disc], abs=1e-5)


def test_znorm_distance_is_shape_not_level():
    # the same shape at 10x the level and +offset has distance ~0;
    # a reversed shape is far
    a = np.array([1.0, 3, 2, 5, 4, 6, 5])
    assert _znd(a, 10 * a + 100) == pytest.approx(0.0, abs=1e-9)
    assert _znd(a, a[::-1].copy()) > 2.0


def test_energy_2sample_matches_loop(spark, sf_dir):
    row = q_embedding_energy_2sample(spark, sf_dir).collect()[0]
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .where(f"vec_id < {_ENERGY_CAP}")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    vecs = [np.array([float(v) for v in r["embedding"]]) for r in rows]
    grps = [r["label"] % 2 for r in rows]
    sxy = sxx = syy = 0.0
    nxy = nxx = nyy = 0
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            d = float(np.linalg.norm(vecs[i] - vecs[j]))
            if grps[i] != grps[j]:
                sxy += d
                nxy += 1
            elif grps[i] == 0:
                sxx += d
                nxx += 1
            else:
                syy += d
                nyy += 1
    e = 2 * sxy / nxy - sxx / nxx - syy / nyy
    assert (row["n_cross_pairs"], row["n_within_0"], row["n_within_1"]) == (
        nxy,
        nxx,
        nyy,
    )
    assert row["energy_statistic"] == pytest.approx(e, abs=1e-5)


def test_pit_histogram_matches_erf(spark, sf_dir, dollars):
    got = {r["pit_decile"]: r for r in q_pit_histogram_calibration(spark, sf_dir).collect()}
    xs = dollars
    n = len(xs)
    mu = xs.sum() / n
    s = math.sqrt(((xs - mu) ** 2).sum() / (n - 1))
    bins = Counter(
        min(9, max(0, int(10 * 0.5 * (1 + math.erf((v - mu) / s / math.sqrt(2))))))
        for v in xs
    )
    assert set(got) == set(range(10))
    for b in range(10):
        r = got[b]
        assert r["n_days"] == bins.get(b, 0)
        assert r["share"] == pytest.approx(bins.get(b, 0) / n, abs=1e-6)
        assert r["chi2_term_x_n"] == pytest.approx(
            (10 * bins.get(b, 0) - n) ** 2 / (10 * n * n), abs=1e-6
        )
    assert sum(r["n_days"] for r in got.values()) == n
