"""ext202: semivariogram re-derivations -- constant field gives zero
gamma, a planted linear drift gives gamma growing with lag, and the
query's per-bin pair counts partition n(n-1)/2 with the directional
split summing back to the isotropic curve."""

from __future__ import annotations

import math

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext202 import (
    _BIN_Q,
    _NBINS,
    q_semivariogram_anisotropy,
    q_semivariogram_embedding,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _py_variogram(pts):
    """(px, py, z_quantized) -> {bin: (n, sum_sqd)} with the exact
    pipeline quantization."""
    out: dict[int, list[int]] = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            ax, ay, az = pts[i]
            bx, by, bz = pts[j]
            dq = int(
                round(1e9 * math.sqrt((ax - bx) ** 2 + (ay - by) ** 2))
            )
            b = min(dq // _BIN_Q, _NBINS)
            acc = out.setdefault(b, [0, 0])
            acc[0] += 1
            acc[1] += (az - bz) ** 2
    return {b: tuple(v) for b, v in out.items()}


def test_constant_field_zero_gamma():
    pts = [(x * 0.1, y * 0.1, 123456) for x in range(5) for y in range(5)]
    vg = _py_variogram(pts)
    assert all(s == 0 for _n, s in vg.values())


def test_linear_drift_gamma_grows_with_lag():
    # z = 1e6 * px: squared differences grow with |dx|, so binned gamma
    # is nondecreasing in lag for an x-aligned transect
    pts = [(x * 0.05, 0.0, int(1e6 * x * 0.05)) for x in range(40)]
    vg = _py_variogram(pts)
    gammas = [
        vg[b][1] / (2 * vg[b][0]) for b in sorted(vg) if vg[b][0] > 0
    ]
    assert all(g2 > g1 for g1, g2 in zip(gammas, gammas[1:]))


def test_query_pair_partition_and_direction_split(spark, sf_dir):
    n = read_table(spark, sf_dir, "embeddings").count()
    iso = q_semivariogram_embedding(spark, sf_dir).toPandas()
    ani = q_semivariogram_anisotropy(spark, sf_dir).toPandas()
    assert int(iso["n_pairs"].sum()) == n * (n - 1) // 2
    assert int(ani["n_pairs"].sum()) == n * (n - 1) // 2
    # per-bin: EW + NS pair counts == isotropic pair counts
    per_bin = ani.groupby("bin")["n_pairs"].sum()
    for _, row in iso.iterrows():
        assert per_bin[row["bin"]] == row["n_pairs"]
    assert (iso["gamma"] >= 0).all()
    # directional gammas bracket the isotropic one per bin
    for b, grp in ani.groupby("bin"):
        lo, hi = grp["gamma"].min(), grp["gamma"].max()
        g = float(iso.loc[iso["bin"] == b, "gamma"].iloc[0])
        assert lo - 1e-9 <= g <= hi + 1e-9
