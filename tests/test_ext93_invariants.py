"""Definition-level checks for ext93: literal numpy lattice
re-derivations of Moran's I, Geary's C, and Getis-Ord G*."""

from __future__ import annotations

import numpy as np

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext93 import (
    q_gearys_c,
    q_getis_ord_hotspots,
    q_morans_i,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _lattice(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").select("embedding").toPandas()
    pts = np.stack(emb.embedding.to_numpy())[:, :2].astype("float64")
    cx = np.floor(pts[:, 0] / 0.1).astype("int64")
    cy = np.floor(pts[:, 1] / 0.1).astype("int64")
    cells = {}
    for a, b in zip(cx, cy):
        cells[(a, b)] = cells.get((a, b), 0) + 1
    adj = []
    for (a, b), xi in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = cells.get((a + dx, b + dy))
                if nb is not None:
                    adj.append((a, b, xi, nb))
    return cells, adj


def test_morans_i_definition(spark, sf_dir):
    row = q_morans_i(spark, sf_dir).collect()[0]
    cells, adj = _lattice(spark, sf_dir)
    x = np.array(list(cells.values()), dtype="float64")
    n, w = len(x), len(adj)
    z = {k: v - x.mean() for k, v in cells.items()}
    szz = sum(
        z[(a, b)] * z[(a + dx, b + dy)]
        for (a, b), xi in cells.items()
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if not (dx == dy == 0) and (a + dx, b + dy) in cells
    )
    i_stat = n / w * szz / ((x - x.mean()) ** 2).sum()
    assert row["n_cells"] == n and row["n_adjacencies"] == w
    assert abs(row["morans_i"] - i_stat) < 1e-4
    assert abs(row["expected_i"] - (-1 / (n - 1))) < 1e-6
    assert -1.5 <= row["morans_i"] <= 1.5


def test_gearys_c_definition(spark, sf_dir):
    row = q_gearys_c(spark, sf_dir).collect()[0]
    cells, adj = _lattice(spark, sf_dir)
    x = np.array(list(cells.values()), dtype="float64")
    n, w = len(x), len(adj)
    sdd = sum((xi - xj) ** 2 for _, _, xi, xj in adj)
    c_stat = (n - 1) / (2 * w) * sdd / ((x - x.mean()) ** 2).sum()
    assert row["n_cells"] == n and row["n_adjacencies"] == w
    assert abs(row["gearys_c"] - c_stat) < 1e-4
    assert row["gearys_c"] > 0


def test_getis_ord_definition(spark, sf_dir):
    rows = q_getis_ord_hotspots(spark, sf_dir).collect()
    cells, adj = _lattice(spark, sf_dir)
    x = np.array(list(cells.values()), dtype="float64")
    n = len(x)
    s_tot = x.sum()
    sd = x.std(ddof=0)
    scored = []
    for (a, b), xi in cells.items():
        li, wi = xi, 1
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = cells.get((a + dx, b + dy))
                if nb is not None:
                    li += nb
                    wi += 1
        num = li - x.mean() * wi
        den = sd * np.sqrt((n * wi - wi * wi) / (n - 1))
        scored.append((a, b, li, wi, num / den))
    scored.sort(key=lambda t: (-t[4], t[0], t[1]))
    assert len(rows) == 5
    for r, (a, b, li, wi, g) in zip(rows, scored[:5]):
        assert (r["cx"], r["cy"]) == (a, b)
        assert r["local_sum"] == li
        assert r["n_neighbors"] == wi
        assert abs(r["gstar_z"] - g) < 1e-3
    _ = s_tot
