"""ext188: independent re-derivations for the local-spatial tier --
the LISA additivity law against the ext93 global Moran's I, a
brute-force numpy Ripley K, a pure-python Knox replay, join-count
conservation plus a planted checkerboard, and CSR calibration laws on
synthetic fixtures."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext93 import q_morans_i
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext188 import (
    _KNOX_CAP,
    _KNOX_DELTA2,
    _KNOX_TAU_US,
    _RADII,
    q_join_count_stats,
    q_knox_spacetime,
    q_local_morans_lisa,
    q_ripley_k_grid,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .selectExpr(
            "vec_id",
            "CAST(embedding[0] AS DOUBLE) AS px",
            "CAST(embedding[1] AS DOUBLE) AS py",
        )
        .collect()
    )
    return [(r.px, r.py) for r in rows]


def test_lisa_sums_to_global_moran(spark, sf_dir):
    """Anselin's additivity: sum_i I_i = W * I_global under this
    scaling -- the LISA decomposition must reassemble into ext93's
    global Moran's I."""
    lisa = q_local_morans_lisa(spark, sf_dir).collect()
    glob = q_morans_i(spark, sf_dir).collect()[0]
    w = sum(r.n_neighbors for r in lisa)
    total = sum(r.local_i for r in lisa)
    assert abs(total / w - glob.morans_i) < 5e-5, (total / w, glob.morans_i)
    for r in lisa:
        if r.quadrant in ("HH", "LL"):
            assert r.local_i >= 0.0
        else:
            assert r.local_i <= 0.0


def test_join_counts_conserve_and_match_python(spark, sf_dir, points):
    row = q_join_count_stats(spark, sf_dir).collect()[0]
    assert row.bb + row.bw + row.ww == row.w_ordered
    assert abs(row.e_bb + row.e_bw + row.e_ww - row.w_ordered) < 1e-3
    # full python re-derivation from the raw points
    cells: dict = {}
    for px, py in points:
        key = (math.floor(px / 0.1), math.floor(py / 0.1))
        cells[key] = cells.get(key, 0) + 1
    n, s = len(cells), sum(cells.values())
    hot = {k for k, v in cells.items() if n * v > s}
    bb = bw = w = 0
    for (cx, cy) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = (cx + dx, cy + dy)
                if nb in cells:
                    w += 1
                    a, b = (cx, cy) in hot, nb in hot
                    bb += a and b
                    bw += a != b
    assert (row.n_cells, row.n_hot) == (n, len(hot))
    assert (row.w_ordered, row.bb, row.bw) == (w, bb, bw)


def test_checkerboard_join_counts_law():
    """A perfect checkerboard has ZERO rook BB/WW joins; with queen
    adjacency the diagonals are all same-color, so BW is exactly the
    rook share (4/8 of ordered joins away from edges). The BW excess
    over the hypergeometric expectation must be positive."""
    cells = {(x, y): 1 for x in range(8) for y in range(8)}
    hot = {(x, y) for (x, y) in cells if (x + y) % 2 == 0}
    bw = w = 0
    for (cx, cy) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = (cx + dx, cy + dy)
                if nb in cells:
                    w += 1
                    bw += ((cx, cy) in hot) != (nb in hot)
    n, n1 = 64, 32
    e_bw = w * 2 * n1 * (n - n1) / (n * (n - 1))
    assert bw > e_bw  # checkerboard = maximal dispersion


def test_ripley_matches_numpy(spark, sf_dir, points):
    row = q_ripley_k_grid(spark, sf_dir).collect()[0]
    pts = np.asarray(points)
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert row.n_points == n
    prev_k = -1.0
    for r in _RADII:
        cnt = int((d2 <= r * r).sum())
        k = cnt / (n * (n - 1))
        col = f"k_{int(r * 100):03d}"
        assert getattr(row, col) == round(k, 6)
        assert getattr(row, col) >= prev_k  # K monotone in r
        prev_k = getattr(row, col)
        lcol = f"l_minus_r_{int(r * 100):03d}"
        assert getattr(row, lcol) == round(math.sqrt(k / math.pi) - r, 6)


def test_ripley_csr_calibration():
    """On a deterministic low-discrepancy uniform cloud (md5-hash
    positions), K(r) must sit near pi r^2 -- the CSR reference the
    query's l_minus_r columns are read against."""
    pts = []
    for i in range(400):
        h = hashlib.md5(str(i).encode()).hexdigest()
        pts.append(
            (int(h[:8], 16) / 2**32 - 0.5, int(h[8:16], 16) / 2**32 - 0.5)
        )
    pts = np.asarray(pts)
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    for r in (0.1, 0.2):
        k = (d2 <= r * r).sum() / (n * (n - 1))
        # border bias pulls K below pi r^2; stay within 35%
        assert abs(k - math.pi * r * r) / (math.pi * r * r) < 0.35


def test_knox_matches_python_replay(spark, sf_dir):
    row = q_knox_spacetime(spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "event_id",
            "unix_micros(ts) AS us",
            "CAST(user_id AS STRING) AS uid",
        )
        .collect()
    )
    counts: dict = {}
    for r in ev:
        counts[r.day] = counts.get(r.day, 0) + 1
    busiest = min(d for d in counts if counts[d] == max(counts.values()))
    sel = sorted(
        (r for r in ev if r.day == busiest), key=lambda r: r.event_id
    )[:_KNOX_CAP]

    def pos(uid):
        h = hashlib.md5(uid.encode()).hexdigest()
        return int(h[:8], 16) / 2**32, int(h[8:16], 16) / 2**32

    p = s = t = x = 0
    pts = [(r.us, *pos(r.uid)) for r in sel]
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            p += 1
            cs = (pts[i][1] - pts[j][1]) ** 2 + (
                pts[i][2] - pts[j][2]
            ) ** 2 <= _KNOX_DELTA2
            ct = abs(pts[i][0] - pts[j][0]) <= _KNOX_TAU_US
            s += cs
            t += ct
            x += cs and ct
    assert (row.n_pairs, row.n_close_space, row.n_close_time, row.knox_x) == (
        p,
        s,
        t,
        x,
    )
    assert row.expected_x == round(s * t / p, 6)


def test_knox_planted_cluster_law():
    """Planted space-time cluster: 30 events at one position within one
    minute among 200 diffuse events must push X far above S*T/P."""
    pts = []
    for i in range(200):
        h = hashlib.md5(f"bg{i}".encode()).hexdigest()
        pts.append(
            (
                int(h[16:32], 16) % 86_400_000_000,
                int(h[:8], 16) / 2**32,
                int(h[8:16], 16) / 2**32,
            )
        )
    pts += [(50_000_000_000 + i * 1_000_000, 0.42, 0.42) for i in range(30)]
    p = s = t = x = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            p += 1
            cs = (pts[i][1] - pts[j][1]) ** 2 + (
                pts[i][2] - pts[j][2]
            ) ** 2 <= _KNOX_DELTA2
            ct = abs(pts[i][0] - pts[j][0]) <= _KNOX_TAU_US
            s += cs
            t += ct
            x += cs and ct
    e = s * t / p
    assert x > 3 * e, (x, e)
