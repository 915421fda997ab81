"""Definition-level invariants for ext229 (Markowitz closed form,
consistent-hash ring)."""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext229 import (
    _RING_SHARDS,
    _RING_VNODES,
)

_Q = {q.name: q.fn for q in registry()}


# ---------------------------------------------------------------------------
# Markowitz
# ---------------------------------------------------------------------------
def _two_asset_series(sf_dir: str):
    rows = duckdb.sql(
        f"""
        WITH nrev AS (
          SELECT c.c_nationkey AS nation,
                 sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS cents
          FROM '{sf_dir}/orders.parquet' o
          JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
          GROUP BY 1),
        top2 AS (SELECT nation,
                        row_number() OVER (ORDER BY cents DESC, nation) rk
                 FROM nrev QUALIFY rk <= 2)
        SELECT rk, nation FROM top2 ORDER BY rk
        """
    ).fetchall()
    na, nb = rows[0][1], rows[1][1]
    day_rows = duckdb.sql(
        f"""
        WITH days AS (SELECT DISTINCT o_orderdate d
                      FROM '{sf_dir}/orders.parquet'),
        dn AS (
          SELECT o.o_orderdate d, c.c_nationkey nation,
                 CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) // 100 AS y
          FROM '{sf_dir}/orders.parquet' o
          JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2)
        SELECT dy.d,
               coalesce(max(CASE WHEN dn.nation = {na} THEN dn.y END), 0),
               coalesce(max(CASE WHEN dn.nation = {nb} THEN dn.y END), 0)
        FROM days dy LEFT JOIN dn ON dn.d = dy.d GROUP BY dy.d
        """
    ).fetchall()
    ya = [int(r[1]) for r in day_rows]
    yb = [int(r[2]) for r in day_rows]
    return na, nb, ya, yb


def test_markowitz_matches_fraction_rederivation(spark, sf_dir):
    na, nb, ya, yb = _two_asset_series(sf_dir)
    n = len(ya)
    sa, sb = sum(ya), sum(yb)
    saa = sum(v * v for v in ya)
    sbb = sum(v * v for v in yb)
    sab = sum(a * b for a, b in zip(ya, yb))
    caa = n * saa - sa * sa
    cbb = n * sbb - sb * sb
    cab = n * sab - sa * sb
    den = caa + cbb - 2 * cab
    w_ppm = (
        500000
        if den == 0
        else int(Fraction((cbb - cab) * 10**6, den))
    )
    row = _Q["markowitz_two_asset"](spark, sf_dir).collect()[0]
    assert (row["nation_a"], row["nation_b"]) == (na, nb)
    assert row["n_days"] == n
    assert row["w_a_ppm"] == w_ppm
    varp = (
        w_ppm * w_ppm * caa
        + (10**6 - w_ppm) ** 2 * cbb
        + 2 * w_ppm * (10**6 - w_ppm) * cab
    )
    assert row["varp_n2"] == varp // 10**12
    assert row["var_vs_best_single_ppm"] == varp // min(caa, cbb) // 10**6
    # minimum-variance optimality: the blend never beats... exceeds the
    # safer single asset (w* is the unconstrained minimizer; ppm
    # quantization can cost at most a hair)
    assert varp // 10**12 <= min(caa, cbb) + 1
    # parabola law: w* beats nearby weights
    for dw in (-10000, 10000):
        w2 = w_ppm + dw
        v2 = (
            w2 * w2 * caa
            + (10**6 - w2) ** 2 * cbb
            + 2 * w2 * (10**6 - w2) * cab
        )
        assert varp <= v2


# ---------------------------------------------------------------------------
# Consistent-hash ring
# ---------------------------------------------------------------------------
def _pos(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _assign(keys, n_shards):
    ring = sorted(
        (_pos(f"shard-{s}-v-{v}"), s)
        for s in range(n_shards)
        for v in range(_RING_VNODES)
    )
    poss = [p for p, _ in ring]
    out = {}
    import bisect

    for k in keys:
        kp = _pos(str(k))
        i = bisect.bisect_left(poss, kp)
        cands = [s for p, s in ring if p == (poss[i] if i < len(poss) else poss[0])]
        out[k] = min(cands)
    return out


def test_ring_matches_hashlib_replica(spark, sf_dir):
    keys = [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    ]
    a16 = _assign(keys, _RING_SHARDS)
    a17 = _assign(keys, _RING_SHARDS + 1)
    from collections import Counter

    dist = Counter(a16.values())
    moved = sum(1 for k in keys if a16[k] != a17[k])
    rows = {
        r["shard"]: r
        for r in _Q["consistent_hash_ring"](spark, sf_dir).collect()
    }
    assert set(rows) == set(dist)
    total = len(keys)
    for s, n in dist.items():
        assert rows[s]["n_keys"] == n
        assert rows[s]["share_ppm"] == n * 10**6 // total
        assert rows[s]["moved_ppm"] == moved * 10**6 // total
    # consistency guarantee: movement near 1/17, far from the ~16/17
    # a modulo scheme would cause
    exp = 10**6 // (_RING_SHARDS + 1)
    assert 0 < moved * 10**6 // total < 4 * exp
