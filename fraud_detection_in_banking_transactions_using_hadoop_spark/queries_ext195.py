"""Extension batch 195 (round 7): spectral graph bipartition -- the
Fiedler vector of the nation payment graph by INTEGER-QUANTIZED power
iteration, hash-exact by construction.

Graph: 25 nations; edge weight A[a][b] = number of order lines whose
customer nation is a and supplier nation is b, symmetrized, diagonal
dropped. The Fiedler vector (eigenvector of the unnormalized Laplacian
L = D - A with the smallest nonzero eigenvalue) is found by power
iteration on the SHIFTED matrix M = cI - L with c = 2*max-degree
(Gershgorin: all eigenvalues of M positive, largest = c - lambda_2
on the space orthogonal to the constant vector), deflating the
constant eigenvector by exact mean-projection every round.

The cross-engine trick: every round is PURE INTEGER -- matvec
u = M v (integer edge weights x e6-quantized integer vector, exact in
HUGEINT/DECIMAL), mean projection w = 25u - sum(u) (exact), rescale
v' = (w * 1e6) DIV max|w| (truncation toward zero, identical in both
engines) -- so after 24 fixed rounds both engines hold the SAME
integer vector and the partition, cut and conductance are exact. The
same quantized-fixed-point discipline as the GLM/Schulze loops, now
driving an eigenproblem.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_ROUNDS = 24
_N = 25


def _spectral_sql() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, _ROUNDS + 1):
        rounds.append(f"""
    u{r} AS MATERIALIZED (
      SELECT m.i, CAST(sum(CAST(m.w AS HUGEINT) * v.q) AS HUGEINT) AS u
      FROM mmat m JOIN {prev} v ON v.i = m.j GROUP BY m.i),
    w{r} AS MATERIALIZED (
      SELECT i, {_N} * u - sum(u) OVER () AS w FROM u{r}),
    v{r} AS MATERIALIZED (
      SELECT i, CAST(w * 1000000 // max(abs(w)) OVER () AS BIGINT) AS q
      FROM w{r})""")
        prev = f"v{r}"
    return f"""
    WITH pay AS (
      SELECT c.c_nationkey AS na, s.s_nationkey AS nb,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    adj AS (
      SELECT na AS i, nb AS j, CAST(sum(cnt) AS BIGINT) AS a
      FROM (
        SELECT na, nb, cnt FROM pay
        UNION ALL
        SELECT nb AS na, na AS nb, cnt FROM pay) x
      WHERE na <> nb
      GROUP BY 1, 2),
    deg AS (
      SELECT i, CAST(sum(a) AS BIGINT) AS d FROM adj GROUP BY i),
    cc AS (SELECT 2 * CAST(max(d) AS BIGINT) AS c FROM deg),
    mmat AS (
      SELECT i, j, a AS w FROM adj
      UNION ALL
      SELECT d.i, d.i AS j, cc.c - d.d AS w FROM deg d CROSS JOIN cc),
    v0 AS MATERIALIZED (
      SELECT i,
             CAST(1000000 - 2000000
                  * (('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 1))::BIGINT
                     % 2) AS BIGINT) AS q
      FROM deg),
    {",".join(rounds)},
    flip AS (
      SELECT CASE WHEN (SELECT q FROM v{_ROUNDS}
                        ORDER BY abs(q) DESC, i LIMIT 1) >= 0
                  THEN 1 ELSE -1 END AS f),
    sides AS (
      SELECT v.i, v.q * fl.f AS fq,
             CASE WHEN v.q * fl.f > 0 THEN 1 ELSE 0 END AS side
      FROM v{_ROUNDS} v CROSS JOIN flip fl),
    cut AS (
      SELECT CAST(sum(CASE WHEN sa.side <> sb.side THEN a ELSE 0 END)
                  AS BIGINT) // 2 AS cut_w,
             CAST(sum(a) AS BIGINT) // 2 AS tot_w
      FROM adj
      JOIN sides sa ON sa.i = adj.i
      JOIN sides sb ON sb.i = adj.j),
    vols AS (
      SELECT CAST(sum(CASE WHEN s.side = 1 THEN d.d ELSE 0 END) AS BIGINT)
               AS vol1,
             CAST(sum(CASE WHEN s.side = 0 THEN d.d ELSE 0 END) AS BIGINT)
               AS vol0
      FROM deg d JOIN sides s ON s.i = d.i)
    SELECT s.i AS nationkey, s.side, CAST(s.fq AS BIGINT) AS fiedler_q,
           c.cut_w AS cut_weight,
           round(CAST(c.cut_w AS DOUBLE)
                 / least(v.vol1, v.vol0), 6) AS conductance
    FROM sides s CROSS JOIN cut c CROSS JOIN vols v
    """


@register(
    "spectral_bipartition_nations",
    _spectral_sql(),
    tags=("graph", "spectral", "iterative", "exact-arith"),
)
def q_spectral_bipartition_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spectral bipartition of the 25-nation payment graph: 24 rounds
    of integer-quantized power iteration on M = 2*dmax*I - L (constant
    eigenvector deflated by exact mean projection each round) converge
    to the Fiedler sign structure; every round is exact integer
    arithmetic (matvec, 25u - sum(u), rescale by DIV max|w|), so both
    engines hold the identical vector after every round. Emits the
    per-nation side and quantized Fiedler component (canonically
    flipped: the largest-|q| component positive), the cut weight, and
    the conductance cut/min(vol).

    Scale split (r8, IVF-quantizer precedent similarity.py:238): the
    data-dependent work -- the 4-way lineitem/orders/customer/supplier
    join that weighs the edges -- runs distributed; the eigenproblem
    state is a BOUNDED <=25x25 integer matrix, so it is collected once
    and the 24 exact-integer rounds run in Python (arbitrary-precision
    ints == HUGEINT/DECIMAL semantics; DIV truncates toward zero in
    both engines, emulated explicitly). The final vector re-enters the
    plan as a literal CASE over nationkey, keeping cut/volume sums
    distributed over the edge list. This removes 24x3 fixed-overhead
    Spark jobs (~12s at sf0.01 -> <2s) without touching the oracle."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    pay = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("na"), F.col("s_nationkey").alias("nb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    sym = pay.select("na", "nb", "cnt").unionAll(
        pay.select(
            F.col("nb").alias("na"), F.col("na").alias("nb"), "cnt"
        )
    )
    adj = (
        sym.where(F.col("na") != F.col("nb"))
        .groupBy(F.col("na").alias("i"), F.col("nb").alias("j"))
        .agg(F.sum("cnt").cast("bigint").alias("a"))
        .localCheckpoint(eager=True)
    )
    # Bounded collect (<=25*24 integer edges): the eigenproblem state
    # is O(1); iterate driver-side exactly as the SQL oracle does.
    edges = {
        (r["i"], r["j"]): r["a"]
        for r in collect_nonempty(adj, "spectral_bipartition nation edges")
    }
    deg_py: dict[int, int] = {}
    for (ei, _ej), aw in edges.items():
        deg_py[ei] = deg_py.get(ei, 0) + aw
    c_shift = 2 * max(deg_py.values())
    mat = dict(edges)
    for ni, dv in deg_py.items():
        mat[(ni, ni)] = c_shift - dv
    nodes = sorted(deg_py)

    def _tdiv(numer: int, denom: int) -> int:
        # truncate toward zero, matching Spark DIV / DuckDB // (r7 note)
        if numer < 0:
            return -((-numer) // denom)
        return numer // denom

    vq = {
        ni: 1000000
        - 2000000
        * (int(hashlib.md5(str(ni).encode()).hexdigest()[0], 16) % 2)
        for ni in nodes
    }
    for _ in range(_ROUNDS):
        u = {ni: 0 for ni in nodes}
        for (ei, ej), mw in mat.items():
            u[ei] += mw * vq[ej]
        su = sum(u.values())
        w = {ni: _N * u[ni] - su for ni in nodes}
        mxw = max(abs(x) for x in w.values())
        vq = {ni: _tdiv(w[ni] * 1000000, mxw) for ni in nodes}
    flip_i = min(nodes, key=lambda ni: (-abs(vq[ni]), ni))
    f = 1 if vq[flip_i] >= 0 else -1
    fq = {ni: vq[ni] * f for ni in nodes}
    side = {ni: 1 if fq[ni] > 0 else 0 for ni in nodes}
    fq_case = " ".join(f"WHEN {ni} THEN {fq[ni]}L" for ni in nodes)
    side_case = " ".join(f"WHEN {ni} THEN {side[ni]}" for ni in nodes)
    deg = adj.groupBy("i").agg(F.sum("a").cast("bigint").alias("d"))
    sides = deg.select(
        "i",
        F.expr(f"CASE i {fq_case} END").alias("fq"),
        F.expr(f"CASE i {side_case} END").alias("side"),
    )
    cut = (
        adj.join(sides.select(F.col("i"), F.col("side").alias("sa")), "i")
        .join(
            sides.select(F.col("i").alias("j"), F.col("side").alias("sb")),
            "j",
        )
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN sa <> sb THEN a ELSE 0 END) AS BIGINT)"
                " DIV 2"
            ).alias("cut_w"),
        )
    )
    vols = (
        deg.join(sides, "i")
        .agg(
            F.sum(F.when(F.col("side") == 1, F.col("d")).otherwise(0))
            .cast("bigint")
            .alias("vol1"),
            F.sum(F.when(F.col("side") == 0, F.col("d")).otherwise(0))
            .cast("bigint")
            .alias("vol0"),
        )
    )
    return (
        sides.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(vols))
        .select(
            F.col("i").alias("nationkey"),
            "side",
            F.col("fq").cast("bigint").alias("fiedler_q"),
            F.col("cut_w").alias("cut_weight"),
            F.round(
                F.col("cut_w").cast("double")
                / F.least("vol1", "vol0"),
                6,
            ).alias("conductance"),
        )
    )
