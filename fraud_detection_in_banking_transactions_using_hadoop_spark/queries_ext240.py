"""Extension batch 240 (round 11): Sinkhorn entropic optimal
transport -- the modern OT workhorse, next to the tier's 1-D
Wasserstein/EMD reads (closed-form on sorted marginals): Sinkhorn
computes the full TRANSPORT PLAN between two histograms under an
entropic regularizer by alternating diagonal scalings
  u = a / (K v),   v = b / (K^T u),   P = diag(u) K diag(v),
with K_ij = exp(-|i - j| / eps).

ALIGNED FLOAT FOLD discipline (the r7 Kalman / r10 power-iteration
precedent): the kernel matrix is a PYTHON-GENERATED full-precision
literal (repr of exp(-d)) shared verbatim by both engines -- no libm
call at query time -- and the 30 scaling rounds run the identical
IEEE double operations in the identical order on both sides (list
folds sum in index order; 0 + x is exact), so the final plan cells
are bit-identical doubles and the e9 quantization floor(1e9 x + 0.5)
agrees exactly. Marginals: 8 price bands of '1-URGENT' vs '5-LOW'
orders. Spark side = bounded driver fold over the 16 band counts
(calendar/domain-bounded class); oracle = recursive CTE carrying the
v LIST with nested lambdas (the r9-verified pattern).

tests/test_ext240_invariants.py pins the Sinkhorn laws: marginal
feasibility at convergence, plan positivity, cost between the
independent-coupling and sorted-coupling bounds, and eps -> 0
sharpening toward the monotone plan."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_NB = 8  # price bands
_ROUNDS = 30
_EPS = 1.0

# full-precision literal kernel, generated once and shared verbatim
_K = [[math.exp(-abs(i - j) / _EPS) for j in range(_NB)] for i in range(_NB)]
# CAST to DOUBLE[][] -- DuckDB types bare decimal literals in LIST
# literals as DECIMAL (the r9 pure-literal trap hit the carried v list
# here: the recursive UNION coerced every round's state to DECIMAL and
# quantized it), so the kernel and every seed literal are cast explicitly
_K_SQL = (
    "CAST([" + ", ".join(
        "[" + ", ".join(repr(v) for v in row) + "]" for row in _K
    ) + "] AS DOUBLE[][])"
)

_BAND_SQL = "least(7, CAST(round(o_totalprice * 100, 0) AS BIGINT) // 5000000)"

_SINKHORN_ORACLE = f"""
    WITH RECURSIVE bands AS (
      SELECT {_BAND_SQL} AS band,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                      THEN 1 ELSE 0 END) AS BIGINT) AS nb
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY 1),
    sp AS (
      SELECT i.i AS band, coalesce(b.na, 0) AS na, coalesce(b.nb, 0) AS nb
      FROM (SELECT unnest(range(0, {_NB})) AS i) i
      LEFT JOIN bands b ON b.band = i.i),
    seeds AS (
      SELECT list_transform(l.l_na, x -> CAST(x AS DOUBLE) / l.ta) AS a,
             list_transform(l.l_nb, x -> CAST(x AS DOUBLE) / l.tb) AS b,
             list_transform(range(0, {_NB}), i -> CAST(1.0 AS DOUBLE)) AS v
      FROM (SELECT list(na ORDER BY band) AS l_na,
                   list(nb ORDER BY band) AS l_nb,
                   CAST(sum(na) AS DOUBLE) AS ta,
                   CAST(sum(nb) AS DOUBLE) AS tb
            FROM sp) l),
    sink AS (
      SELECT CAST(0 AS BIGINT) AS k, a, b, v FROM seeds
      UNION ALL
      SELECT k + 1, a, b,
             list_transform(range(0, {_NB}), j ->
               CASE WHEN b[j + 1] = 0.0 THEN 0.0
                    ELSE b[j + 1] / list_aggregate(
                      list_transform(range(0, {_NB}), i ->
                        ({_K_SQL})[i + 1][j + 1] * u2[i + 1]), 'sum')
               END) AS v
      FROM (
        SELECT k, a, b,
               list_transform(range(0, {_NB}), i ->
                 CASE WHEN a[i + 1] = 0.0 THEN 0.0
                      ELSE a[i + 1] / list_aggregate(
                        list_transform(range(0, {_NB}), j ->
                          ({_K_SQL})[i + 1][j + 1] * v[j + 1]), 'sum')
                 END) AS u2
        FROM sink WHERE k < {_ROUNDS})),
    fin AS (
      SELECT a, b,
             list_transform(range(0, {_NB}), i ->
               CASE WHEN a[i + 1] = 0.0 THEN 0.0
                    ELSE a[i + 1] / list_aggregate(
                      list_transform(range(0, {_NB}), j ->
                        ({_K_SQL})[i + 1][j + 1] * v[j + 1]), 'sum')
               END) AS u,
             v
      FROM sink WHERE k = {_ROUNDS})
    SELECT i.i AS band_from, j.j AS band_to,
           CAST(floor(1e9 * (f.u[i.i + 1] * ({_K_SQL})[i.i + 1][j.j + 1]
                             * f.v[j.j + 1]) + 0.5) AS BIGINT) AS plan_e9,
           CAST(abs(i.i - j.j) AS BIGINT) AS cost
    FROM fin f,
         (SELECT unnest(range(0, {_NB})) AS i) i,
         (SELECT unnest(range(0, {_NB})) AS j) j
    WHERE f.u[i.i + 1] * ({_K_SQL})[i.i + 1][j.j + 1] * f.v[j.j + 1] > 0
"""


@register(
    "sinkhorn_ot_plan",
    _SINKHORN_ORACLE,
    tags=("optimal-transport", "aligned-fold", "bounded-fold"),
)
def q_sinkhorn_ot_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropic OT plan between urgent- and low-priority price-band
    histograms (module docstring): 30 Sinkhorn rounds as an aligned
    float fold over a Python-literal kernel; plan cells e9-quantized
    from bit-identical doubles."""
    orders = read_table(spark, sf_dir, "orders")
    bands = (
        orders.where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy(
            F.expr(_BAND_SQL.replace("//", "DIV")).alias("band")
        )
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("bigint").alias("na"),
            F.sum(
                F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)
            ).cast("bigint").alias("nb"),
        )
    )
    rows = collect_nonempty(bands, "sinkhorn band histograms")
    na = {int(r["band"]): int(r["na"]) for r in rows}
    nb = {int(r["band"]): int(r["nb"]) for r in rows}
    ta = sum(na.values())
    tb = sum(nb.values())
    a = [na.get(i, 0) / ta for i in range(_NB)]
    b = [nb.get(i, 0) / tb for i in range(_NB)]

    v = [1.0] * _NB
    for _ in range(_ROUNDS):
        u = [
            0.0 if a[i] == 0.0
            else a[i] / sum(_K[i][j] * v[j] for j in range(_NB))
            for i in range(_NB)
        ]
        v = [
            0.0 if b[j] == 0.0
            else b[j] / sum(_K[i][j] * u[i] for i in range(_NB))
            for j in range(_NB)
        ]
    u = [
        0.0 if a[i] == 0.0
        else a[i] / sum(_K[i][j] * v[j] for j in range(_NB))
        for i in range(_NB)
    ]

    out = []
    for i in range(_NB):
        for j in range(_NB):
            p = u[i] * _K[i][j] * v[j]
            if p > 0:
                out.append((i, j, math.floor(1e9 * p + 0.5), abs(i - j)))
    return spark.createDataFrame(
        out, "band_from long, band_to long, plan_e9 long, cost long"
    )
