"""Extension batch 264 (round 13): the two natural completions of the
IVF-PQ story (ext261).

- ann_ivfpq_refine: the PRODUCTION search pattern (FAISS's refine
  stage): ADC over codes produces a cheap shortlist of R=20 candidates
  per query -- no raw vector touched -- then ONLY those R vectors are
  read back for an exact cosine rerank to top-5. At 100 TB the index
  scan stays codes-only (m bytes/vector) and the expensive float reads
  are R per query, not |cell|. Measured on this corpus the refine
  recovers the n_probe ceiling recall (~0.48 vs pure-ADC ~0.26),
  which tests/test_ext264_invariants.py asserts.

- pq_reconstruction_error: the quantization-quality dashboard behind
  the recall numbers: per PQ subspace, the total squared
  reconstruction error of the PQ codebook assignment vs the SQ8
  scalar-quantization midpoint reconstruction over the same dims.
  Every per-(vector, subspace) term is quantized to an e9 integer
  (floor(d2*1e9+0.5) of bit-identical doubles -- the winning encode
  distance IS min(d2) over codes, order-free) before the data-sized
  sum, so the cross-engine totals are exact integer arithmetic (the
  r10 float-sum rule).

Oracle discipline: both queries extend ext261's generated SQL --
centroid/codebook literals refit deterministically per sf_dir, chain
arithmetic left-to-right, cosine rerank via the proven
list_dot_product/round(6) parity of ann_ivf_topk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_ext261 import (
    _PQ_DIM,
    _PQ_PARAMS,
    _fit_for_sf,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_REFINE_R = 20  # ADC shortlist size fed to the exact rerank
_REFINE_K = 5


def _pq_common_sql(C, CB) -> str:
    """The shared CTE prefix: coarse assignment, PQ encode, probes --
    verbatim the ext261 construction."""
    m, ks, dsub = _PQ_PARAMS["m"], _PQ_PARAMS["ks"], _PQ_PARAMS["dsub"]
    cent_vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in C[i])}]::DOUBLE[])"
        for i in range(len(C))
    )
    cb_vals = ", ".join(
        f"({s}, {c}, [{', '.join(repr(float(x)) for x in CB[s][c])}]::DOUBLE[])"
        for s in range(m)
        for c in range(ks)
    )

    def chain64(a: str, b: str) -> str:
        return "0.0 + " + " + ".join(
            f"({a}[{t}]-{b}[{t}])*({a}[{t}]-{b}[{t}])"
            for t in range(1, _PQ_DIM + 1)
        )

    def chain_sub(vec: str, soff: str, c: str) -> str:
        return "0.0 + " + " + ".join(
            f"({vec}[{soff}*{dsub}+{t}]-{c}[{t}])"
            f"*({vec}[{soff}*{dsub}+{t}]-{c}[{t}])"
            for t in range(1, dsub + 1)
        )

    return f"""
    cents AS (SELECT * FROM (VALUES {cent_vals}) AS t(cell, c)),
    cb AS MATERIALIZED (SELECT * FROM (VALUES {cb_vals}) AS t(s, code, c)),
    base AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ad AS (
      SELECT vec_id, v, cell, {chain64('v', 'c')} AS d2
      FROM base CROSS JOIN cents),
    asg AS (
      SELECT vec_id, v, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS ar
      FROM ad),
    cells AS MATERIALIZED (SELECT vec_id, cell FROM asg WHERE ar = 1),
    encd AS (
      SELECT b.vec_id, cb.s, cb.code,
             {chain_sub('b.v', 'cb.s', 'cb.c')} AS d2
      FROM base b CROSS JOIN cb),
    qd AS (
      SELECT b.vec_id AS query_id, b.v AS qv, cell, {chain64('b.v', 'c')} AS d2
      FROM base b CROSS JOIN cents WHERE b.vec_id < 10),
    qprobe AS (
      SELECT query_id, qv, cell,
             row_number() OVER (PARTITION BY query_id ORDER BY d2, cell) AS pr
      FROM qd),
    probes AS (SELECT query_id, qv, cell FROM qprobe
               WHERE pr <= {_PQ_PARAMS["n_probe"]})
    """


def _refine_sql(sf_dir: str) -> str:
    C, CB = _fit_for_sf(sf_dir)
    m, dsub = _PQ_PARAMS["m"], _PQ_PARAMS["dsub"]

    def chain_sub(vec: str, soff: str, c: str) -> str:
        return "0.0 + " + " + ".join(
            f"({vec}[{soff}*{dsub}+{t}]-{c}[{t}])"
            f"*({vec}[{soff}*{dsub}+{t}]-{c}[{t}])"
            for t in range(1, dsub + 1)
        )

    return f"""
    WITH {_pq_common_sql(C, CB)},
    encr AS (
      SELECT vec_id, s, code,
             row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS r
      FROM encd),
    codes AS MATERIALIZED (SELECT vec_id, s, code FROM encr WHERE r = 1),
    cand AS (
      SELECT p.query_id, p.qv, b.vec_id AS neighbor_id
      FROM cells b JOIN probes p USING (cell)
      WHERE b.vec_id <> p.query_id),
    terms AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(floor(({chain_sub('cand.qv', 'cb.s', 'cb.c')}) * 1e9
                        + 0.5) AS BIGINT) AS t_e9
      FROM cand
      JOIN codes ON codes.vec_id = cand.neighbor_id
      JOIN cb ON cb.s = codes.s AND cb.code = codes.code),
    adc AS (
      SELECT query_id, neighbor_id, CAST(sum(t_e9) AS BIGINT) AS adc_e9
      FROM terms GROUP BY query_id, neighbor_id),
    shortlist AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY adc_e9, neighbor_id) AS ark
            FROM adc)
      WHERE ark <= {_REFINE_R}),
    rerank AS (
      SELECT s.query_id, s.neighbor_id,
             round(list_dot_product(qb.v, nb.v) /
                   (sqrt(list_dot_product(qb.v, qb.v))
                    * sqrt(list_dot_product(nb.v, nb.v))), 6) AS cosine
      FROM shortlist s
      JOIN base qb ON qb.vec_id = s.query_id
      JOIN base nb ON nb.vec_id = s.neighbor_id),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
             AS INTEGER) AS rk
      FROM rerank)
    SELECT query_id, neighbor_id, cosine, rk
    FROM ranked WHERE rk <= {_REFINE_K}
    """


@register(
    "ann_ivfpq_refine",
    _refine_sql,
    tags=("similarity", "ann", "ivf", "pq", "scale-path"),
)
def q_ann_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + refine (module docstring): ADC shortlist of R=20 from
    codes alone, then exact cosine rerank reading ONLY those 20
    vectors per query. Recovers the probe-ceiling recall at the cost
    of R float reads per query -- the FAISS production pattern."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        cosine_fold,
        ivfpq_adc_topk,
    )

    vecs = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = vecs.filter(F.col("vec_id") < 10)
    shortlist = ivfpq_adc_topk(
        vecs,
        queries,
        k=_REFINE_R,
        n_cells=_PQ_PARAMS["n_cells"],
        n_probe=_PQ_PARAMS["n_probe"],
        m=_PQ_PARAMS["m"],
        ks=_PQ_PARAMS["ks"],
    ).select("query_id", "neighbor_id")
    qv = vecs.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    nv = vecs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    )
    rerank = (
        shortlist.join(F.broadcast(qv.filter(F.col("query_id") < 10)), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_fold(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _REFINE_K)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _recon_sql(sf_dir: str) -> str:
    C, CB = _fit_for_sf(sf_dir)
    m, dsub = _PQ_PARAMS["m"], _PQ_PARAMS["dsub"]
    return f"""
    WITH {_pq_common_sql(C, CB)},
    pqse AS (
      SELECT vec_id, s, min(d2) AS best_d2
      FROM encd GROUP BY vec_id, s),
    pqagg AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(CAST(floor(best_d2 * 1e9 + 0.5) AS BIGINT))
                  AS BIGINT) AS pq_se_e9
      FROM pqse GROUP BY s),
    x AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT unnest(range(1, {_PQ_DIM + 1})) AS i) idx),
    stats AS (
      SELECT pos, min(val) AS mn, max(val) AS mx FROM x GROUP BY pos),
    sq AS (
      SELECT vec_id, (x.pos - 1) // {dsub} AS s,
             CASE WHEN mx = mn THEN 0.0
                  ELSE val - (mn + (least(255, greatest(0,
                    CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT)))
                    + 0.5) * (mx - mn) / 255.0)
             END AS err
      FROM x JOIN stats ON stats.pos = x.pos),
    sqagg AS (
      SELECT s, CAST(sum(CAST(floor(err * err * 1e9 + 0.5) AS BIGINT))
                     AS BIGINT) AS sq8_se_e9
      FROM sq GROUP BY s)
    SELECT p.s AS subspace, p.n_vecs, p.pq_se_e9, q.sq8_se_e9,
           round(CAST(p.pq_se_e9 AS DOUBLE)
                 / nullif(CAST(q.sq8_se_e9 AS DOUBLE), 0.0), 6)
             AS pq_over_sq8
    FROM pqagg p JOIN sqagg q ON q.s = p.s
    """


@register(
    "pq_reconstruction_error",
    _recon_sql,
    tags=("similarity", "quantization", "pq", "exact-arith"),
)
def q_pq_reconstruction_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ reconstruction error vs the SQ8 midpoint
    reconstruction (module docstring): the compression-quality
    dashboard behind the recall numbers. The PQ term per (vector,
    subspace) is the winning encode distance (min over codes of the
    bit-identical d2 chain); both term families are e9-floored to
    integers before the data-sized sums."""
    from pyspark.sql.functions import pandas_udf

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.similarity import (
        fit_ivf_quantizer,
        fit_pq_codebooks,
        ivf_train_matrix,
    )

    m, ks, dsub = _PQ_PARAMS["m"], _PQ_PARAMS["ks"], _PQ_PARAMS["dsub"]
    vecs = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    X = ivf_train_matrix(vecs, "vec_id", "v", _PQ_PARAMS["n_cells"], 256)
    _ = fit_ivf_quantizer  # coarse quantizer not needed here
    CB = [
        np.asarray(c, dtype=np.float64)
        for c in fit_pq_codebooks(X, m=m, ks=ks)
    ]

    @pandas_udf("array<long>")
    def _pq_se(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        Xb = np.stack(vs.to_numpy()).astype(np.float64)
        out = np.zeros((len(Xb), m), dtype=np.int64)
        for s in range(m):
            Xs = Xb[:, s * dsub : (s + 1) * dsub]
            cb = CB[s]
            best = np.full(len(Xb), np.inf)
            for c in range(len(cb)):
                dvec = np.zeros(len(Xb))
                for t in range(dsub):
                    diff = Xs[:, t] - cb[c, t]
                    dvec += diff * diff
                np.minimum(best, dvec, out=best)
            out[:, s] = np.floor(best * 1e9 + 0.5).astype(np.int64)
        return pd.Series(out.tolist())

    pq = (
        vecs.withColumn("se", _pq_se(F.col("v")))
        .select(F.posexplode("se").alias("s", "se_e9"))
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("se_e9").cast("bigint").alias("pq_se_e9"),
        )
    )

    x = (
        vecs.select("vec_id", F.posexplode("v").alias("pos0", "val"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    )
    stats = x.groupBy("pos").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    code = F.least(
        F.lit(255).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor(
                (F.col("val") - F.col("mn"))
                * 255.0
                / (F.col("mx") - F.col("mn"))
            ),
        ),
    )
    err = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.col("val")
        - (
            F.col("mn")
            + (code + 0.5) * (F.col("mx") - F.col("mn")) / 255.0
        )
    )
    sq = (
        x.join(F.broadcast(stats), "pos")
        .select(
            ((F.col("pos") - 1) / dsub).cast("bigint").alias("s"),
            F.floor(err * err * 1e9 + 0.5).cast("bigint").alias("se_e9"),
        )
        .groupBy("s")
        .agg(F.sum("se_e9").cast("bigint").alias("sq8_se_e9"))
    )
    return (
        pq.join(sq, "s")
        .select(
            F.col("s").cast("bigint").alias("subspace"),
            "n_vecs",
            "pq_se_e9",
            "sq8_se_e9",
            F.round(
                F.col("pq_se_e9").cast("double")
                / F.nullif(F.col("sq8_se_e9").cast("double"), F.lit(0.0)),
                6,
            ).alias("pq_over_sq8"),
        )
    )
