"""Extension batch 248 (round 11): NMF -- nonnegative matrix
factorization of the word co-occurrence matrix by Lee-Seung
multiplicative updates, completing the in-engine decomposition family
(distributed-moment PCA, the r11 PPMI power iteration, and now a
PARTS-BASED 2-factor model: NMF's nonnegativity makes the factors
interpretable as additive word 'topics').

ALIGNED FLOAT FOLD discipline (sinkhorn/kalman class): the 31x31
symmetrized co-occurrence counts are exact integers cast to double
identically on both sides; the factor matrices start from a
DETERMINISTIC literal formula W0[i][k] = 1 + ((7i + 3k) mod 5)/4 (no
rand()); each of the 12 rounds applies the textbook updates
  H <- H * (W'V) / (W'W H + eps),  W <- W * (V H') / (W H H' + eps)
with every inner product summed in the same index order on both
sides, so the final factors are bit-identical doubles and the e9
quantization agrees exactly. Emitted: per-factor top-6 token loadings
plus the relative Frobenius reconstruction error in exact ppm of
sum V^2 (quantized from identical doubles).

tests/test_ext248_invariants.py pins the Lee-Seung monotonicity
(reconstruction error never increases across updates) and recovery of
a planted 2-block matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_R = 2
_ROUNDS = 12
_EPS = 1e-9


def nmf_fold(V, n, rounds=_ROUNDS, r=_R, eps=_EPS):
    """Lee-Seung multiplicative updates on dense lists (row-major V,
    n x n); deterministic literal init; returns (W, H)."""
    W = [[1.0 + ((7 * i + 3 * k) % 5) / 4.0 for k in range(r)] for i in range(n)]
    H = [[1.0 + ((7 * k + 3 * j) % 5) / 4.0 for j in range(n)] for k in range(r)]
    for _ in range(rounds):
        # H <- H * (W'V) / (W'W H + eps)
        WtV = [
            [sum(W[i][k] * V[i][j] for i in range(n)) for j in range(n)]
            for k in range(r)
        ]
        WtW = [
            [sum(W[i][k] * W[i][l] for i in range(n)) for l in range(r)]
            for k in range(r)
        ]
        WtWH = [
            [sum(WtW[k][l] * H[l][j] for l in range(r)) for j in range(n)]
            for k in range(r)
        ]
        H = [
            [H[k][j] * WtV[k][j] / (WtWH[k][j] + eps) for j in range(n)]
            for k in range(r)
        ]
        # W <- W * (V H') / (W H H' + eps)
        VHt = [
            [sum(V[i][j] * H[k][j] for j in range(n)) for k in range(r)]
            for i in range(n)
        ]
        HHt = [
            [sum(H[k][j] * H[l][j] for j in range(n)) for l in range(r)]
            for k in range(r)
        ]
        WHHt = [
            [sum(W[i][l] * HHt[l][k] for l in range(r)) for k in range(r)]
            for i in range(n)
        ]
        W = [
            [W[i][k] * VHt[i][k] / (WHHt[i][k] + eps) for k in range(r)]
            for i in range(n)
        ]
    return W, H


def nmf_resid(V, W, H, n, r=_R):
    num = 0.0
    den = 0.0
    for i in range(n):
        for j in range(n):
            wh = sum(W[i][k] * H[k][j] for k in range(r))
            d = V[i][j] - wh
            num += d * d
            den += V[i][j] * V[i][j]
    return num, den


_COOC = """
    toks AS (
      SELECT doc_id, i.i AS pos, ts[i.i] AS w
      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) d,
           LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) i),
    big AS (
      SELECT a.w AS w, b.w AS c
      FROM toks a JOIN toks b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
    sym AS (
      SELECT w, c, CAST(count(*) AS BIGINT) AS nwc FROM (
        SELECT w, c FROM big UNION ALL SELECT c, w FROM big) x
      GROUP BY w, c),
    vocab AS MATERIALIZED (
      SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS idx
      FROM (SELECT DISTINCT w FROM sym)),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vocab),
    vm AS MATERIALIZED (
      -- row-major 31x31 count matrix as list of row lists
      SELECT list(row ORDER BY i) AS v, max(n) AS n FROM (
        SELECT vi.idx AS i, x.n,
               list(coalesce(s.nwc, 0) ORDER BY vj.idx) AS row
        FROM vocab vi
        CROSS JOIN nn x
        CROSS JOIN vocab vj
        LEFT JOIN sym s ON s.w = vi.w AND s.c = vj.w
        GROUP BY vi.idx, x.n) rows_)
"""


def _winit(expr_i: str, expr_k: str) -> str:
    return f"1.0 + CAST(((7 * ({expr_i}) + 3 * ({expr_k})) % 5) AS DOUBLE) / 4.0"


# one Lee-Seung round as SQL over list-of-list state (0-based lambda
# indices via range; lists are 1-based-indexed)
def _round_sql() -> str:
    wtv = (
        "list_transform(range(0, 2), k -> list_transform(range(0, CAST(n AS INTEGER)), j ->"
        " list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), i ->"
        " w0[i + 1][k + 1] * v[i + 1][j + 1]), 'sum')))"
    )
    wtw = (
        "list_transform(range(0, 2), k -> list_transform(range(0, 2), l ->"
        " list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), i ->"
        " w0[i + 1][k + 1] * w0[i + 1][l + 1]), 'sum')))"
    )
    h1 = (
        "list_transform(range(0, 2), k -> list_transform(range(0, CAST(n AS INTEGER)), j ->"
        " h0[k + 1][j + 1] * wtv[k + 1][j + 1]"
        " / (list_aggregate(list_transform(range(0, 2), l ->"
        " wtw[k + 1][l + 1] * h0[l + 1][j + 1]), 'sum') + 1e-9)))"
    )
    vht = (
        "list_transform(range(0, CAST(n AS INTEGER)), i -> list_transform(range(0, 2), k ->"
        " list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), j ->"
        " v[i + 1][j + 1] * h1[k + 1][j + 1]), 'sum')))"
    )
    hht = (
        "list_transform(range(0, 2), k -> list_transform(range(0, 2), l ->"
        " list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), j ->"
        " h1[k + 1][j + 1] * h1[l + 1][j + 1]), 'sum')))"
    )
    w1 = (
        "list_transform(range(0, CAST(n AS INTEGER)), i -> list_transform(range(0, 2), k ->"
        " w0[i + 1][k + 1] * vht[i + 1][k + 1]"
        " / (list_aggregate(list_transform(range(0, 2), l ->"
        " w0[i + 1][l + 1] * hht[l + 1][k + 1]), 'sum') + 1e-9)))"
    )
    return f"""
        SELECT k + 1 AS k, n, v, {w1} AS w0, h1 AS h0
        FROM (
          SELECT k, n, v, w0, h1, {vht} AS vht, {hht} AS hht
          FROM (
            SELECT k, n, v, w0, h0, {h1} AS h1
            FROM (
              SELECT f.k, f.n, f.v, f.w0, f.h0,
                     {wtv} AS wtv, {wtw} AS wtw
              FROM fold f WHERE f.k < {_ROUNDS})))"""


_NMF_ORACLE = f"""
    WITH RECURSIVE {_COOC},
    fold AS (
      SELECT CAST(0 AS BIGINT) AS k, n, v,
             list_transform(range(0, CAST(n AS INTEGER)), i ->
               list_transform(range(0, 2), kk ->
                 {_winit('i', 'kk')})) AS w0,
             list_transform(range(0, 2), kk ->
               list_transform(range(0, CAST(n AS INTEGER)), j ->
                 {_winit('kk', 'j')})) AS h0
      FROM vm
      UNION ALL
      {_round_sql()}),
    fin AS (SELECT n, v, w0, h0 FROM fold WHERE k = {_ROUNDS}),
    resid AS (
      SELECT CAST(floor(1e6 * num / den + 0.5) AS BIGINT) AS rel_err_ppm
      FROM (
        SELECT
          list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), i ->
            list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), j ->
              (v[i + 1][j + 1] - (w0[i + 1][1] * h0[1][j + 1]
                                  + w0[i + 1][2] * h0[2][j + 1]))
              * (v[i + 1][j + 1] - (w0[i + 1][1] * h0[1][j + 1]
                                    + w0[i + 1][2] * h0[2][j + 1]))),
              'sum')), 'sum') AS num,
          list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), i ->
            list_aggregate(list_transform(range(0, CAST(n AS INTEGER)), j ->
              CAST(v[i + 1][j + 1] AS DOUBLE) * v[i + 1][j + 1]), 'sum')),
            'sum') AS den
        FROM fin)),
    loads AS (
      SELECT kk.k AS factor, vo.w AS token,
             CAST(floor(1e9 * f.w0[CAST(vo.idx AS INTEGER)][CAST(kk.k AS INTEGER)]
                  + 0.5) AS BIGINT) AS loading_e9,
             row_number() OVER (PARTITION BY kk.k
               ORDER BY f.w0[CAST(vo.idx AS INTEGER)][CAST(kk.k AS INTEGER)]
                 DESC, vo.w) AS rn
      FROM fin f
      CROSS JOIN (SELECT unnest(range(1, 3)) AS k) kk
      CROSS JOIN vocab vo)
    SELECT l.factor, l.token, l.loading_e9, r.rel_err_ppm
    FROM loads l CROSS JOIN resid r
    WHERE l.rn <= 6
"""


@register(
    "nmf_topics",
    _NMF_ORACLE,
    tags=("llm", "decomposition", "aligned-fold", "bounded-fold"),
)
def q_nmf_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-2 NMF of the word co-occurrence matrix (module docstring):
    12 Lee-Seung rounds as an aligned float fold; per-factor top-6
    token loadings at e9 + relative Frobenius error in ppm."""
    import math

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    b = toks.select(
        F.col("doc_id").alias("bdoc"),
        F.col("pos").alias("bpos"),
        F.col("w").alias("c"),
    )
    big = toks.join(
        b,
        (F.col("bdoc") == F.col("doc_id")) & (F.col("bpos") == F.col("pos") + 1),
    ).select("w", "c")
    sym = (
        big.select("w", "c")
        .unionAll(big.select(F.col("c").alias("w"), F.col("w").alias("c")))
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nwc"))
    )
    rows = collect_nonempty(sym, "nmf co-occurrence counts")
    vocab = sorted({r["w"] for r in rows} | {r["c"] for r in rows})
    idx = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    V = [[0.0] * n for _ in range(n)]
    for r in rows:
        V[idx[r["w"]]][idx[r["c"]]] = float(int(r["nwc"]))

    W, H = nmf_fold(V, n)
    num, den = nmf_resid(V, W, H, n)
    rel = math.floor(1e6 * num / den + 0.5)

    out = []
    for k in range(_R):
        ranked = sorted(
            ((W[i][k], vocab[i]) for i in range(n)),
            key=lambda t: (-t[0], t[1]),
        )[:6]
        for wv, tok in ranked:
            out.append((k + 1, tok, math.floor(1e9 * wv + 0.5), rel))
    return spark.createDataFrame(
        out, "factor long, token string, loading_e9 long, rel_err_ppm long"
    )
