"""Similarity search over embedding columns (array<float>).

Two tiers:
  cosine_topk        -- brute-force exact top-k (the correctness baseline;
                        broadcast the query set, scan the base once)
  lsh_cosine_topk    -- random-hyperplane LSH bucketing (the scale path:
                        prune the base to matching sign-buckets first)

All arithmetic is DOUBLE with a left-to-right fold (F.aggregate), which is
bit-reproducible across engines -- the oracle computes the same dot
products serially.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


EMB_DIM = 64  # corpus embedding dimensionality (embeddings.parquet)


def dot(x: Column, y: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns.

    Works for any length, but higher-order functions are
    CodegenFallback (interpreted, ~5x per element); prefer
    dot_unrolled when the dimension is statically known."""
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z)


def dot_unrolled_sql(x: str, y: str, dim: int = EMB_DIM) -> str:
    """SQL text of the unrolled dot product of two array<double> SQL
    fragments. Parses to the left-associative chain
    ((0.0 + x[0]*y[0]) + x[1]*y[1]) + ... which is VALUE-IDENTICAL to
    the sequential fold in dot() (including the 0.0 seed), so oracles
    written against the fold stay bit-exact."""
    terms = " + ".join(f"({x})[{i}] * ({y})[{i}]" for i in range(dim))
    return f"0.0D + {terms}"


def dot_unrolled(x: str, y: str, dim: int = EMB_DIM) -> Column:
    """Codegen'd dot product of two array<double> SQL fragments.

    Two traps this avoids: (1) higher-order functions (dot()) are
    CodegenFallback -- interpreted per element; (2) building the
    64-term chain through the Python Column API costs hundreds of
    py4j round-trips (~4 s of DRIVER time per query -- measured).
    One F.expr over generated SQL text is a single py4j call and the
    whole chain runs inside whole-stage codegen."""
    return F.expr(dot_unrolled_sql(x, y, dim))


def cosine_fold(x: Column, y: Column) -> Column:
    """Interpreted-fold cosine (any length). Right choice for SMALL
    candidate sets (LSH/IVF reranks): the unrolled SQL variant pays
    ~1 s of whole-stage-codegen compilation per query, which only
    amortizes on large pair counts."""
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def cosine(x: str, y: str, dim: int = EMB_DIM) -> Column:
    """Codegen'd cosine over statically-sized array<double> SQL
    fragments (same value as dot/sqrt composition of the folds)."""
    num = dot_unrolled_sql(x, y, dim)
    dx = dot_unrolled_sql(x, x, dim)
    dy = dot_unrolled_sql(y, y, dim)
    return F.expr(f"({num}) / (sqrt({dx}) * sqrt({dy}))")


def cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan: broadcast the (small) query set against one scan of the base --
    a map-side nested loop with no shuffle until the final per-query top-k,
    which Catalyst runs as WindowGroupLimit (no full sort). For a large
    query set, switch to lsh_cosine_topk or chunk the queries.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    sims = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine("qv", vec_col), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: component sign
    from md5 bits -- reproducible everywhere, no RNG state."""
    import hashlib

    comps: list[float] = []
    for j in range(dim):
        h = hashlib.md5(f"{plane_idx}:{j}".encode()).digest()[0]
        comps.append(1.0 if h & 1 else -1.0)
    return comps


def signature_bucket(vec: str, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit b = sign(vec . plane_b). Vectors
    with equal signatures lie in the same angular wedge. `vec` is a SQL
    fragment; each plane dot is emitted as unrolled SQL text with the
    plane coefficients inlined as double literals (repr() round-trips
    exactly), so the whole signature is ONE F.expr that runs in
    whole-stage codegen -- value-identical to the fold-based form."""
    parts = []
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        d = " + ".join(f"({vec})[{i}] * {plane[i]!r}D" for i in range(dim))
        parts.append(
            f"(CASE WHEN (0.0D + {d}) >= 0 THEN 1 ELSE 0 END) * {2 ** p}"
        )
    return F.expr(" + ".join(parts))


def ivf_train_bucket_count(n: int, n_cells: int, train_sample_per_cell: int) -> int | None:
    """Deterministic md5-bucket sampling parameter shared by the Spark
    fit and the DuckDB oracle generator: None => train on everything,
    else keep ids whose md5-bucket (first 8 hex chars mod n_buckets)
    is 0."""
    target = train_sample_per_cell * n_cells
    if n <= target:
        return None
    return max(2, n // target)


def fit_ivf_quantizer(
    X: np.ndarray, n_cells: int, seed: int = 42, max_iter: int = 10
) -> np.ndarray:
    """Driver-side Lloyd on the bounded training sample (FAISS split).
    Deterministic: seeded init, fixed iteration count, standard
    empty-cell reseed on the worst-served point. Shared verbatim by
    ivf_cosine_topk and the ann_ivf_topk oracle-SQL generator so both
    engines inline IDENTICAL centroid literals."""
    k_eff = min(n_cells, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k_eff, replace=False)]
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        newC = np.empty_like(C)
        for j in range(k_eff):
            members = X[a == j]
            newC[j] = members.mean(0) if len(members) else X[d2.min(1).argmax()]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    return C


def ivf_train_centroids(
    base: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    train_sample_per_cell: int = 256,
) -> np.ndarray:
    """The quantizer-fit half of ivf_cosine_topk, reusable on its own
    (the incremental-index path trains once on a snapshot and FREEZES
    the centroids): deterministic md5-bucket sample of the base,
    driver-side seeded Lloyd. Bounded work regardless of base size."""
    X = ivf_train_matrix(base, id_col, vec_col, n_cells, train_sample_per_cell)
    return fit_ivf_quantizer(X, n_cells, seed, max_iter)


def ivf_train_matrix(
    base: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_cells: int = 16,
    train_sample_per_cell: int = 256,
) -> np.ndarray:
    """The bounded deterministic training matrix behind every quantizer
    fit (coarse IVF AND PQ codebooks): md5-bucket sample of the base,
    collected once, sorted by id for a stable row order. Factored out
    (r13) so IVF-PQ fits its coarse quantizer and its m codebooks from
    ONE collection instead of re-sampling per fit."""
    base_v = base.select(id_col, vec_col)
    n = base_v.count()
    n_buckets = ivf_train_bucket_count(n, n_cells, train_sample_per_cell)
    train = base_v
    if n_buckets is not None:
        bucket = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % n_buckets
        )
        train = base_v.filter(bucket == 0)
    pdf = train.sort(id_col).toPandas()
    return np.array(pdf[vec_col].to_list(), dtype=np.float64)


def _assign_np(X: np.ndarray, cm: np.ndarray) -> np.ndarray:
    """Coarse-cell argmin shared by every assignment path (batch,
    incremental, fused IVF-PQ indexing): squared distance accumulated
    SEQUENTIALLY over the dim axis (0 + z1 + z2 + ...), the exact
    left-to-right chain the DuckDB oracle's generated SQL evaluates --
    bit-identical d2 both engines; ties resolve to the lowest cell id
    via strict <."""
    best = np.full(len(X), np.inf)
    idx = np.zeros(len(X), dtype=np.int32)
    for j in range(len(cm)):
        d = np.zeros(len(X))
        for t in range(X.shape[1]):
            diff = X[:, t] - cm[j, t]
            d += diff * diff
        upd = d < best
        best[upd] = d[upd]
        idx[upd] = j
    return idx


def _encode_np(X: np.ndarray, CB: list[np.ndarray]) -> np.ndarray:
    """Per-subspace PQ code argmin shared by pq_encode and the fused
    IVF-PQ indexing pass: same sequential accumulation and strict-<
    tie rule as _assign_np, applied independently per subspace."""
    m = len(CB)
    dsub = CB[0].shape[1]
    out = np.zeros((len(X), m), dtype=np.int32)
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        cb = CB[s]
        best = np.full(len(X), np.inf)
        idx = np.zeros(len(X), dtype=np.int32)
        for c in range(len(cb)):
            dvec = np.zeros(len(X))
            for t in range(dsub):
                diff = Xs[:, t] - cb[c, t]
                dvec += diff * diff
            upd = dvec < best
            best[upd] = dvec[upd]
            idx[upd] = c
        out[:, s] = idx
    return out


def ivf_assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "v",
    out_col: str = "_cell",
) -> DataFrame:
    """One vectorized Arrow assignment pass against a FROZEN centroid
    list: each batch accumulates squared distance SEQUENTIALLY over the
    dim axis (0 + z1 + z2 + ...), the exact left-to-right chain the
    DuckDB oracle's generated SQL evaluates -- bit-identical d2 both
    engines, argmin ties resolved to the lowest cell id via strict <.
    This is the delta-only step of the incremental index update: cost
    is |df| rows, never the full corpus."""
    from pyspark.sql.functions import pandas_udf

    C_list = [list(map(float, c)) for c in centroids]

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        cm = np.asarray(C_list, dtype=np.float64)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(_assign_np(X, cm))

    # r14 (guide 4.4): downstream equi-joins on the assignment column
    # push an isnotnull filter below this projection, and the optimizer
    # then evaluates the UDF TWICE (ArrowEvalPython under the filter +
    # again in the projection -- both visible in the r14 before-plan).
    # The function is pure, but marking it non-deterministic fences the
    # optimizer from duplicating or reordering it: one Arrow pass per
    # row, identical values.
    return df.withColumn(out_col, _assign.asNondeterministic()(F.col(vec_col)))


def fit_pq_codebooks(
    X: np.ndarray, m: int = 8, ks: int = 16, seed: int = 42, max_iter: int = 10
) -> list[np.ndarray]:
    """Product-quantization codebooks: split the dim axis into m equal
    subspaces and run the SAME deterministic driver-side Lloyd
    (fit_ivf_quantizer) independently per subspace -- m codebooks of
    ks centroids x (dim/m) dims. Shared verbatim by ivfpq_adc_topk and
    the ann_ivfpq_topk oracle-SQL generator so both engines inline
    IDENTICAL codebook literals. Training cost is bounded by the
    sample (a few thousand rows) regardless of base size -- the FAISS
    IVF-PQ split: train once on one node, encode distributed."""
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        fit_ivf_quantizer(X[:, s * dsub : (s + 1) * dsub], ks, seed, max_iter)
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[np.ndarray],
    vec_col: str = "v",
    out_col: str = "_codes",
) -> DataFrame:
    """One vectorized Arrow pass encoding each vector to its m PQ codes
    (per-subspace argmin against the FROZEN codebooks). Distances
    accumulate SEQUENTIALLY over the subspace's dim axis
    (0 + z1 + z2 + ...), the exact left-to-right chain the DuckDB
    oracle's generated SQL evaluates -- bit-identical d2 both engines;
    argmin ties resolve to the LOWEST code via strict < (== the
    oracle's row_number ORDER BY d2, code). After this pass the index
    stores only (id, cell, m codes) -- m bytes-ish per vector instead
    of dim floats, the reason IVF-PQ is what a 100 TB ANN index
    actually ships."""
    from pyspark.sql.functions import pandas_udf

    CB = [np.asarray(c, dtype=np.float64) for c in codebooks]

    @pandas_udf("array<int>")
    def _enc(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(_encode_np(X, CB).tolist())

    return df.withColumn(out_col, _enc(F.col(vec_col)))


def ivfpq_adc_topk(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    ks: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    train_sample_per_cell: int = 256,
) -> DataFrame:
    """IVF-PQ approximate top-k with asymmetric-distance (ADC) ranking
    -- the operator a 100 TB ANN index actually ships (FAISS IVFPQ):

      train   coarse quantizer (n_cells) + m PQ codebooks (ks each) on
              ONE bounded md5-hash sample, driver-side numpy;
      index   one Arrow pass assigns each base vector a cell and m PQ
              codes, then DROPS the raw vector -- the index is
              (id, cell, codes), ~m bytes/vector;
      search  each query probes its n_probe nearest cells and ranks
              candidates by ADC: sum over subspaces of the exact
              distance from the query SUB-vector to the candidate's
              RECONSTRUCTED sub-vector (codebook centroid). No
              candidate vector is ever read at query time.

    Cross-engine discipline: each per-subspace d2 is the left-to-right
    dim chain (bit-identical to the oracle's generated SQL), quantized
    to an e9 integer per TERM before the cross-subspace sum, so the
    total is order-free exact integer arithmetic (the r10 float-sum
    rule). Output adc_e9 = sum_s floor(d2_s * 1e9 + 0.5)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    base_v = base.select(id_col, vec_col)
    X = ivf_train_matrix(base_v, id_col, vec_col, n_cells, train_sample_per_cell)
    C = fit_ivf_quantizer(X, n_cells, seed, max_iter)
    CB = fit_pq_codebooks(X, m=m, ks=ks, seed=seed, max_iter=max_iter)
    dsub = X.shape[1] // m

    # r14 (guide 4.1/4.5, verdict item 8): the indexing pass previously
    # stacked TWO Arrow stages over the same rows (assign, then encode),
    # shipping the 64-dim vector across the Python boundary twice. One
    # fused struct-returning pass halves the boundary crossings; the
    # numpy math is the SAME shared helpers the standalone operators
    # call (_assign_np / _encode_np), so cells and codes are
    # bit-identical. Non-deterministic mark = the guide-4.4 fence
    # against the downstream join duplicating the stage.
    from pyspark.sql.functions import pandas_udf as _pudf

    C_np = np.asarray(C, dtype=np.float64)

    @_pudf("_cell int, _codes array<int>")
    def _index(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame({"_cell": [], "_codes": []})
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "_cell": _assign_np(X, C_np),
                "_codes": _encode_np(X, CB).tolist(),
            }
        )

    index = base_v.withColumn(
        "_ix", _index.asNondeterministic()(F.col(vec_col))
    ).select(id_col, F.col("_ix._cell").alias("_cell"), F.col("_ix._codes").alias("_codes"))

    centroids = [(i, [float(x) for x in C[i]]) for i in range(len(C))]
    cent_df = queries.sparkSession.createDataFrame(
        centroids, ["_cell", "_centroid"]
    ).select("_cell", F.col("_centroid").cast("array<double>").alias("_centroid"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("_centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d2").asc(), F.col("_cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_d2", dist2)
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "_cell")
    )

    @pandas_udf("long")
    def _adc(qvs: pd.Series, codess: pd.Series) -> pd.Series:
        if len(qvs) == 0:
            return pd.Series([], dtype="int64")
        Q = np.stack(qvs.to_numpy()).astype(np.float64)
        Cd = np.stack(codess.to_numpy()).astype(np.int64)
        total = np.zeros(len(Q), dtype=np.int64)
        for s in range(m):
            cb = CB[s]
            sel = cb[Cd[:, s]]
            acc = np.zeros(len(Q))
            for t in range(dsub):
                diff = Q[:, s * dsub + t] - sel[:, t]
                acc += diff * diff
            total += np.floor(acc * 1e9 + 0.5).astype(np.int64)
        return pd.Series(total)

    cands = index.join(F.broadcast(probes), "_cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    sims = cands.withColumn("adc_e9", _adc(F.col("qv"), F.col("_codes")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_e9").asc(), F.col(id_col).asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "adc_e9", "rk"
        )
    )


def ivf_cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    max_iter: int = 10,
    rows_per_train_partition: int = 50_000,
    init_mode: str = "random",
    train_sample_per_cell: int = 256,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the base
    into n_cells Voronoi cells, then search each query only in its n_probe
    nearest cells.

    Scale: the coarse quantizer is tiny (n_cells centroids broadcast);
    cell assignment is one map-side pass; the search join touches
    |base| * n_probe / n_cells of the pairs a brute-force scan would.
    Recall rises with n_probe (== n_cells gives exact results).

    The quantizer fit is iterative (several jobs over the training set),
    so training partitioning is sized to the data: a small base scattered
    over many partitions pays per-iteration task-scheduling overhead for
    no parallelism (measured 4x slowdown at 2k vectors x 32 partitions).
    A coarse quantizer also doesn't need convergence -- max_iter=10
    default vs MLlib's 20 -- nor k-means|| seeding: initMode='random'
    skips the ~5 extra whole-data passes of parallel init (FAISS trains
    its IVF quantizers the same way, on random init over a subsample);
    The quantizer never trains on the full base: a deterministic
    md5-hash sample of ~train_sample_per_cell * n_cells vectors (the
    FAISS sizing rule) is collected once and Lloyd runs DRIVER-SIDE in
    numpy. At coarse k the training input is bounded (a few thousand
    rows x dim doubles) no matter how large the base grows, so
    distributing the fit buys nothing and costs a full scheduled job
    PER ITERATION (measured: ~2 s of pure stage-scheduling overhead for
    10 iterations on 2k vectors -- the FAISS split: train on one node,
    assign distributed). Only the single assignment pass -- a vectorized
    Arrow-batched pandas UDF carrying the centroid matrix -- scans the
    base. Hash sampling (not .sample()) keeps the centroids, and
    therefore the query results, identical across partitionings.

    `init_mode` / `rows_per_train_partition` are retained for API
    stability but unused by the numpy fit (seeded random init is the
    quantizer-grade choice; see FAISS).
    """
    base_v = base.select(id_col, vec_col)
    # ---- deterministic md5-bucket sample + driver-side Lloyd, then one
    # vectorized Arrow assignment pass (both shared with the
    # incremental-index path; parity notes on the helpers)
    C = ivf_train_centroids(
        base_v,
        id_col,
        vec_col,
        n_cells=n_cells,
        seed=seed,
        max_iter=max_iter,
        train_sample_per_cell=train_sample_per_cell,
    )
    assigned = ivf_assign_cells(base_v, C.tolist(), vec_col)

    # Rank each query's cells by centroid distance; probe the top n_probe.
    centroids = [(i, [float(x) for x in C[i]]) for i in range(len(C))]
    cent_df = queries.sparkSession.createDataFrame(centroids, ["_cell", "_centroid"]).select(
        "_cell", F.col("_centroid").cast("array<double>").alias("_centroid")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    from pyspark.sql import Window

    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("_centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d2").asc(), F.col("_cell").asc())
    probes = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_d2", dist2)
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "_cell")
    )

    sims = (
        assigned.join(F.broadcast(probes), "_cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_fold(F.col("qv"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def lsh_cosine_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: compare only vectors whose hyperplane signature
    matches the query's. Recall < 1.0 by construction (documented); at
    scale this turns the O(|base| * |queries|) scan into per-bucket work.
    The bucket join shuffles on the (small-int) bucket id; heavily skewed
    buckets split under AQE.
    """
    bb = base.withColumn("bucket", signature_bucket(vec_col, dim, n_planes))
    qq = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    ).withColumn("bucket", signature_bucket("qv", dim, n_planes))
    sims = (
        bb.join(F.broadcast(qq), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_fold(F.col("qv"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def pca_fit(
    base: DataFrame,
    vec_col: str = "v",
    dim: int = 64,
    k: int = 8,
):
    """Distributed-moment PCA: the 100 TB-shaped split of the classic
    algorithm. The cluster computes only the d-vector of means and the
    d(d+1)/2 second-moment sums -- one map-side expansion per vector
    (sequence x sequence explode of the carried array, no self-join) and
    one aggregate onto d(d+1)/2 groups, map-side combined. The dxd Gram
    matrix is then assembled and eigensolved DRIVER-SIDE in numpy
    (d=64 -> a 4k-entry matrix; the eigensolve is microseconds and has
    no distributed formulation worth its scheduling cost -- the same
    train-small/apply-everywhere split as ivf_cosine_topk).

    Returns (mean, components): numpy arrays of shape (dim,) and
    (k, dim), components sorted by descending eigenvalue with a
    deterministic sign convention (largest-|coefficient| entry positive;
    numpy eigenvector signs are otherwise arbitrary).
    """
    v = F.col(vec_col)
    moments = (
        base.select(v.alias("_v"))
        .select("_v", F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("i"))
        .select(
            "_v", "i", F.explode(F.sequence(F.col("i"), F.lit(dim))).alias("j")
        )
        .select(
            "i",
            "j",
            F.try_element_at("_v", F.col("i")).alias("xi"),
            F.try_element_at("_v", F.col("j")).alias("xj"),
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xi") * F.col("xj")).alias("sxy"),
            F.sum("xi").alias("sx"),
            F.sum("xj").alias("sy"),
            F.count("*").alias("n"),
        )
    ).toPandas()

    n = int(moments["n"].iloc[0])
    mean = np.zeros(dim)
    cov = np.zeros((dim, dim))
    for row in moments.itertuples():
        i, j = row.i - 1, row.j - 1
        if i == j:
            mean[i] = row.sx / n
    for row in moments.itertuples():
        i, j = row.i - 1, row.j - 1
        c = row.sxy / n - (row.sx / n) * (row.sy / n)
        cov[i, j] = cov[j, i] = c
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    # deterministic sign: flip so each component's largest-|x| entry > 0
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return mean, comps


def pca_project(
    base: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Project vectors onto fitted components: one vectorized
    Arrow-batched map pass carrying the (k x dim) matrix -- no shuffle,
    no driver involvement beyond shipping ~k*dim floats per executor."""
    from pyspark.sql.functions import pandas_udf

    mean_l = [float(x) for x in mean]
    comp_l = [[float(x) for x in row] for row in components]

    @pandas_udf("array<double>")
    def _proj(vecs: pd.Series) -> pd.Series:
        mu = np.asarray(mean_l)
        W = np.asarray(comp_l)
        out = [
            list(map(float, W @ (np.asarray(v, dtype=np.float64) - mu)))
            for v in vecs
        ]
        return pd.Series(out)

    return base.select(id_col, _proj(F.col(vec_col)).alias("pca"))
