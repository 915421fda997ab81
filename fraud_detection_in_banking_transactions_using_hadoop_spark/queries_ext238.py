"""Extension batch 238 (round 11): PPMI spectral embedding -- the
classic COUNT-BASED word embedding (Levy & Goldberg: PPMI matrix +
truncated SVD factorization is what SGNS implicitly factorizes),
computed end-to-end in-engine with exact arithmetic. This closes the
LLM-pipeline gap between the tier's co-occurrence statistics (PMI
collocations, ext) and its vector consumers (ANN, semantic dedup):
here the vectors themselves are DERIVED from the corpus.

Pipeline: adjacent-token (window-1) co-occurrence counts, symmetrized
(the bigram lead over positional tokens -- the codegen-friendly
shingle path, no higher-order lambdas); PPMI cell values
max(0, ln(N n_wc / (n_w n_c))) with ln evaluated ONCE per cell on an
exact rational and e9-quantized (31-type vocab => <= 961 cells, the
log_loss per-cell discipline); then the PRINCIPAL embedding direction
by 8 rounds of integer power iteration on the symmetric PPMI matrix
(Perron: nonnegative matrix + all-ones start => nonnegative vector,
no sign ambiguity), renormalized each round to max-coordinate 1e6 by
integer division -- bit-exact across engines, the r7 spectral
precedent. Rayleigh quotient emitted at e6 by exact division.

Spark builds the counts DISTRIBUTED, collects the bounded cell table
(vocab is structurally tiny; the fold ledger's bounded-state class),
folds in Python integers, re-enters via createDataFrame. Oracle:
the same 8 rounds as chained GROUP-BY matvec CTEs over the cell
table. tests/test_ext238_invariants.py pins the PPMI identities and
power-iteration convergence on planted block matrices."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import collect_nonempty
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_ROUNDS = 8
_E6 = 1_000_000

_COOC_SQL = """
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
    marg AS (SELECT w, CAST(sum(nwc) AS BIGINT) AS nw FROM sym GROUP BY w),
    tot AS (SELECT CAST(sum(nwc) AS BIGINT) AS nn FROM sym),
    ppmi AS (
      SELECT s.w, s.c,
             greatest(CAST(0 AS BIGINT),
               CAST(floor(1e9 * ln((CAST(t.nn AS DOUBLE) * s.nwc)
                                   / (CAST(mw.nw AS DOUBLE) * mc.nw)) + 0.5)
                    AS BIGINT)) AS m
      FROM sym s
      JOIN marg mw ON mw.w = s.w
      JOIN marg mc ON mc.w = s.c
      CROSS JOIN tot t),
    cells AS (SELECT w, c, m FROM ppmi WHERE m > 0),
    vocab AS (SELECT DISTINCT w FROM sym)
"""


def _matvec_sql(k: int) -> str:
    return f"""u{k} AS MATERIALIZED (
      SELECT c.w, CAST(sum(CAST(c.m AS HUGEINT) * v.x) AS HUGEINT) AS y
      FROM cells c JOIN v{k - 1} v ON v.w = c.c
      GROUP BY c.w),
    mx{k} AS MATERIALIZED (SELECT max(y) AS my FROM u{k}),
    v{k} AS MATERIALIZED (
      SELECT vo.w,
             CAST(coalesce((u.y * {_E6}) // m.my, 0) AS BIGINT) AS x
      FROM vocab vo
      LEFT JOIN u{k} u ON u.w = vo.w
      CROSS JOIN mx{k} m)"""


_PPMI_ORACLE = (
    "\n    WITH "
    + _COOC_SQL
    + f",\n    v0 AS (SELECT w, CAST({_E6} AS BIGINT) AS x FROM vocab),\n    "
    + ",\n    ".join(_matvec_sql(k) for k in range(1, _ROUNDS + 1))
    + f""",
    num AS (
      SELECT CAST(sum(CAST(c.m AS HUGEINT) * a.x * b.x) AS HUGEINT) AS q
      FROM cells c
      JOIN v{_ROUNDS} a ON a.w = c.w
      JOIN v{_ROUNDS} b ON b.w = c.c),
    den AS (
      SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS d
      FROM v{_ROUNDS})
    SELECT v.w AS token, v.x AS loading_e6,
           CAST((1000000 * n.q) // d.d AS BIGINT) AS rayleigh_e6
    FROM v{_ROUNDS} v CROSS JOIN num n CROSS JOIN den d
    WHERE v.x > 0
    ORDER BY v.x DESC, v.w
    LIMIT 8
"""
)


@register(
    "ppmi_spectral_embedding",
    _PPMI_ORACLE,
    tags=("llm", "embedding", "spectral", "exact-arith", "bounded-fold"),
)
def q_ppmi_spectral_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPMI + integer power iteration (module docstring): top-8 tokens
    on the principal count-based embedding direction, loadings at e6,
    Rayleigh quotient of the PPMI matrix."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    a = toks.alias("a")
    b = toks.select(
        F.col("doc_id").alias("bdoc"),
        F.col("pos").alias("bpos"),
        F.col("w").alias("c"),
    ).alias("b")
    big = a.join(
        b,
        (F.col("bdoc") == F.col("doc_id")) & (F.col("bpos") == F.col("pos") + 1),
    ).select("w", "c")
    sym = (
        big.select("w", "c")
        .unionAll(big.select(F.col("c").alias("w"), F.col("w").alias("c")))
        .groupBy("w", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nwc"))
    )
    marg = sym.groupBy("w").agg(F.sum("nwc").cast("bigint").alias("nw"))
    rows = collect_nonempty(
        sym.join(marg.withColumnRenamed("w", "mw"), F.col("w") == F.col("mw"))
        .drop("mw")
        .withColumnRenamed("nw", "nw_w")
        .join(
            marg.withColumnRenamed("w", "mc").withColumnRenamed("nw", "nw_c"),
            F.col("c") == F.col("mc"),
        )
        .drop("mc")
        .select("w", "c", "nwc", "nw_w", "nw_c"),
        "ppmi co-occurrence cells",
    )
    import math

    nn = sum(int(r["nwc"]) for r in rows)
    cells = {}
    vocab = set()
    for r in rows:
        vocab.add(r["w"])
        vocab.add(r["c"])
        val = math.floor(
            1e9 * math.log((nn * int(r["nwc"])) / (int(r["nw_w"]) * int(r["nw_c"])))
            + 0.5
        )
        if val > 0:
            cells[(r["w"], r["c"])] = val
    vocab = sorted(vocab)

    v = {w: _E6 for w in vocab}
    for _ in range(_ROUNDS):
        u = {w: 0 for w in vocab}
        for (w, c), m in cells.items():
            u[w] += m * v[c]
        my = max(u.values())
        v = {w: (u[w] * _E6) // my for w in vocab}

    q = sum(m * v[w] * v[c] for (w, c), m in cells.items())
    d = sum(x * x for x in v.values())
    ray = (1_000_000 * q) // d
    out = sorted(
        ((w, x) for w, x in v.items() if x > 0), key=lambda t: (-t[1], t[0])
    )[:8]
    return spark.createDataFrame(
        [(w, x, ray) for w, x in out],
        "token string, loading_e6 long, rayleigh_e6 long",
    )
