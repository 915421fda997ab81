"""Extension batch 254 (round 12): singular spectrum analysis and the
unsupervised Fellegi-Sunter EM fit.

- ssa_trend_cycle: SSA (window L=7) of the monthly revenue series --
  the model-free trend extractor that complements Henderson (fixed
  cubic-annihilating taps) with DATA-DERIVED taps: the lag-covariance
  matrix C (7x7, EXACT integer kilodollar products, every entry
  < 2^53 so the double path is exact), 20 power-iteration rounds for
  the top eigenvector u, and the rank-1 reconstruction with diagonal
  averaging, which for interior months collapses to a SYMMETRIC
  13-TAP LINEAR FILTER a_k = (1/L) sum_{j-i=k} u_i u_j. Taps are
  e9-quantized once, so each month's trend is an exact integer dot
  product (the Henderson discipline with learned weights). Spark folds
  the 28-cell C driver-side and mirrors the oracle's recursion
  float-op-for-float-op; the oracle runs the same power iteration as
  a recursive CTE with the 7 eigenvector components pivoted to
  columns. Emits interior months + the top component's variance share.

- fellegi_sunter_em: the UNSUPERVISED completion of ext241's
  fellegi_sunter_weights (those weights used known truth pairs; real
  record linkage estimates m/u WITHOUT truth): a deterministic pair
  sample (md5-bucket-adjacent pairs = the random stratum, plus the
  delete-1 name-variant candidates = the match-rich stratum), three
  binary comparison fields (name levenshtein <= 1, same nation, same
  mktsegment), and 5 EM rounds over the <= 8 pattern counts. Every
  E-step expectation is e12-quantized per pattern before the integer
  sums (engine-order-free); the M-step ratios are double divisions of
  identical integers. Bounded driver fold vs 5 unrolled CTE rounds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_L = 7
_ROUNDS = 20
_DEC = "decimal(38,0)"


def _c_exprs() -> list[tuple[int, int, str]]:
    """(i, j, SQL aggregate text) for the 28 upper-triangle entries of
    the lag-covariance matrix over the lead-shifted month row: col p is
    `v` for p = 0 else `v{p}`, and only trajectory starts t <= K
    contribute (K = months - L + 1)."""
    out = []
    for i in range(_L):
        for j in range(i, _L):
            ci = "v" if i == 0 else f"v{i}"
            cj = "v" if j == 0 else f"v{j}"
            out.append(
                (
                    i,
                    j,
                    f"CAST(sum(CASE WHEN i <= k THEN {ci} * {cj} END)"
                    f" AS BIGINT) AS c{i}{j}",
                )
            )
    return out


def _cref(i: int, j: int) -> str:
    a, b = min(i, j), max(i, j)
    return f"c{a}{b}"


def ssa_power_iteration(c):
    """Reference power iteration mirroring the oracle's float ops
    exactly (left-associated accumulation, same literals). `c` is the
    dense integer 7x7 matrix; returns (u, lam, trace)."""
    u = [1.0 / math.sqrt(7.0)] * _L
    for _ in range(_ROUNDS):
        w = []
        for i in range(_L):
            acc = 0.0
            for j in range(_L):
                acc = acc + float(c[i][j]) * u[j]
            w.append(acc)
        nrm_acc = 0.0
        for i in range(_L):
            nrm_acc = nrm_acc + w[i] * w[i]
        nrm = math.sqrt(nrm_acc)
        u = [w[i] / nrm for i in range(_L)]
    w = []
    for i in range(_L):
        acc = 0.0
        for j in range(_L):
            acc = acc + float(c[i][j]) * u[j]
        w.append(acc)
    lam = 0.0
    for i in range(_L):
        lam = lam + u[i] * w[i]
    trace = sum(c[i][i] for i in range(_L))
    return u, lam, trace


def ssa_taps_e9(u):
    """Symmetric 13-tap filter of the rank-1 diagonal-averaged
    reconstruction: a_k = (1/L) sum_{j-i=k} u_i u_j, e9-quantized."""
    taps = []
    for k in range(_L):
        acc = 0.0
        for i in range(_L - k):
            acc = acc + u[i] * u[i + k]
        taps.append(int(math.floor(acc / 7.0 * 1e9 + 0.5)))
    return taps


def _ssa_oracle() -> str:
    cexprs = ",\n             ".join(e for _, _, e in _c_exprs())
    leads = ", ".join(
        f"lead(v, {p}) OVER (ORDER BY i) AS v{p}" for p in range(1, _L)
    )
    wexprs = ", ".join(
        "("
        + " + ".join(
            f"CAST(cm.{_cref(i, j)} AS DOUBLE) * it.u{j}"
            for j in range(_L)
        )
        + f") AS w{i}"
        for i in range(_L)
    )
    nrm = " + ".join(f"w{i} * w{i}" for i in range(_L))
    unew = ", ".join(f"w{i} / nrm AS u{i}" for i in range(_L))
    useed = ", ".join(f"1.0 / sqrt(7.0) AS u{i}" for i in range(_L))
    lam_terms = " + ".join(f"fin.u{i} * fw.w{i}" for i in range(_L))
    fw = ", ".join(
        "("
        + " + ".join(
            f"CAST(cm.{_cref(i, j)} AS DOUBLE) * fin.u{j}"
            for j in range(_L)
        )
        + f") AS w{i}"
        for i in range(_L)
    )
    trace = " + ".join(f"cm.c{i}{i}" for i in range(_L))
    taps = ", ".join(
        "CAST(floor(("
        + " + ".join(f"fin.u{i} * fin.u{i + k}" for i in range(_L - k))
        + ") / 7.0 * 1e9 + 0.5) AS BIGINT) AS t" + str(k)
        for k in range(_L)
    )
    conv = " + ".join(
        [f"tp.t0 * s.v"]
        + [
            f"tp.t{k} * (lag(s.v, {k}) OVER (ORDER BY s.m)"
            f" + lead(s.v, {k}) OVER (ORDER BY s.m))"
            for k in range(1, _L)
        ]
    )
    return f"""
    WITH RECURSIVE mon AS MATERIALIZED (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) // 100000 AS v
      FROM orders GROUP BY 1),
    idx AS (
      SELECT m, v, row_number() OVER (ORDER BY m) AS i FROM mon),
    nn AS (SELECT CAST(count(*) AS BIGINT) - {_L - 1} AS k FROM idx),
    w7 AS (
      SELECT i, v, {leads} FROM idx),
    cmat AS (
      SELECT {cexprs}
      FROM w7 CROSS JOIN nn),
    it AS (
      SELECT CAST(0 AS BIGINT) AS r, {useed} FROM (SELECT 1)
      UNION ALL
      SELECT r + 1, {unew}
      FROM (
        SELECT r, {", ".join(f"w{i}" for i in range(_L))},
               sqrt({nrm}) AS nrm
        FROM (
          SELECT it.r, {wexprs}
          FROM it CROSS JOIN cmat cm
          WHERE it.r < {_ROUNDS}))),
    fin AS (SELECT * FROM it WHERE r = {_ROUNDS}),
    fwv AS (SELECT {fw} FROM fin CROSS JOIN cmat cm),
    lamv AS (
      SELECT CAST(floor(({lam_terms}) / CAST({trace} AS DOUBLE) * 1e6
                        + 0.5) AS BIGINT) AS var_explained_ppm
      FROM fin CROSS JOIN fwv fw CROSS JOIN cmat cm),
    tp AS (SELECT {taps} FROM fin),
    conv AS (
      SELECT s.m, s.v, {conv} AS num
      FROM idx s CROSS JOIN tp tp)
    SELECT strftime(c.m, '%Y-%m') AS month,
           c.v * 1000 AS revenue_dollars,
           CAST(c.num // 1000000 AS BIGINT) AS trend_dollars,
           CAST(c.v * 1000 - c.num // 1000000 AS BIGINT)
             AS cycle_dollars,
           l.var_explained_ppm
    FROM conv c CROSS JOIN lamv l
    WHERE c.num IS NOT NULL
    """


@register(
    "ssa_trend_cycle",
    _ssa_oracle(),
    tags=("timeseries", "trend", "spectral", "exact-arith"),
)
def q_ssa_trend_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSA trend of monthly revenue (module docstring): exact-integer
    lag-covariance fold, driver-side power iteration mirroring the
    recursive-CTE oracle float-for-float, e9 taps re-entering the plan
    as literals, and an exact integer 13-tap convolution over the
    month spine (interior months only)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import (
        collect_nonempty,
    )

    orders = read_table(spark, sf_dir, "orders")
    mon = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
            " AS BIGINT) DIV 100000"
        ).alias("v")
    ).localCheckpoint(eager=True)
    w = Window.orderBy("m")
    idx = mon.select("m", "v", F.row_number().over(w).alias("i"))
    w7 = idx.select(
        "i",
        "v",
        *[F.lead("v", p).over(Window.orderBy("i")).alias(f"v{p}")
          for p in range(1, _L)],
    )
    n_months = mon.count()
    k = n_months - (_L - 1)
    aggs = []
    for i in range(_L):
        for j in range(i, _L):
            ci = "v" if i == 0 else f"v{i}"
            cj = "v" if j == 0 else f"v{j}"
            aggs.append(
                F.expr(
                    f"CAST(sum(CASE WHEN i <= {k} THEN {ci} * {cj} END)"
                    " AS BIGINT)"
                ).alias(f"c{i}{j}")
            )
    crow = collect_nonempty(w7.agg(*aggs), "ssa lag-covariance")[0]
    c = [
        [int(crow[_cref(i, j)]) for j in range(_L)] for i in range(_L)
    ]
    u, lam, trace = ssa_power_iteration(c)
    taps = ssa_taps_e9(u)
    var_ppm = int(math.floor(lam / float(trace) * 1e6 + 0.5))
    num = F.lit(taps[0]).cast("bigint") * F.col("v")
    for kk in range(1, _L):
        num = num + F.lit(taps[kk]).cast("bigint") * (
            F.lag("v", kk).over(w) + F.lead("v", kk).over(w)
        )
    conv = idx.select("m", "v", num.alias("num")).where(
        F.col("num").isNotNull()
    )
    return conv.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        (F.col("v") * 1000).cast("bigint").alias("revenue_dollars"),
        F.expr("CAST(num DIV 1000000 AS BIGINT)").alias("trend_dollars"),
        F.expr(
            "CAST(v * 1000 - num DIV 1000000 AS BIGINT)"
        ).alias("cycle_dollars"),
        F.lit(var_ppm).cast("bigint").alias("var_explained_ppm"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter EM (unsupervised m/u estimation)
# ---------------------------------------------------------------------------

_EM_ROUNDS = 5
_EM_INIT = {"p": 0.1, "m": [0.8, 0.8, 0.8], "u": [0.2, 0.2, 0.2]}


def fs_em_fold(patterns, rounds=_EM_ROUNDS):
    """EM over (g1, g2, g3, count) pattern rows, mirroring the oracle:
    per-pattern posteriors e12-quantized BEFORE summation (the sums are
    then exact integers in both engines), M-step ratios as double
    divisions of those integers. Patterns are consumed in sorted
    (g1, g2, g3) order. Returns (p, m[3], u[3], n)."""
    pats = sorted(patterns)
    n = sum(cnt for *_g, cnt in pats)
    p = _EM_INIT["p"]
    m = list(_EM_INIT["m"])
    uu = list(_EM_INIT["u"])
    for _ in range(rounds):
        cw = 0
        cwg = [0, 0, 0]
        cvg = [0, 0, 0]
        cv = 0
        for g1, g2, g3, cnt in pats:
            gs = (g1, g2, g3)
            num = p
            for f in range(3):
                num = num * (m[f] if gs[f] else 1.0 - m[f])
            den_u = 1.0 - p
            for f in range(3):
                den_u = den_u * (uu[f] if gs[f] else 1.0 - uu[f])
            wpost = num / (num + den_u)
            cw += int(math.floor(cnt * wpost * 1e12 + 0.5))
            cv += int(math.floor(cnt * (1.0 - wpost) * 1e12 + 0.5))
            for f in range(3):
                if gs[f]:
                    cwg[f] += int(math.floor(cnt * wpost * 1e12 + 0.5))
                    cvg[f] += int(
                        math.floor(cnt * (1.0 - wpost) * 1e12 + 0.5)
                    )
        p = float(cw) / (float(n) * 1e12)
        m = [float(cwg[f]) / float(cw) for f in range(3)]
        uu = [float(cvg[f]) / float(cv) for f in range(3)]
    return p, m, uu, n


def _em_round_sql(i: int) -> str:
    gs = ["g1", "g2", "g3"]
    num = "b.p"
    den = "(1.0 - b.p)"
    for f, g in enumerate(gs, start=1):
        num = f"({num} * (CASE WHEN pt.{g} = 1 THEN b.m{f}" \
              f" ELSE 1.0 - b.m{f} END))"
        den = f"({den} * (CASE WHEN pt.{g} = 1 THEN b.u{f}" \
              f" ELSE 1.0 - b.u{f} END))"
    w = f"({num} / ({num} + {den}))"
    q = "CAST(floor(pt.c * {x} * 1e12 + 0.5) AS HUGEINT)"
    wq = q.format(x=w)
    vq = q.format(x=f"(1.0 - {w})")
    sums = [f"sum({wq}) AS cw", f"sum({vq}) AS cv"]
    for f, g in enumerate(gs, start=1):
        sums.append(f"sum(CASE WHEN pt.{g} = 1 THEN {wq} ELSE 0 END)"
                    f" AS cwg{f}")
        sums.append(f"sum(CASE WHEN pt.{g} = 1 THEN {vq} ELSE 0 END)"
                    f" AS cvg{f}")
    return f"""
    es{i} AS (
      SELECT {", ".join(sums)}
      FROM pats pt CROSS JOIN em{i} b),
    em{i + 1} AS (
      SELECT CAST(e.cw AS DOUBLE) / (CAST(t.n AS DOUBLE) * 1e12) AS p,
             {", ".join(
                 f"CAST(e.cwg{f} AS DOUBLE) / CAST(e.cw AS DOUBLE)"
                 f" AS m{f}" for f in range(1, 4))},
             {", ".join(
                 f"CAST(e.cvg{f} AS DOUBLE) / CAST(e.cv AS DOUBLE)"
                 f" AS u{f}" for f in range(1, 4))}
      FROM es{i} e CROSS JOIN tot t)
    """


def _fs_em_oracle() -> str:
    rounds = ",".join(_em_round_sql(i).strip() for i in range(_EM_ROUNDS))
    init = (
        f"SELECT {_EM_INIT['p']} AS p, "
        + ", ".join(
            f"{_EM_INIT['m'][f]} AS m{f + 1}" for f in range(3)
        )
        + ", "
        + ", ".join(
            f"{_EM_INIT['u'][f]} AS u{f + 1}" for f in range(3)
        )
    )
    return f"""
    WITH cust AS (
      SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nk,
             c_mktsegment AS seg,
             md5(CAST(c_custkey AS VARCHAR)) AS h
      FROM customer),
    adj AS (
      SELECT k, nm, nk, seg, substr(h, 1, 2) AS b,
             lead(k) OVER (PARTITION BY substr(h, 1, 2)
               ORDER BY h, k) AS k2
      FROM cust),
    stratum_a AS (
      SELECT least(a.k, c2.k) AS ka, greatest(a.k, c2.k) AS kb
      FROM adj a JOIN cust c2 ON c2.k = a.k2),
    vars AS (
      SELECT nk, k, CASE WHEN i = 0 THEN nm
               ELSE substr(nm, 1, i - 1) || substr(nm, i + 1) END AS v
      FROM cust,
           LATERAL (SELECT unnest(range(0, length(nm) + 1)) AS i) t),
    stratum_b AS (
      SELECT DISTINCT a.k AS ka, b.k AS kb
      FROM vars a JOIN vars b
        ON a.nk = b.nk AND a.v = b.v AND a.k < b.k),
    prs AS (
      SELECT DISTINCT ka, kb FROM (
        SELECT ka, kb FROM stratum_a
        UNION ALL SELECT ka, kb FROM stratum_b)),
    cmp AS (
      SELECT CASE WHEN levenshtein(x.nm, y.nm) <= 1 THEN 1 ELSE 0 END
               AS g1,
             CASE WHEN x.nk = y.nk THEN 1 ELSE 0 END AS g2,
             CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END AS g3
      FROM prs p JOIN cust x ON x.k = p.ka JOIN cust y ON y.k = p.kb),
    pats AS MATERIALIZED (
      SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS c
      FROM cmp GROUP BY 1, 2, 3),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pats),
    em0 AS ({init}),
    {rounds},
    fin AS (SELECT * FROM em{_EM_ROUNDS}),
    fields AS (SELECT unnest(range(1, 4)) AS f)
    SELECT CAST(f.f AS INTEGER) AS field,
           CASE f.f WHEN 1 THEN 'name_lev1' WHEN 2 THEN 'nation'
                    ELSE 'mktsegment' END AS field_name,
           CAST(floor((CASE f.f WHEN 1 THEN fin.m1 WHEN 2 THEN fin.m2
                       ELSE fin.m3 END) * 1e6 + 0.5) AS BIGINT)
             AS m_ppm,
           CAST(floor((CASE f.f WHEN 1 THEN fin.u1 WHEN 2 THEN fin.u2
                       ELSE fin.u3 END) * 1e6 + 0.5) AS BIGINT)
             AS u_ppm,
           CAST(floor(ln((CASE f.f WHEN 1 THEN fin.m1 WHEN 2 THEN fin.m2
                          ELSE fin.m3 END)
                       / (CASE f.f WHEN 1 THEN fin.u1 WHEN 2 THEN fin.u2
                          ELSE fin.u3 END)) * 1e6 + 0.5) AS BIGINT)
             AS agree_weight_e6,
           CAST(floor(fin.p * 1e6 + 0.5) AS BIGINT) AS p_match_ppm,
           t.n AS n_pairs
    FROM fields f CROSS JOIN fin CROSS JOIN tot t
    ORDER BY field
    """


@register(
    "fellegi_sunter_em",
    _fs_em_oracle(),
    tags=("entity-resolution", "em", "ml", "exact-arith"),
)
def q_fellegi_sunter_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised Fellegi-Sunter m/u estimation by EM (module
    docstring): deterministic two-stratum pair sample, distributed
    pattern counts (<= 8 rows), bounded driver EM fold mirroring the
    unrolled-CTE oracle, per-field match weights in exact ppm."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.fold import (
        collect_nonempty,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.md5(F.col("c_custkey").cast("string")).alias("h"),
    )
    wb = Window.partitionBy(F.substring("h", 1, 2)).orderBy("h", "k")
    adj = cust.select("k", F.lead("k").over(wb).alias("k2")).where(
        F.col("k2").isNotNull()
    )
    stratum_a = adj.select(
        F.least("k", "k2").alias("ka"), F.greatest("k", "k2").alias("kb")
    )
    vars_df = (
        cust.select(
            "nk",
            "k",
            "nm",
            F.explode(F.expr("sequence(0, length(nm))")).alias("i"),
        )
        .select(
            "nk",
            "k",
            F.when(F.col("i") == 0, F.col("nm"))
            .otherwise(
                F.concat(
                    F.expr("substr(nm, 1, i - 1)"),
                    F.expr("substr(nm, i + 1)"),
                )
            )
            .alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    a, b = vars_df.alias("a"), vars_df.alias("b")
    stratum_b = (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(F.col("a.k").alias("ka"), F.col("b.k").alias("kb"))
        .distinct()
    )
    prs = stratum_a.unionByName(stratum_b).distinct()
    x = cust.select(
        F.col("k").alias("ka"), F.col("nm").alias("nma"),
        F.col("nk").alias("nka"), F.col("seg").alias("sega"),
    )
    y = cust.select(
        F.col("k").alias("kb"), F.col("nm").alias("nmb"),
        F.col("nk").alias("nkb"), F.col("seg").alias("segb"),
    )
    cmp = (
        prs.join(x, "ka")
        .join(y, "kb")
        .select(
            F.when(F.levenshtein("nma", "nmb") <= 1, 1)
            .otherwise(0)
            .alias("g1"),
            F.when(F.col("nka") == F.col("nkb"), 1).otherwise(0).alias("g2"),
            F.when(F.col("sega") == F.col("segb"), 1)
            .otherwise(0)
            .alias("g3"),
        )
    )
    pats = cmp.groupBy("g1", "g2", "g3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rows = collect_nonempty(pats, "fellegi-sunter patterns")
    patterns = [
        (int(r["g1"]), int(r["g2"]), int(r["g3"]), int(r["c"]))
        for r in rows
    ]
    p, m, uu, n = fs_em_fold(patterns)
    names = ["name_lev1", "nation", "mktsegment"]
    out = [
        (
            f + 1,
            names[f],
            int(math.floor(m[f] * 1e6 + 0.5)),
            int(math.floor(uu[f] * 1e6 + 0.5)),
            int(math.floor(math.log(m[f] / uu[f]) * 1e6 + 0.5)),
            int(math.floor(p * 1e6 + 0.5)),
            n,
        )
        for f in range(3)
    ]
    return spark.createDataFrame(
        out,
        "field int, field_name string, m_ppm long, u_ppm long,"
        " agree_weight_e6 long, p_match_ppm long, n_pairs long",
    )
