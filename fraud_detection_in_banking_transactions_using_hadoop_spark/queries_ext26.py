"""Extension batch 26: rank correlation (Kendall tau-b), isotonic
calibration, empirical-Bayes rate shrinkage, one-way ANOVA, and
corpus novelty decay.

Scale notes (the 100 TB story per query):
- kendall_tau_daily joins PAIRS of the calendar-bounded daily summary
  (|days|^2 is constant in SF -- the fact table collapses to one row
  per day first). Concordant/discordant/tie counts are exact integers;
  only the final tau-b is a double. The pair join is a whitelisted
  bounded nested-loop (same justification as the daily-series
  windows).
- isotonic_calibration runs PAV via its minimax closed form
  fit(i) = max_{j<=i} min_{k>=i} wavg(y, j..k) -- entirely on a
  10-row score-band summary, so the "regression" is a couple of
  bounded joins. The fact table contributes one groupBy. This is the
  standard fraud-score -> empirical-rate calibration step.
- eb_shrunk_rates is beta-binomial empirical Bayes: per-customer
  return rates are quantized to exact e6 integers, so the
  method-of-moments mean/variance are ratios of EXACT integer sums
  (no float-sum ordering issues); alpha/beta and the shrunk rates are
  then one deterministic double expression per customer.
- anova_dow_revenue is one-way ANOVA across day-of-week groups from
  exact integer (n, sum, sum-of-squares) cents moments -- one groupBy
  to 7 rows, then closed-form F. The classical "is there weekly
  seasonality" gate.
- ngram_novelty_decay attributes each distinct 3-gram to its first
  document (min doc_id over the shingle key) and reports the per-doc
  novel fraction -- the corpus-redundancy growth curve used to decide
  when more scraped data stops adding information. Shuffles only on
  the shingle and doc keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Kendall tau-b between daily revenue and daily order count.
# ---------------------------------------------------------------------------
@register(
    "kendall_tau_daily",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d, CAST(sum({_CENTS}) AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    pairs AS (
      SELECT CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS dd,
             CAST(count(*) AS BIGINT) AS n0
      FROM days a JOIN days b ON a.d < b.d
    ),
    tx AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS BIGINT) AS v
           FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM days
                 GROUP BY x HAVING count(*) > 1)),
    ty AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS BIGINT) AS v
           FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM days
                 GROUP BY y HAVING count(*) > 1))
    SELECT p.c AS concordant, p.dd AS discordant, p.n0 AS n_pairs,
           tx.v AS ties_x, ty.v AS ties_y,
           CASE WHEN p.n0 = tx.v OR p.n0 = ty.v THEN NULL
                ELSE round((CAST(p.c AS DOUBLE) - p.dd)
                           / sqrt(CAST(p.n0 - tx.v AS DOUBLE)
                                  * (p.n0 - ty.v)), 6)
           END AS tau_b
    FROM pairs p CROSS JOIN tx CROSS JOIN ty
    """,
    tags=("stats", "correlation", "rank"),
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tau-b with tie corrections from exact integer pair counts over
    the bounded daily summary (|days| is calendar-capped, so the pair
    join is constant-size in SF -- whitelisted bounded nested loop).
    Only the final statistic is a double."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast("bigint").alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    a, b = days.alias("a"), days.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("dd"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
    )
    tx = (
        days.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(F.coalesce(F.sum(F.expr("t * (t - 1) DIV 2")), F.lit(0)).cast("bigint").alias("tx"))
    )
    ty = (
        days.groupBy("y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(F.coalesce(F.sum(F.expr("t * (t - 1) DIV 2")), F.lit(0)).cast("bigint").alias("ty"))
    )
    tau = (F.col("c").cast("double") - F.col("dd")) / F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty"))
    )
    return (
        pairs.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("c").alias("concordant"),
            F.col("dd").alias("discordant"),
            F.col("n0").alias("n_pairs"),
            F.col("tx").alias("ties_x"),
            F.col("ty").alias("ties_y"),
            F.when(
                (F.col("n0") == F.col("tx")) | (F.col("n0") == F.col("ty")),
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(tau, 6))
            .alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration of return rate over order-value bands (PAV via
# the minimax closed form on the bounded bin summary).
# ---------------------------------------------------------------------------
_ISO_BIN_CENTS = 5000000  # $50k bands
_ISO_MAX_BIN = 9


@register(
    "isotonic_calibration",
    f"""
    WITH lab AS (
      SELECT least({_CENTS} // {_ISO_BIN_CENTS}, {_ISO_MAX_BIN}) AS bin,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS k
      FROM lab GROUP BY bin
    ),
    seg AS (
      SELECT j.bin AS j, k.bin AS kk,
             CAST(sum(m.k) AS DOUBLE) / sum(m.n) AS avg_jk
      FROM bins j JOIN bins k ON j.bin <= k.bin
      JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
      GROUP BY j.bin, k.bin
    ),
    inner_min AS (
      SELECT b.bin, s.j, min(s.avg_jk) AS mn
      FROM bins b JOIN seg s ON s.j <= b.bin AND s.kk >= b.bin
      GROUP BY b.bin, s.j
    ),
    fit AS (SELECT bin, max(mn) AS iso FROM inner_min GROUP BY bin)
    SELECT b.bin, b.n, b.k,
           round(CAST(b.k AS DOUBLE) / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate
    FROM bins b JOIN fit f ON b.bin = f.bin
    """,
    tags=("ml", "calibration", "isotonic"),
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAV isotonic regression of the return rate on order-value bands
    via the minimax identity fit(i) = max_{j<=i} min_{k>=i}
    wavg(j..k): the fact table collapses to <=10 (n, k) bin rows, and
    the whole fit is two bounded joins over that summary -- the
    scale-correct way to run isotonic on 100 TB (moments first, exact
    fit on the summary). Weighted segment means are ratios of exact
    integers, so both engines compute identical doubles."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lab = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        F.least(
            F.expr(f"{_CENTS} DIV {_ISO_BIN_CENTS}"),
            F.lit(_ISO_MAX_BIN).cast("bigint"),
        ).alias("bin"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    bins = lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("k"),
    )
    j = bins.select(F.col("bin").alias("j"))
    kk = bins.select(F.col("bin").alias("kk"))
    m = bins.select(F.col("bin").alias("mb"), "n", "k")
    seg = (
        j.join(kk, F.col("j") <= F.col("kk"))
        .join(m, (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("kk")))
        .groupBy("j", "kk")
        .agg((F.sum("k").cast("double") / F.sum("n")).alias("avg_jk"))
    )
    b2 = bins.select(F.col("bin"))
    inner_min = (
        b2.join(seg, (F.col("j") <= F.col("bin")) & (F.col("kk") >= F.col("bin")))
        .groupBy("bin", "j")
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = inner_min.groupBy("bin").agg(F.max("mn").alias("iso"))
    return (
        bins.join(fit, "bin")
        .select(
            "bin",
            "n",
            "k",
            F.round(F.col("k").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes (beta-binomial) shrinkage of per-customer return
# rates, exact e6-int moments.
# ---------------------------------------------------------------------------
@register(
    "eb_shrunk_rates",
    """
    WITH lab AS (
      SELECT o.o_custkey,
             CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
      FROM orders o
      LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_returnflag = 'R') r
        ON o.o_orderkey = r.l_orderkey
    ),
    cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS k,
             CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS r_e6
      FROM lab GROUP BY o_custkey
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(sum(r_e6) AS BIGINT) AS s1,
             CAST(sum(r_e6 * r_e6) AS BIGINT) AS s2
      FROM cust
    ),
    par AS (
      SELECT (CAST(s1 AS DOUBLE) / nc) / 1000000.0 AS m,
             (CAST(s2 AS DOUBLE) / nc
              - (CAST(s1 AS DOUBLE) / nc) * (CAST(s1 AS DOUBLE) / nc))
               / 1000000000000.0 AS v
      FROM mom
    )
    SELECT c.o_custkey, c.n, c.k,
           round(CAST(c.k AS DOUBLE) / c.n, 6) AS raw_rate,
           CASE WHEN p.v <= 0 OR p.m <= 0 OR p.m >= 1 THEN NULL
                ELSE round(
                  (c.k + p.m * (p.m * (1 - p.m) / p.v - 1))
                  / (c.n + (p.m * (1 - p.m) / p.v - 1)), 6)
           END AS shrunk_rate
    FROM cust c CROSS JOIN par p
    """,
    tags=("stats", "bayes", "shrinkage"),
)
def q_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial shrinkage: per-customer rates quantized to exact
    e6 integers, method-of-moments (m, v) from EXACT integer sums
    (no float-sum ordering hazard), then
    shrunk = (k + alpha)/(n + alpha + beta) with
    alpha = m*c, beta = (1-m)*c, c = m(1-m)/v - 1 -- written so
    alpha + beta = c in both engines. The 1-row parameter table
    broadcasts (whitelisted crossJoin)."""
    li_r = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lab = o.join(li_r, o.o_orderkey == li_r.l_orderkey, "left").select(
        "o_custkey",
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    cust = (
        lab.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("k"),
        )
        .withColumn("r_e6", F.expr("CAST((1000000 * k) DIV n AS BIGINT)"))
    )
    mom = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("nc"),
        F.sum("r_e6").cast("bigint").alias("s1"),
        F.sum(F.col("r_e6") * F.col("r_e6")).cast("bigint").alias("s2"),
    )
    m = (F.col("s1").cast("double") / F.col("nc")) / 1000000.0
    v = (
        F.col("s2").cast("double") / F.col("nc")
        - (F.col("s1").cast("double") / F.col("nc"))
        * (F.col("s1").cast("double") / F.col("nc"))
    ) / 1000000000000.0
    par = mom.select(m.alias("m"), v.alias("v"))
    c_ab = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    shrunk = (F.col("k") + F.col("m") * c_ab) / (F.col("n") + c_ab)
    return cust.crossJoin(F.broadcast(par)).select(
        "o_custkey",
        "n",
        "k",
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.when(
            (F.col("v") <= 0) | (F.col("m") <= 0) | (F.col("m") >= 1),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(shrunk, 6))
        .alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA of order value across day-of-week groups.
# ---------------------------------------------------------------------------
@register(
    "anova_dow_revenue",
    f"""
    WITH x AS (
      SELECT dayofweek(o_orderdate) % 7 AS dow,
             {_CENTS} // 100 AS c
      FROM orders
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS q
      FROM x GROUP BY dow
    ),
    terms AS (
      SELECT n, s,
             CAST(round(CAST(s AS DOUBLE) * s / n, 0) AS BIGINT) AS wb,
             CAST(round(CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE) * s / n, 0) AS BIGINT) AS ww
      FROM g
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(wb) AS BIGINT) AS b_sum, CAST(sum(ww) AS BIGINT) AS w_sum
      FROM terms
    )
    SELECT nn AS n_total, kk AS n_groups,
           b_sum - CAST(round(CAST(ss AS DOUBLE) * ss / nn, 0) AS BIGINT)
             AS ssb,
           w_sum AS ssw,
           round((CAST(b_sum - CAST(round(CAST(ss AS DOUBLE) * ss / nn, 0)
                                    AS BIGINT) AS DOUBLE) / (kk - 1))
                 / (CAST(w_sum AS DOUBLE) / (nn - kk)), 6) AS f_stat
    FROM tot
    """,
    tags=("stats", "anova", "A1"),
)
def q_anova_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA from exact integer (n, sum, sum-sq) whole-dollar
    moments per day-of-week (dayofweek % 7 aligns Spark's 1=Sunday..7
    with DuckDB's 0=Sunday..6). Two cross-engine traps closed here:
    (1) SSB/SSW as direct double sums over the 7 group terms differ in
    the last ulp (engine-dependent sum order); (2) Spark casts
    double->decimal through the SHORTEST string repr while DuckDB uses
    the exact binary value, so huge rounded doubles must NOT round-trip
    through DECIMAL. Fix: whole-dollar units keep every term under
    2^53, so round(term, 0) is an exact-integer double and the BIGINT
    casts agree; the cross-group sums are then exact integer sums and
    only the final F division is float. One groupBy to 7 rows."""
    orders = read_table(spark, sf_dir, "orders")
    x = orders.select(
        (F.dayofweek("o_orderdate") % 7).alias("dow"),
        F.expr(f"{_CENTS} DIV 100").alias("c"),
    )
    g = x.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    s_d = F.col("s").cast("double")
    terms = g.select(
        "n",
        "s",
        F.round(s_d * F.col("s") / F.col("n"), 0).cast("bigint").alias("wb"),
        F.round(F.col("q").cast("double") - s_d * F.col("s") / F.col("n"), 0)
        .cast("bigint")
        .alias("ww"),
    )
    tot = terms.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum("wb").cast("bigint").alias("b_sum"),
        F.sum("ww").cast("bigint").alias("w_sum"),
    )
    grand = F.round(
        F.col("ss").cast("double") * F.col("ss") / F.col("nn"), 0
    ).cast("bigint")
    ssb = F.col("b_sum") - grand
    return tot.select(
        F.col("nn").alias("n_total"),
        F.col("kk").alias("n_groups"),
        ssb.alias("ssb"),
        F.col("w_sum").alias("ssw"),
        F.round(
            (ssb.cast("double") / (F.col("kk") - 1))
            / (F.col("w_sum").cast("double") / (F.col("nn") - F.col("kk"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Corpus novelty decay: per doc, fraction of its distinct 3-grams not
# seen in any earlier document.
# ---------------------------------------------------------------------------
@register(
    "ngram_novelty_decay",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
             )) AS tok
      FROM t),
    first AS (SELECT tok, min(doc_id) AS first_doc FROM sh GROUP BY tok)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((1000000 * sum(CASE WHEN f.first_doc = s.doc_id
                               THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
             AS novelty_ppm
    FROM sh s JOIN first f ON s.tok = f.tok
    GROUP BY s.doc_id
    """,
    tags=("llm", "dedup", "novelty"),
)
def q_ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each distinct 3-gram is owned by its first document (min doc_id
    over the shingle key); a doc's novelty is the owned fraction of
    its shingles. Plotted over ingestion order this is the redundancy
    growth curve that tells you when additional scraped data stops
    adding new content. Same two-shuffle shape as substring_dup_spans
    (shingle key, then doc key)."""
    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import shingle_rows

    docs = read_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs, "doc_id", "text", w=3).select("doc_id", "tok").distinct()
    first = sh.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr("CAST((1000000 * n_novel) DIV n_shingles AS BIGINT)"),
        )
    )
