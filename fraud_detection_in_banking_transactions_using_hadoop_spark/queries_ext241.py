"""Extension batch 241 (round 11): entity-resolution METHODOLOGY --
the measurement layer over the dedup/fuzzy tier, closing the loop the
r11 fuzzy_name_match twin opened.

- blocking_quality: the standard record-linkage evaluation of a
  blocking scheme -- REDUCTION RATIO (how many of the n(n-1)/2
  comparisons the blocks avoid) vs PAIRS COMPLETENESS (what fraction
  of true matches the blocks retain) -- for three schemes over the
  customer table: nation blocking (the fuzzy baseline's key), name
  digit-prefix blocking, and the delete-1-variant blocking (the r11
  scale twin). Ground truth = the exact levenshtein<=1 same-nation
  pair set. Candidate counts come from BLOCK SIZES (sum b(b-1)/2, no
  pair enumeration); completeness joins only the truth pairs against
  the block keys. Everything exact integers + ppm divisions.

- fellegi_sunter_weights: the 1969 probabilistic record-linkage
  scoring model: for each comparison field, m = P(agree | match) and
  u = P(agree | non-match) give the log-likelihood agreement weight
  ln(m/u) and disagreement weight ln((1-m)/(1-u)). Matches = the
  exact truth pairs; non-matches = a deterministic hash-ordered
  ring sample (each customer paired with the next-ranked customers
  at offsets 1, 2, 5 under md5 order -- reproducible, no rand()),
  anti-joined against the truth. Laplace-smoothed counts; one ln per
  (field, side) cell on an exact rational, e9-quantized (the ext236
  per-cell discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

# exact truth pairs: levenshtein <= 1 inside a nation (the delete-1
# candidate join + verifier -- the ext231 construction, re-derived)
_TRUTH_SQL = """
    vars AS MATERIALIZED (
      SELECT c_nationkey AS nk, c_name AS name,
             CASE WHEN i = 0 THEN c_name
                  ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
             END AS v
      FROM customer,
           LATERAL (SELECT unnest(range(0, length(c_name) + 1)) AS i) t),
    truth AS MATERIALIZED (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM vars a JOIN vars b
        ON a.nk = b.nk AND a.v = b.v AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 1)
"""


@register(
    "blocking_quality",
    f"""
    WITH {_TRUTH_SQL},
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
    n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
    -- scheme candidate counts from block sizes
    nation_cand AS (
      SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS cand
      FROM (SELECT CAST(count(*) AS BIGINT) AS b FROM customer
            GROUP BY c_nationkey)),
    prefix_cand AS (
      SELECT CAST(sum(b * (b - 1) // 2) AS BIGINT) AS cand
      FROM (SELECT CAST(count(*) AS BIGINT) AS b FROM customer
            GROUP BY substr(c_name, 10, 6))),
    var_cand AS (
      -- distinct candidate pairs of the variant join (tiny buckets)
      SELECT CAST(count(*) AS BIGINT) AS cand FROM (
        SELECT DISTINCT a.name, b.name AS bname
        FROM vars a JOIN vars b
          ON a.nk = b.nk AND a.v = b.v AND a.name < b.name)),
    -- completeness: truth pairs retained by each scheme
    nation_found AS (SELECT n_truth AS f FROM nt),  -- same-nation by def
    prefix_found AS (
      SELECT CAST(count(*) AS BIGINT) AS f
      FROM truth t
      JOIN customer a ON a.c_name = t.name_a
      JOIN customer b ON b.c_name = t.name_b
      WHERE substr(a.c_name, 10, 6) = substr(b.c_name, 10, 6)),
    var_found AS (SELECT n_truth AS f FROM nt),  -- provably complete
    schemes AS (
      SELECT 'nation' AS scheme, (SELECT cand FROM nation_cand) AS cand,
             (SELECT f FROM nation_found) AS found
      UNION ALL
      SELECT 'digit_prefix6', (SELECT cand FROM prefix_cand),
             (SELECT f FROM prefix_found)
      UNION ALL
      SELECT 'delete1_variant', (SELECT cand FROM var_cand),
             (SELECT f FROM var_found))
    SELECT s.scheme, s.cand AS n_candidates,
           nt.n_truth, s.found AS n_found,
           CAST(1000000 * s.found // nt.n_truth AS BIGINT)
             AS completeness_ppm,
           CAST(1000000 - 1000000 * s.cand
                // (na.n * (na.n - 1) // 2) AS BIGINT) AS reduction_ppm
    FROM schemes s CROSS JOIN nt CROSS JOIN n_all na
    """,
    tags=("dedup", "entity-resolution", "eval", "exact-arith"),
)
def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reduction ratio vs pairs completeness for three blocking
    schemes (module docstring): block-size arithmetic for candidate
    counts, truth-pair joins for completeness, exact ppm."""
    cust = read_table(spark, sf_dir, "customer").select("c_nationkey", "c_name")
    n_all = cust.count()
    vars_df = (
        cust.select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_name").alias("name"),
            F.explode(F.expr("sequence(0, length(c_name))")).alias("i"),
        )
        .select(
            "nk",
            "name",
            F.expr(
                "CASE WHEN i = 0 THEN name "
                "ELSE concat(substr(name, 1, i - 1), substr(name, i + 1)) END"
            ).alias("v"),
        )
        .persist()
    )
    b = vars_df.select(
        F.col("nk").alias("bnk"), F.col("name").alias("bname"), F.col("v").alias("bv")
    )
    cand_pairs = (
        vars_df.join(
            b,
            (F.col("nk") == F.col("bnk"))
            & (F.col("v") == F.col("bv"))
            & (F.col("name") < F.col("bname")),
        )
        .select("name", "bname")
        .distinct()
        .persist()
    )
    truth = cand_pairs.where(
        F.levenshtein(F.col("name"), F.col("bname")) <= 1
    ).persist()
    n_truth = truth.count()
    var_cand = cand_pairs.count()

    def block_count(df: DataFrame, key) -> int:
        sizes = df.groupBy(key.alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("b")
        )
        return int(
            sizes.agg(
                F.sum(F.expr("b * (b - 1) DIV 2")).cast("bigint").alias("c")
            ).collect()[0]["c"]
        )

    nation_cand = block_count(cust, F.col("c_nationkey"))
    prefix_cand = block_count(cust, F.expr("substr(c_name, 10, 6)"))
    prefix_found = truth.where(
        F.expr("substr(name, 10, 6) = substr(bname, 10, 6)")
    ).count()

    allp = n_all * (n_all - 1) // 2
    rows = [
        ("nation", nation_cand, n_truth, n_truth),
        ("digit_prefix6", prefix_cand, n_truth, prefix_found),
        ("delete1_variant", var_cand, n_truth, n_truth),
    ]
    out = [
        (
            s,
            cand,
            nt,
            found,
            1_000_000 * found // nt if nt else 0,
            1_000_000 - 1_000_000 * cand // allp,
        )
        for s, cand, nt, found in rows
    ]
    return spark.createDataFrame(
        out,
        "scheme string, n_candidates long, n_truth long, n_found long,"
        " completeness_ppm long, reduction_ppm long",
    )


@register(
    "fellegi_sunter_weights",
    f"""
    WITH {_TRUTH_SQL},
    ranked AS (
      SELECT c_name, c_nationkey, c_mktsegment,
             row_number() OVER (ORDER BY md5(c_name), c_name) AS rk
      FROM customer),
    nmax AS (SELECT CAST(max(rk) AS BIGINT) AS n FROM ranked),
    ring AS (
      SELECT a.c_name AS name_a, b.c_name AS name_b,
             a.c_nationkey AS na, b.c_nationkey AS nb,
             a.c_mktsegment AS ma, b.c_mktsegment AS mb
      FROM ranked a
      JOIN (SELECT unnest([1, 2, 5]) AS off) o ON true
      JOIN nmax x ON true
      JOIN ranked b ON b.rk = (a.rk + o.off - 1) % x.n + 1
      WHERE a.c_name <> b.c_name),
    nonmatch AS (
      SELECT r.* FROM ring r
      LEFT JOIN truth t
        ON t.name_a = least(r.name_a, r.name_b)
       AND t.name_b = greatest(r.name_a, r.name_b)
      WHERE t.name_a IS NULL),
    mpairs AS (
      SELECT t.name_a, t.name_b, a.c_nationkey AS na, b.c_nationkey AS nb,
             a.c_mktsegment AS ma, b.c_mktsegment AS mb
      FROM truth t
      JOIN customer a ON a.c_name = t.name_a
      JOIN customer b ON b.c_name = t.name_b),
    nonmatch_m AS MATERIALIZED (SELECT * FROM nonmatch),
    mpairs_m AS MATERIALIZED (SELECT * FROM mpairs),
    magg AS MATERIALIZED (
      SELECT CAST(sum(CASE WHEN na = nb THEN 1 ELSE 0 END) AS BIGINT)
               AS a_nat,
             CAST(sum(CASE WHEN levenshtein(name_a, name_b) <= 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS a_lev,
             CAST(sum(CASE WHEN ma = mb THEN 1 ELSE 0 END) AS BIGINT)
               AS a_seg,
             CAST(count(*) AS BIGINT) AS n
      FROM mpairs_m),
    uagg AS MATERIALIZED (
      SELECT CAST(sum(CASE WHEN na = nb THEN 1 ELSE 0 END) AS BIGINT)
               AS a_nat,
             CAST(sum(CASE WHEN levenshtein(name_a, name_b) <= 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS a_lev,
             CAST(sum(CASE WHEN ma = mb THEN 1 ELSE 0 END) AS BIGINT)
               AS a_seg,
             CAST(count(*) AS BIGINT) AS n
      FROM nonmatch_m),
    -- single-pass sums per side (the old per-field scalar subqueries
    -- re-inlined nonmatch/mpairs SIX times each under DuckDB's
    -- multiple-reference CTE inlining -- the r6 build-notes trap;
    -- 25.8 s -> ~4 s at sf0.1)
    stats AS (
      SELECT 'nation' AS field, m.a_nat AS m_agree, m.n AS m_n,
             u.a_nat AS u_agree, u.n AS u_n
      FROM magg m CROSS JOIN uagg u
      UNION ALL
      SELECT 'name_lev1', m.a_lev, m.n, u.a_lev, u.n
      FROM magg m CROSS JOIN uagg u
      UNION ALL
      SELECT 'mktsegment', m.a_seg, m.n, u.a_seg, u.n
      FROM magg m CROSS JOIN uagg u)
    SELECT field,
           CAST(1000000 * (m_agree + 1) // (m_n + 2) AS BIGINT) AS m_e6,
           CAST(1000000 * (u_agree + 1) // (u_n + 2) AS BIGINT) AS u_e6,
           CAST(floor(1e9 * ln(((CAST(m_agree AS DOUBLE) + 1) / (m_n + 2))
                               / ((CAST(u_agree AS DOUBLE) + 1) / (u_n + 2)))
                + 0.5) AS BIGINT) AS agree_weight_e9,
           CAST(floor(1e9 * ln((1 - (CAST(m_agree AS DOUBLE) + 1) / (m_n + 2))
                               / (1 - (CAST(u_agree AS DOUBLE) + 1) / (u_n + 2)))
                + 0.5) AS BIGINT) AS disagree_weight_e9
    FROM stats
    """,
    tags=("dedup", "entity-resolution", "record-linkage", "exact-arith"),
)
def q_fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter m/u probabilities and log-likelihood weights for
    three comparison fields (module docstring): truth pairs vs a
    deterministic md5-ring non-match sample, Laplace smoothing, one
    e9-quantized ln per cell."""
    from pyspark.sql import Window

    cust = read_table(spark, sf_dir, "customer").select(
        "c_name", "c_nationkey", "c_mktsegment"
    )
    ranked = cust.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.md5("c_name"), "c_name"))
        .cast("bigint")
        .alias("rk"),
    ).localCheckpoint(eager=True)
    n = ranked.count()

    # exact truth pairs via the delete-1 construction
    vars_df = (
        cust.select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_name").alias("name"),
            F.explode(F.expr("sequence(0, length(c_name))")).alias("i"),
        )
        .select(
            "nk",
            "name",
            F.expr(
                "CASE WHEN i = 0 THEN name "
                "ELSE concat(substr(name, 1, i - 1), substr(name, i + 1)) END"
            ).alias("v"),
        )
        .persist()
    )
    bv = vars_df.select(
        F.col("nk").alias("bnk"), F.col("name").alias("bname"), F.col("v").alias("bv")
    )
    truth = (
        vars_df.join(
            bv,
            (F.col("nk") == F.col("bnk"))
            & (F.col("v") == F.col("bv"))
            & (F.col("name") < F.col("bname")),
        )
        .select(F.col("name").alias("name_a"), F.col("bname").alias("name_b"))
        .distinct()
        .where(F.levenshtein("name_a", "name_b") <= 1)
        .localCheckpoint(eager=True)
    )

    offs = spark.createDataFrame([(1,), (2,), (5,)], "off long")
    a = ranked.alias("a")
    bseq = ranked.select(
        F.col("rk").alias("brk"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nb"),
        F.col("c_mktsegment").alias("mb"),
    )
    ring = (
        a.crossJoin(F.broadcast(offs))
        .select(
            F.col("c_name").alias("name_a"),
            F.col("c_nationkey").alias("na"),
            F.col("c_mktsegment").alias("ma"),
            ((F.col("rk") + F.col("off") - 1) % F.lit(n) + 1).alias("brk"),
        )
        .join(bseq, "brk")
        .where(F.col("name_a") != F.col("name_b"))
    )
    tkeys = truth.select(
        F.col("name_a").alias("ta"), F.col("name_b").alias("tb")
    )
    nonmatch = ring.join(
        tkeys,
        (F.least("name_a", "name_b") == F.col("ta"))
        & (F.greatest("name_a", "name_b") == F.col("tb")),
        "left_anti",
    )
    mpairs = (
        truth.join(
            cust.select(
                F.col("c_name").alias("name_a"),
                F.col("c_nationkey").alias("na"),
                F.col("c_mktsegment").alias("ma"),
            ),
            "name_a",
        )
        .join(
            cust.select(
                F.col("c_name").alias("name_b"),
                F.col("c_nationkey").alias("nb"),
                F.col("c_mktsegment").alias("mb"),
            ),
            "name_b",
        )
    )

    def agg3(df):
        """ONE pass computing all three agreement sums + the count --
        the old per-field agg re-ran the (un-checkpointed) pair frames
        three times each (6 jobs, ~29 s at sf0.1)."""
        r = df.agg(
            F.sum(F.when(F.expr("na = nb"), 1).otherwise(0))
            .cast("bigint")
            .alias("a_nat"),
            F.sum(
                F.when(F.expr("levenshtein(name_a, name_b) <= 1"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("a_lev"),
            F.sum(F.when(F.expr("ma = mb"), 1).otherwise(0))
            .cast("bigint")
            .alias("a_seg"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        ).collect()[0]
        return (
            {"nation": int(r["a_nat"]), "name_lev1": int(r["a_lev"]),
             "mktsegment": int(r["a_seg"])},
            int(r["n"]),
        )

    import math

    m_sums, mn = agg3(mpairs)
    u_sums, un = agg3(nonmatch)
    out = []
    for field in ("nation", "name_lev1", "mktsegment"):
        ma_, ua = m_sums[field], u_sums[field]
        m = (ma_ + 1) / (mn + 2)
        u = (ua + 1) / (un + 2)
        out.append(
            (
                field,
                1_000_000 * (ma_ + 1) // (mn + 2),
                1_000_000 * (ua + 1) // (un + 2),
                math.floor(1e9 * math.log(m / u) + 0.5),
                math.floor(1e9 * math.log((1 - m) / (1 - u)) + 0.5),
            )
        )
    return spark.createDataFrame(
        out,
        "field string, m_e6 long, u_e6 long, agree_weight_e9 long,"
        " disagree_weight_e9 long",
    )
