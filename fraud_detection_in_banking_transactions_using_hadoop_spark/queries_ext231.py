"""Extension batch 231 (round 11): the fuzzy_name_match scale twin.

fuzzy_name_match (queries_funcs2.py) blocks its levenshtein self-join
on c_nationkey, whose cardinality is FIXED at 25 -- cost sum|block|^2 =
O(n^2/25), measured 0.7 s -> 39.1 s across the sf0.01 -> sf0.1 step
(log-slope ~1.7, the r10 verdict's one plan-level weak).

fuzzy_name_match_djoin computes the IDENTICAL result (same rows, same
columns) with the delete-1 neighborhood join (the FastSS / SymSpell
candidate generation): two strings are at levenshtein distance <= 1
IFF their deletion neighborhoods D(x) = {x} + {x with one char
deleted} intersect --
  * dist 0: x itself is shared;
  * substitution at position i: deleting position i from both yields
    the same string;
  * insertion/deletion: deleting the inserted char from the longer
    string yields the shorter string, which is in its own D().
(The converse does not hold -- transpositions like 'ab'/'ba' also
collide -- so the levenshtein VERIFIER after the join is load-bearing,
not decorative; completeness is what the candidate stage guarantees.)
So the candidate stage is an EQUI-join on (nation, variant) over
n * (L+1) variant rows (L = name length, 18 here), followed by the
levenshtein verifier on the deduplicated candidates. Cost is linear in
n (each name's variants are near-unique), not quadratic in block
density: at 100x rows each variant bucket stays O(1), where the
nation-block join does 10,000x the comparisons.

The oracle runs the same delete-join in DuckDB SQL; an invariant
pytest asserts set-equality with the original fuzzy_name_match output,
so the twin is provably exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


@register(
    "fuzzy_name_match_djoin",
    """
    WITH vars AS (
      SELECT c_nationkey AS nk, c_name AS name,
             CASE WHEN i = 0 THEN c_name
                  ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
             END AS v
      FROM customer,
           LATERAL (SELECT unnest(range(0, length(c_name) + 1)) AS i) t
    ),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM vars a JOIN vars b
        ON a.nk = b.nk AND a.v = b.v AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
    tags=("functions", "fuzzy", "dedup", "scale-twin"),
)
def q_fuzzy_name_match_djoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-1-neighborhood twin of fuzzy_name_match: equi-join on
    (nation, deletion variant) generates a candidate set PROVABLY
    complete for levenshtein <= 1; the verifier then filters exact.
    n*(L+1) variant rows, near-unique join keys -> linear scaling where
    the nation-block join is quadratic in density.

    r14 (verdict item 6): the self-join shuffled the n*(L+1)-row
    variants frame TWICE (both SMJ sides) plus a third exchange for the
    candidate distinct, with the frame persisted to stop lineage
    recompute. A bucket is just the set of distinct names sharing one
    (nation, variant) key, so ONE groupBy exchange + a per-bucket pair
    expansion produces the identical candidate set: sort_array of the
    distinct names gives every x < y pair exactly as the a.name <
    b.name join did, size-1 buckets (the overwhelming majority --
    near-unique keys) are pruned BEFORE any pair row exists, and the
    tiny survivor set still passes through DISTINCT + the levenshtein
    verifier. 3 exchanges of 285k rows + persist -> 1 exchange + a
    few-hundred-row tail; results provably identical (the candidate
    sets are equal as sets, pinned by test_ext231_invariants)."""
    cust = read_table(spark, sf_dir, "customer").select("c_nationkey", "c_name")
    vars_df = cust.select(
        "c_nationkey",
        "c_name",
        F.explode(F.expr("sequence(0, length(c_name))")).alias("i"),
    ).select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_name").alias("name"),
        F.expr(
            "CASE WHEN i = 0 THEN c_name "
            "ELSE concat(substr(c_name, 1, i - 1), substr(c_name, i + 1)) END"
        ).alias("v"),
    )
    buckets = (
        vars_df.groupBy("nk", "v")
        .agg(F.sort_array(F.collect_set("name")).alias("names"))
        .where(F.size("names") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(names, (x, i) ->"
                    " transform(slice(names, i + 2, size(names) - i - 1),"
                    " y -> struct(x AS name_a, y AS name_b))))"
                )
            ).alias("p")
        )
        .select("p.name_a", "p.name_b")
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.filter(dist <= 1).select(
        "name_a", "name_b", dist.cast("int").alias("dist")
    )
