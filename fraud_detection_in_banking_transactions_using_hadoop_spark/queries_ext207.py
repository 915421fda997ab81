"""Extension batch 207 (round 8): data-layout sharding math and the
Wright experience curve.

- rendezvous_shard_balance / rendezvous_reshard_movement: Highest-
  Random-Weight (rendezvous) hashing -- the shard-assignment scheme
  whose selling point at 100 TB is MINIMAL RESHUFFLE: adding a node
  moves only the keys the new node wins (~1/(n+1) of them), against a
  modulo scheme's ~n/(n+1). Both facts are measured exactly here:
  per-shard balance (chi-square against uniform) for 16 md5-scored
  shards, and the exact moved-key fraction when shard 16 joins (a key
  moves iff the NEW shard's score beats all 16 old ones -- no old
  ranking changes). Deterministic md5 scores, identical both engines;
  the layout-tier companion of zorder_sql / hilbert_locality.

- wrights_experience_curve: ln(unit price) on ln(cumulative volume)
  OLS over the monthly spine -- the classic learning-curve estimator
  (progress ratio 2^b). ln terms are e9-quantized integers before the
  moment sums (engine-order-free, the Fisher-g discipline); slope from
  exact HUGEINT/DECIMAL(38) moments via the shared Cramer form."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_N_SHARDS = 16


def _score_sql(i: int, key: str) -> str:
    return f"md5('{i}:' || CAST({key} AS VARCHAR))"


def _score_spark(i: int, key: str) -> str:
    return f"md5(concat('{i}:', CAST({key} AS STRING)))"


def _assign_sql(key: str, mk, n: int) -> tuple[str, str]:
    """(max-score expr, argmax-shard CASE referencing the _mx lateral
    alias) -- both engines support lateral column aliases."""
    mx = "greatest(" + ", ".join(mk(i, key) for i in range(n)) + ")"
    cases = " ".join(
        f"WHEN {mk(i, key)} = _mx THEN {i}" for i in range(n)
    )
    return f"{mx} AS _mx", f"CASE {cases} END AS shard"


@register(
    "rendezvous_shard_balance",
    f"""
    WITH scored AS (
      SELECT o_orderkey,
             {_assign_sql("o_orderkey", _score_sql, _N_SHARDS)[0]},
             {_assign_sql("o_orderkey", _score_sql, _N_SHARDS)[1]}
      FROM orders),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_keys
      FROM scored GROUP BY shard),
    tot AS (SELECT CAST(sum(n_keys) AS BIGINT) AS n FROM per)
    SELECT CAST(p.shard AS INTEGER) AS shard, p.n_keys,
           round(CAST(p.n_keys AS DOUBLE) / t.n, 6) AS share,
           round((CAST(p.n_keys AS DOUBLE) - CAST(t.n AS DOUBLE)
                  / {_N_SHARDS})
                 * (CAST(p.n_keys AS DOUBLE) - CAST(t.n AS DOUBLE)
                    / {_N_SHARDS})
                 / (CAST(t.n AS DOUBLE) / {_N_SHARDS}), 6)
             AS chisq_contrib
    FROM per p CROSS JOIN tot t
    """,
    tags=("layout", "sharding", "hashing"),
)
def q_rendezvous_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW shard assignment of orderkeys across 16 shards
    (shard = argmax of md5('<i>:' || key), fixed-width hex compared
    lexicographically): per-shard key counts, shares, and chi-square
    contributions against the uniform target -- the balance audit a
    layout owner reads before trusting the scheme."""
    orders = read_table(spark, sf_dir, "orders")
    mx_expr, shard_expr = _assign_sql("o_orderkey", _score_spark, _N_SHARDS)
    scored = orders.selectExpr("o_orderkey", mx_expr, shard_expr)
    per = scored.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    tot = per.agg(F.sum("n_keys").cast("bigint").alias("n"))
    exp = F.col("n").cast("double") / _N_SHARDS
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("shard").cast("int").alias("shard"),
        "n_keys",
        F.round(F.col("n_keys").cast("double") / F.col("n"), 6).alias(
            "share"
        ),
        F.round(
            (F.col("n_keys").cast("double") - exp)
            * (F.col("n_keys").cast("double") - exp)
            / exp,
            6,
        ).alias("chisq_contrib"),
    )


@register(
    "rendezvous_reshard_movement",
    f"""
    WITH scored AS (
      SELECT o_orderkey,
             greatest({", ".join(_score_sql(i, "o_orderkey")
                                 for i in range(_N_SHARDS))}) AS mx_old,
             {_score_sql(_N_SHARDS, "o_orderkey")} AS s_new
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN s_new > mx_old THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           round(CAST(sum(CASE WHEN s_new > mx_old THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS moved_fraction,
           round(1.0 / {_N_SHARDS + 1}, 6) AS expected_fraction
    FROM scored
    """,
    tags=("layout", "sharding", "hashing"),
)
def q_rendezvous_reshard_movement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The rendezvous-hashing reshard guarantee, measured: when shard
    16 joins, a key moves iff the new shard's score beats all 16
    incumbents (incumbent ranking is untouched), so the moved fraction
    concentrates at 1/17 -- vs ~16/17 for modulo assignment. One scan,
    17 md5s per key."""
    orders = read_table(spark, sf_dir, "orders")
    mx_old = "greatest(" + ", ".join(
        _score_spark(i, "o_orderkey") for i in range(_N_SHARDS)
    ) + ")"
    scored = orders.selectExpr(
        "o_orderkey",
        f"{mx_old} AS mx_old",
        f"{_score_spark(_N_SHARDS, 'o_orderkey')} AS s_new",
    )
    moved = F.sum(F.when(F.col("s_new") > F.col("mx_old"), 1).otherwise(0))
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        moved.cast("bigint").alias("n_moved"),
        F.round(
            moved.cast("double") / F.count(F.lit(1)), 6
        ).alias("moved_fraction"),
        F.round(F.lit(1.0 / (_N_SHARDS + 1)), 6).alias("expected_fraction"),
    )


@register(
    "wrights_experience_curve",
    """
    WITH monthly AS (
      SELECT date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT m, cents, qty,
             CAST(sum(qty) OVER (ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumq
      FROM monthly),
    pts AS (
      SELECT CAST(floor(ln(CAST(cumq AS DOUBLE)) * 1e9 + 0.5)
                  AS HUGEINT) AS xq,
             CAST(floor(ln(CAST(cents AS DOUBLE) / (100.0 * qty))
                        * 1e9 + 0.5) AS HUGEINT) AS yq
      FROM cum),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(xq) AS HUGEINT) AS sx,
             CAST(sum(yq) AS HUGEINT) AS sy,
             CAST(sum(xq * yq) AS HUGEINT) AS sxy,
             CAST(sum(xq * xq) AS HUGEINT) AS sxx
      FROM pts)
    SELECT CAST(n AS BIGINT) AS n_months,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0 AS slope_b,
           round(exp(ln(2.0) * (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))), 6)
             AS progress_ratio,
           round(1.0 - exp(ln(2.0) * (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))), 6) + 0.0
             AS learning_pct
    FROM mom
    """,
    tags=("operations", "learning-curve", "regression", "exact-arith"),
)
def q_wrights_experience_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wright's experience curve: OLS of ln(monthly avg unit price) on
    ln(cumulative shipped quantity). slope b maps to the progress
    ratio 2^b (each doubling of cumulative volume multiplies unit cost
    by 2^b; learning_pct = 1 - 2^b). ln terms quantize to e9 integers
    before the moment sums; synthetic prices are volume-independent,
    so b ~ 0 is the expected null here -- the planted pytest proves an
    80% curve is recovered."""
    li = read_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    cum = monthly.select(
        "cents", "qty", F.sum("qty").over(w).cast("bigint").alias("cumq")
    )
    pts = cum.selectExpr(
        "CAST(floor(ln(CAST(cumq AS DOUBLE)) * 1e9 + 0.5)"
        " AS DECIMAL(38,0)) AS xq",
        "CAST(floor(ln(CAST(cents AS DOUBLE) / (100.0 * qty)) * 1e9 + 0.5)"
        " AS DECIMAL(38,0)) AS yq",
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xq").cast("decimal(38,0)").alias("sx"),
        F.sum("yq").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("decimal(38,0)").alias("sxx"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    pr = F.exp(F.log(F.lit(2.0)) * b)
    return mom.select(
        F.col("n").cast("bigint").alias("n_months"),
        (F.round(b, 6) + 0.0).alias("slope_b"),
        F.round(pr, 6).alias("progress_ratio"),
        (F.round(1.0 - pr, 6) + 0.0).alias("learning_pct"),
    )
