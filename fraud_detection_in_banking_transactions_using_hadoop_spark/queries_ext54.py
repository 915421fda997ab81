"""Extension batch 54: rich-club coefficients and rolling-origin
forecast backtesting.

Scale notes (the 100 TB story per query):
- rich_club_coefficient asks whether high-degree hubs of the near-dup
  graph preferentially connect to EACH OTHER (the rich-club effect
  that makes dedup clusters explode): degrees from one edge groupBy,
  then for each degree cutoff the surviving edge count is two
  semi-joins against the rich-node set -- never an all-pairs check.
  phi(k) in exact ppm.
- rolling_origin_backtest is forecast validation done honestly: four
  expanding-window cutoffs, each fitting the OLS trend on exact
  decimal moments (the conformal/grouped-ols machinery) and scoring
  integer-e6 APE terms on the NEXT year only -- no lookahead, and the
  spread across origins is the stability signal a single backtest
  split hides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries_graph import _SHINGLE_PAIRS_CTE
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_CENTS = "CAST(round(o_totalprice * 100, 0) AS BIGINT)"
_DEC = "decimal(38,0)"
_KS = (1, 2, 3)


# ---------------------------------------------------------------------------
# Rich-club coefficient of the near-dup doc graph.
# ---------------------------------------------------------------------------
_RC_SQL = "\nUNION ALL\n".join(
    f"""
    SELECT CAST({k} AS INTEGER) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM deg WHERE d > {k}) AS n_rich,
           CAST(count(*) AS BIGINT) AS e_rich,
           CASE WHEN (SELECT count(*) FROM deg WHERE d > {k}) < 2 THEN NULL
                ELSE CAST((2000000 * count(*))
                     // ((SELECT count(*) FROM deg WHERE d > {k})
                         * ((SELECT count(*) FROM deg WHERE d > {k}) - 1))
                     AS BIGINT)
           END AS phi_ppm
    FROM e
    JOIN deg da ON e.a = da.n AND da.d > {k}
    JOIN deg db ON e.b = db.n AND db.d > {k}
    """
    for k in _KS
)


@register(
    "rich_club_coefficient",
    f"""
    WITH {_SHINGLE_PAIRS_CTE},
    e AS (SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM pairs WHERE doc_a <> doc_b),
    deg AS (
      SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b FROM e
      ) GROUP BY n
    )
    {_RC_SQL}
    ORDER BY k
    """,
    tags=("graph", "rich-club", "dedup"),
)
def q_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi(k) = 2*E_k / (N_k (N_k - 1)) for degree cutoffs 1..3 on the
    LSH candidate graph: rich nodes from one degree table, surviving
    edges from two equi-joins per cutoff. Rising phi(k) = hubs club
    together = dedup transitive clusters will chain."""
    from pyspark.storagelevel import StorageLevel

    from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8, shingle_w=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=8, band_size=2)
    e = (
        pairs.where(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("a"), F.greatest("doc_a", "doc_b").alias("b")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    outs = []
    for k in _KS:
        rich = deg.where(F.col("d") > k)
        n_rich = rich.agg(F.count(F.lit(1)).cast("bigint").alias("n_rich"))
        e_rich = (
            e.join(rich.select(F.col("n").alias("a")), "a")
            .join(rich.select(F.col("n").alias("b")), "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("e_rich"))
        )
        outs.append(
            n_rich.crossJoin(F.broadcast(e_rich)).select(
                F.lit(k).cast("integer").alias("k"),
                "n_rich",
                "e_rich",
                F.when(F.col("n_rich") < 2, F.lit(None).cast("bigint"))
                .otherwise(
                    F.expr(
                        "CAST((2000000 * e_rich) DIV (n_rich * (n_rich - 1)) AS BIGINT)"
                    )
                )
                .alias("phi_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    out = out.orderBy("k").localCheckpoint(eager=True)
    e.unpersist()
    deg.unpersist()
    return out


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest of the daily-revenue trend.
# ---------------------------------------------------------------------------
_CUTOFFS = ("1997-01-01", "1998-01-01", "1999-01-01", "2000-01-01")


def _origin_sql(cut: str) -> str:
    return f"""
    SELECT '{cut}' AS cutoff,
           (SELECT CAST(count(*) AS BIGINT) FROM days
            WHERE d < DATE '{cut}') AS n_train,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CAST(round(1000000.0 * abs(
               CAST(y AS DOUBLE)
               - ((SELECT (CAST(sy AS DOUBLE)
                     - CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                   FROM s_{cut.replace("-", "_")})
                  + (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                     FROM s_{cut.replace("-", "_")}) * CAST(x AS DOUBLE)))
               / CAST(y AS DOUBLE), 0) AS BIGINT)) // count(*) AS BIGINT)
             AS mape_e6
    FROM days
    WHERE d >= DATE '{cut}'
      AND d < DATE '{cut}' + INTERVAL 365 DAY AND y > 0
    """


_S_CTES = ",\n".join(
    f"""
    s_{cut.replace("-", "_")} AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM days WHERE d < DATE '{cut}'
    )"""
    for cut in _CUTOFFS
)

_ORIGINS_SQL = "\nUNION ALL\n".join(_origin_sql(c) for c in _CUTOFFS)


@register(
    "rolling_origin_backtest",
    f"""
    WITH days AS (
      SELECT o_orderdate AS d,
             CAST(date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) AS HUGEINT) AS x,
             CAST(sum({_CENTS}) AS HUGEINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    {_S_CTES}
    {_ORIGINS_SQL}
    ORDER BY cutoff
    """,
    tags=("timeseries", "backtest", "forecasting"),
)
def q_rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four expanding-window origins: OLS trend on exact decimal
    moments of the training window, e6-integer APE terms on the next
    365 days (zero-revenue days excluded), exact integer MAPE means.
    The origin-to-origin spread is the honest forecast-stability
    number."""
    orders = read_table(spark, sf_dir, "orders")
    days = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.expr(_CENTS)).cast(_DEC).alias("y")
    ).withColumn(
        "x",
        F.datediff(F.col("d").cast("date"), F.lit("1995-01-01").cast("date")).cast(_DEC),
    )
    outs = []
    for cut in _CUTOFFS:
        cutd = F.lit(cut).cast("date")
        tr = days.where(F.col("d") < cutd)
        s = tr.agg(
            F.count(F.lit(1)).cast(_DEC).alias("n"),
            F.sum("x").cast(_DEC).alias("sx"),
            F.sum("y").cast(_DEC).alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast(_DEC).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast(_DEC).alias("sxx"),
        )
        b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        ).cast("double")
        a = (F.col("sy").cast("double") - b * F.col("sx").cast("double")) / F.col(
            "n"
        ).cast("double")
        fit = s.select(b.alias("b"), a.alias("a"))
        n_train = tr.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
        te = days.where(
            (F.col("d") >= cutd)
            & (F.col("d") < F.date_add(cutd, 365))
            & (F.col("y") > 0)
        ).crossJoin(F.broadcast(fit))
        ape = F.round(
            F.lit(1000000.0)
            * F.abs(
                F.col("y").cast("double")
                - (F.col("a") + F.col("b") * F.col("x").cast("double"))
            )
            / F.col("y").cast("double"),
            0,
        ).cast("bigint")
        agg = te.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr(
                f"CAST(sum(CAST(round(1000000.0 * abs(CAST(y AS DOUBLE)"
                f" - (a + b * CAST(x AS DOUBLE))) / CAST(y AS DOUBLE), 0)"
                f" AS BIGINT)) DIV count(*) AS BIGINT)"
            ).alias("mape_e6"),
        )
        outs.append(
            n_train.crossJoin(F.broadcast(agg)).select(
                F.lit(cut).alias("cutoff"), "n_train", "n_test", "mape_e6"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("cutoff")
