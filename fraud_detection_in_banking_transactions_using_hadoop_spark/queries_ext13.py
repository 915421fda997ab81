"""Extension batch 13: anti range join, data-contract validation,
storage compressibility profiling, transform-exact generalized means,
and weighted min-plus shortest paths.

Scale notes:
- The orphan-purchase screen (purchase with no view in the preceding
  hour) avoids the anti RANGE join: views and purchases union into one
  per-user stream, a conditional last() IGNORE NULLS carries the most
  recent view timestamp forward, and the flag is a row-local integer
  microsecond comparison. One user exchange; the oracle runs the
  literal NOT EXISTS range join, so the hash gate checks the rewrite.
- Contract validation is one conditional-aggregation pass per table
  (six 1-row rule summaries unioned).
- RLE profiling sorts once over a deterministic total order and counts
  value-change boundaries for three columns in the SAME window -- the
  sortedness diagnostic behind run-length/delta encoding choices
  (cousin of zorder_locality's min/max narrowing).
- Generalized means make log/reciprocal transforms SAFE for the exact
  gate by scaling each per-row transform to an integer (ln -> e8,
  1/x -> e12) before summation: identical doubles in, exact integer
  accumulation, one closing expression out -- the same trick as the
  MAPE backtest.
- Min-plus shortest paths unrolls 3 Bellman-Ford relaxations as
  join + groupBy-min over integer edge weights (the weighted cousin of
  label_propagation; same localCheckpoint lineage cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.rank import with_global_rank
from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


# ---------------------------------------------------------------------------
# Purchases with no view by the same user within the preceding hour --
# the anti-range-join as a union-window rewrite.
# ---------------------------------------------------------------------------
@register(
    "purchase_without_view",
    """
    SELECT p.user_id, p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events p
    WHERE p.event_type = 'purchase'
      AND NOT EXISTS (
        SELECT 1 FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view'
          AND v.ts <= p.ts
          AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
      )
    """,
    tags=("anti-join", "range", "fraud"),
)
def q_purchase_without_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud screen: purchases that arrive with no browsing context (no
    view in the trailing hour). Instead of an anti range join, views
    and purchases interleave in one per-user stream ordered by
    (ts, kind, event_id) -- views sort before purchases on timestamp
    ties -- and last(view_ts) IGNORE NULLS carries the latest view
    forward; the orphan test is then a local integer-microsecond
    comparison. The oracle runs the literal NOT EXISTS range join."""
    ev = read_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id"),
        F.unix_micros("ts").alias("v_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("v_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = views.unionByName(purchases).select(
        "user_id",
        "ts",
        "kind",
        "event_id",
        F.last("v_us", ignorenulls=True).over(w).alias("last_view_us"),
    )
    return (
        tagged.where(F.col("kind") == 1)
        .where(
            F.col("last_view_us").isNull()
            | (F.unix_micros("ts") - F.col("last_view_us") > 3_600_000_000)
        )
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Data-contract validation: six declarative rules, one summary row
# each with violation counts.
# ---------------------------------------------------------------------------
@register(
    "contract_violations",
    """
    SELECT 'orders.totalprice > 0' AS rule, CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.status in enum', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.date in range', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1992-01-01'
                          AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
                         THEN 0 ELSE 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.quantity in [1,50]', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.discount in [0,0.1]', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events.props is object', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN regexp_matches(props, '^\\{.*\\}$') THEN 0 ELSE 1 END)
                AS BIGINT)
    FROM events
    """,
    tags=("dq", "contract", "A1"),
)
def q_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data contract: range, enum, date-window, and shape
    rules each become one conditional aggregation (map-side
    combinable, no row ever leaves the scan except as a count). The
    summary unions six 1-row frames -- the pattern a contract runner
    compiles rules into."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")

    def rule(df, name, ok):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias("n_violations"),
        )

    return (
        rule(orders, "orders.totalprice > 0", F.col("o_totalprice") > 0)
        .unionByName(
            rule(orders, "orders.status in enum", F.col("o_orderstatus").isin("F", "O", "P"))
        )
        .unionByName(
            rule(
                orders,
                "orders.date in range",
                (F.col("o_orderdate").cast("date") >= F.lit("1992-01-01").cast("date"))
                & (F.col("o_orderdate").cast("date") < F.lit("1999-01-01").cast("date")),
            )
        )
        .unionByName(
            rule(
                li,
                "lineitem.quantity in [1,50]",
                (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            )
        )
        .unionByName(
            rule(
                li,
                "lineitem.discount in [0,0.1]",
                (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            )
        )
        .unionByName(
            rule(ev, "events.props is object", F.col("props").rlike("^\\{.*\\}$"))
        )
    )


# ---------------------------------------------------------------------------
# Run-length compressibility: value-change boundaries per column over
# a deterministic scan order -- the sortedness diagnostic behind
# encoding choices.
# ---------------------------------------------------------------------------
@register(
    "rle_compressibility",
    """
    WITH ordered AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS shipmonth,
             lag(l_returnflag) OVER w AS p_rf,
             lag(l_linestatus) OVER w AS p_ls,
             lag(CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR)) OVER w AS p_sm
      FROM lineitem
      WINDOW w AS (ORDER BY l_orderkey * 100 + l_linenumber, l_quantity,
                   l_extendedprice, l_returnflag, l_linestatus,
                   CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR))
    )
    SELECT 'l_returnflag' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN p_rf IS NULL OR rf <> p_rf THEN 1 ELSE 0 END)
                AS BIGINT) AS n_runs,
           round(CAST(sum(CASE WHEN p_rf IS NULL OR rf <> p_rf THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS run_ratio
    FROM ordered
    UNION ALL
    SELECT 'l_linestatus', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_ls IS NULL OR ls <> p_ls THEN 1 ELSE 0 END) AS BIGINT),
           round(CAST(sum(CASE WHEN p_ls IS NULL OR ls <> p_ls THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6)
    FROM ordered
    UNION ALL
    SELECT 'shipmonth', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_sm IS NULL OR shipmonth <> p_sm THEN 1 ELSE 0 END)
                AS BIGINT),
           round(CAST(sum(CASE WHEN p_sm IS NULL OR shipmonth <> p_sm THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6)
    FROM ordered
    """,
    tags=("storage", "profiling", "layout"),
)
def q_rle_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How run-length-friendly is each column under the table's natural
    key order? Runs = change boundaries + 1st row, counted against each
    row's PREDECESSOR under the deterministic total order. The
    predecessor is found WITHOUT a single-task global sort: every row
    gets its exact global rank from operators/rank.with_global_rank
    (two-level plan), and lag() becomes a distributed equi-join on
    rank = rank - 1 -- the scale path for fact-grain adjacency. (The
    synthetic key stays < 2^53, so the operator's double-ranged bucket
    join is exact.) Three unioned summaries share the ranked pass.
    The synthetic key COLLIDES in this testdata (CLAUDE.md), so the
    three compared columns are appended to the order: any residual tie
    then has identical (rf, ls, shipmonth), and permutations inside it
    cannot change a run boundary -- the counts are deterministic even
    without a fully-unique key."""
    li = read_table(spark, sf_dir, "lineitem")
    sm = F.date_format("l_shipdate", "yyyy-MM")
    keyed = li.select(
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("k"),
        "l_quantity",
        "l_extendedprice",
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        sm.alias("shipmonth"),
    )
    ranked = with_global_rank(
        keyed,
        "k",
        [
            F.col("k"),
            F.col("l_quantity"),
            F.col("l_extendedprice"),
            F.col("rf"),
            F.col("ls"),
            F.col("shipmonth"),
        ],
        rank_col="r",
    ).select("r", "rf", "ls", "shipmonth")
    prev = ranked.select(
        (F.col("r") + 1).alias("r"),
        F.col("rf").alias("p_rf"),
        F.col("ls").alias("p_ls"),
        F.col("shipmonth").alias("p_sm"),
    )
    ordered = ranked.join(prev, "r", "left")

    # r13 (the r12 fellegi lesson): three per-column .agg() calls each
    # re-ran the rank pass + adjacency self-join -- fold ALL boundary
    # counts into ONE aggregate row, pin it, and unpivot with three
    # trivial selects (identical values, one data pass instead of 3).
    def chg(col, prev):
        return F.sum(
            F.when(F.col(prev).isNull() | (F.col(col) != F.col(prev)), 1).otherwise(0)
        )

    onerow = ordered.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        chg("rf", "p_rf").cast("bigint").alias("c_rf"),
        chg("ls", "p_ls").cast("bigint").alias("c_ls"),
        chg("shipmonth", "p_sm").cast("bigint").alias("c_sm"),
    ).localCheckpoint(eager=True)

    def row_of(name, c):
        return onerow.select(
            F.lit(name).alias("col"),
            "n_rows",
            F.col(c).alias("n_runs"),
            F.round(F.col(c).cast("double") / F.col("n_rows"), 6).alias(
                "run_ratio"
            ),
        )

    return (
        row_of("l_returnflag", "c_rf")
        .unionByName(row_of("l_linestatus", "c_ls"))
        .unionByName(row_of("shipmonth", "c_sm"))
    )


# ---------------------------------------------------------------------------
# Generalized means (arithmetic / geometric / harmonic) of order
# totals, with transforms scaled to exact integers before summation.
# ---------------------------------------------------------------------------
@register(
    "generalized_means",
    """
    WITH t AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(round(ln(o_totalprice) * 1e8, 0) AS BIGINT) AS ln_e8,
             CAST(round(1.0 / o_totalprice * 1e12, 0) AS BIGINT) AS inv_e12
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(round(sum(cents) / 100.0, 4) / count(*), 4) AS arithmetic_mean,
           round(exp(CAST(sum(ln_e8) AS DOUBLE) / count(*) / 1e8), 4)
             AS geometric_mean,
           round(count(*) / (CAST(sum(inv_e12) AS DOUBLE) / 1e12), 4)
             AS harmonic_mean
    FROM t
    """,
    tags=("A1", "means", "exact-arith"),
)
def q_generalized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means with cross-engine-exact
    accumulation: ln(x) and 1/x are identical doubles in both engines,
    but their SUMS would depend on accumulation order -- so each
    per-row transform rounds to an integer grid first (e8 for logs,
    e12 for reciprocals) and the sums become exact integer arithmetic;
    one exp/division closes each mean. Grid error is bounded by
    n * 5e-9 in log space -- invisible at round(4)."""
    orders = read_table(spark, sf_dir, "orders")
    t = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.round(F.log(F.col("o_totalprice")) * 1e8, 0).cast("bigint").alias("ln_e8"),
        F.round(1.0 / F.col("o_totalprice") * 1e12, 0).cast("bigint").alias("inv_e12"),
    )
    n = F.count(F.lit(1))
    return t.agg(
        n.cast("bigint").alias("n"),
        F.round(F.round(F.sum("cents") / 100.0, 4) / n, 4).alias("arithmetic_mean"),
        F.round(F.exp(F.sum("ln_e8").cast("double") / n / 1e8), 4).alias("geometric_mean"),
        F.round(n / (F.sum("inv_e12").cast("double") / 1e12), 4).alias("harmonic_mean"),
    )


# ---------------------------------------------------------------------------
# Weighted min-plus shortest paths: 3 Bellman-Ford relaxations from
# seed parts over the co-purchase graph with integer edge weights.
# ---------------------------------------------------------------------------
@register(
    "min_plus_shortest_paths",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey < 300
    ),
    e0 AS (
      SELECT a.p AS x, b.p AS y, CAST(count(*) AS BIGINT) AS c
      FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
      GROUP BY a.p, b.p
    ),
    e AS (SELECT x, y, greatest(1, 10 - c) AS w FROM e0),
    d0 AS (
      SELECT DISTINCT x AS node, CAST(0 AS BIGINT) AS dist FROM e WHERE x < 5
    ),
    d1 AS (
      SELECT n.node, min(n.dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT e.y AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.x = d0.node
      ) n GROUP BY n.node
    ),
    d2 AS (
      SELECT n.node, min(n.dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT e.y AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.x = d1.node
      ) n GROUP BY n.node
    ),
    d3 AS (
      SELECT n.node, min(n.dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT e.y AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.x = d2.node
      ) n GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist FROM d3
    """,
    tags=("graph", "shortest-path", "bellman-ford"),
)
def q_min_plus_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source (multi-seed) shortest paths with affinity-derived
    integer weights (strong co-purchase = cheap edge): three unrolled
    Bellman-Ford relaxations, each one join + union + groupBy-min --
    the min-plus matrix-vector product in batch algebra. Integer
    weights keep the oracle exact; the edge table localCheckpoints
    once to cut the doubling lineage (EAGER set, same as
    label_propagation)."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 300)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select("x", "y", F.greatest(F.lit(1), F.lit(10) - F.col("c")).alias("w"))
        .localCheckpoint(eager=True)
    )
    d = (
        e.where(F.col("x") < 5)
        .select(F.col("x").alias("node"))
        .distinct()
        .select("node", F.lit(0).cast("bigint").alias("dist"))
    )
    for _ in range(3):
        relaxed = d.join(e, d.node == e.x).select(
            F.col("y").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    return d.select(F.col("node").cast("bigint").alias("node"), "dist")
