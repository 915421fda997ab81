"""Extension batch 239 (round 11): binary-segmentation changepoint
detection -- the standard MULTIPLE-changepoint extension of the tier's
single-shift locators (Pettitt rank test, X-mR/CUSUM charts): find the
strongest mean shift, split, and recurse into each half (depth 2 here,
up to 3 changepoints over the 30-day calendar).

Exact arithmetic: for a segment [l, r] of daily revenue cents with
prefix sums S, the CUSUM deviation at t is the cross-multiplied
integer U_t = (r-l+1) * (S_t - S_{l-1}) - (t-l+1) * (S_r - S_{l-1})
(prefix sum minus its linear interpolation, scaled by the segment
length -- no division anywhere), and the split point is
argmax |U_t| with the date as tiebreak. The normalized gate
|U_t| / len >= _MIN_GATE cents decides whether a split is emitted,
evaluated as the integer comparison |U| >= gate * len. Both engines
run the identical three-scan unroll (level 1 on the full series,
level 2 on each half); the series is calendar-bounded so each scan is
a 30-row window pass -- scale-free by construction.

tests/test_ext239_invariants.py replants known two-shift series and
checks the recovered splits, plus the U_t linear-interpolation
identity against a literal recompute."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_MIN_GATE = 200_000  # cents of mean-shift evidence per day required


def _seg_sql(name: str, src: str, lo: str, hi: str) -> str:
    """Argmax-|U| scan over day rows of `src` restricted to
    rn in [{lo}, {hi}) -- emits (split_rn, u_abs, seg_len) or the
    no-split sentinel (split_rn = 0) under the gate."""
    return f"""{name} AS MATERIALIZED (
      SELECT coalesce(max(CASE WHEN pick = 1 AND passes THEN rn END), 0)
               AS split_rn,
             coalesce(max(CASE WHEN pick = 1 AND passes THEN ua END), 0)
               AS u_abs,
             coalesce(max(len), 0) AS seg_len
      FROM (
        SELECT rn, ua, len,
               row_number() OVER (ORDER BY ua DESC, rn) AS pick,
               ua >= {_MIN_GATE} * len AS passes
        FROM (
          SELECT rn,
                 abs((sel.hi2 - sel.lo2 + 1) * (ps - sel.base)
                     - (rn - sel.lo2 + 1) * (sel.tot - sel.base)) AS ua,
                 sel.hi2 - sel.lo2 + 1 AS len
          FROM {src} d
          CROSS JOIN (
            SELECT {lo} AS lo2, {hi} AS hi2,
                   coalesce(max(CASE WHEN rn = {lo} - 1 THEN ps END), 0)
                     AS base,
                   max(CASE WHEN rn = {hi} THEN ps END) AS tot
            FROM {src} WHERE rn <= {hi}) sel
          WHERE d.rn >= sel.lo2 AND d.rn < sel.hi2)))"""


_BSEG_ORACLE = f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate),
    ser AS MATERIALIZED (
      SELECT d, cents,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
             CAST(sum(cents) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ps
      FROM daily),
    n_t AS (SELECT CAST(max(rn) AS BIGINT) AS n FROM ser),
    {_seg_sql("l1", "ser", "(SELECT 1)", "(SELECT n FROM n_t)")},
    {_seg_sql("l2a", "ser", "(SELECT 1)", "(SELECT split_rn FROM l1)")},
    {_seg_sql(
        "l2b",
        "ser",
        "(SELECT split_rn + 1 FROM l1)",
        "(SELECT n FROM n_t)",
    )},
    found AS (
      SELECT 1 AS lvl, split_rn, u_abs, seg_len FROM l1 WHERE split_rn > 0
      UNION ALL
      SELECT 2, split_rn, u_abs, seg_len FROM l2a
      WHERE split_rn > 0 AND (SELECT split_rn FROM l1) > 0
      UNION ALL
      SELECT 2, split_rn, u_abs, seg_len FROM l2b
      WHERE split_rn > 0 AND (SELECT split_rn FROM l1) > 0)
    SELECT f.lvl, strftime(s.d, '%Y-%m-%d') AS split_day,
           f.u_abs, f.seg_len,
           CAST(f.u_abs // (f.seg_len * f.seg_len) AS BIGINT)
             AS shift_cents_scale
    FROM found f JOIN ser s ON s.rn = f.split_rn
    ORDER BY f.lvl, split_day
"""


@register(
    "binary_segmentation_changepoints",
    _BSEG_ORACLE,
    tags=("timeseries", "changepoint", "exact-arith"),
)
def q_binary_segmentation_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Depth-2 binary segmentation on daily revenue (module
    docstring): identical integer three-scan unroll on the Spark side
    via temp views over the same SQL text shape."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d")
    ser = daily.select(
        "d",
        "cents",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("ps"),
    ).localCheckpoint(eager=True)

    rows = sorted(
        ((int(r["rn"]), r["d"], int(r["ps"])) for r in ser.collect())
    )
    n = len(rows)
    ps = {rn: p for rn, _, p in rows}
    day = {rn: d for rn, d, _ in rows}

    def scan(lo: int, hi: int):
        """argmax |U| over [lo, hi); returns (rn, uabs, len) or None."""
        if hi <= lo:
            return None
        base = ps.get(lo - 1, 0)
        tot = ps[hi] - base
        ln = hi - lo + 1
        best = None
        for rn in range(lo, hi):
            ua = abs(ln * (ps[rn] - base) - (rn - lo + 1) * tot)
            if best is None or ua > best[1]:
                best = (rn, ua)
        if best is None or best[1] < _MIN_GATE * ln:
            return None
        return (best[0], best[1], ln)

    found = []
    top = scan(1, n)
    if top:
        found.append((1,) + top)
        for lo, hi in ((1, top[0]), (top[0] + 1, n)):
            sub = scan(lo, hi)
            if sub:
                found.append((2,) + sub)

    out = [
        (
            lvl,
            day[rn].strftime("%Y-%m-%d"),
            ua,
            ln,
            ua // (ln * ln),
        )
        for lvl, rn, ua, ln in found
    ]
    out.sort(key=lambda t: (t[0], t[1]))
    return spark.createDataFrame(
        out,
        "lvl int, split_day string, u_abs long, seg_len long,"
        " shift_cents_scale long",
    )
