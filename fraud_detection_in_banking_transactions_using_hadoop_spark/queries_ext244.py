"""Extension batch 244 (round 11): cache-replacement replay -- LRU vs
Belady's OPT, the systems-analytics classic (how good is the cache
policy against the clairvoyant optimum on this real access trace).

Trace: each day's first {_TRACE} events in arrival order, page id =
user_id % {_PAGES} (a FIXED-LENGTH trace window per day, so the
sequential oracle replay is scale-free by construction -- the r10
sweep-wall discipline; the window bound is part of the statistic's
definition, not a silent cap). Cache size {_C}.

- LRU: state = recency list (<= {_C} pages, most-recent first); hit
  moves to front, miss inserts at front and evicts the tail.
- Belady/OPT: each position's NEXT-USE index is precomputed by a
  lead-over-(day,page) window (distributed, exact); the fold carries
  (page, nextuse) pairs and evicts the max (nextuse, page) -- the
  farthest-future-use rule with a deterministic page-id tiebreak for
  never-again pages.

Both folds run per day: Spark distributes across days and replays
each day's window in arrival order (applyInPandas, the MG shape); the
oracle replays the identical recursion as ONE recursive CTE whose
per-level join is the 30-row per-day position-list table (never the
event table). The OPT-dominance law (belady_hits >= lru_hits, proven
by the exchange argument) is emitted as a hash-checked flag and
fuzz-pinned in tests/test_ext244_invariants.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import register
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table

_C = 8
_PAGES = 64
_TRACE = 2000
_BIG = 10**9


def lru_fold(pages, c=_C):
    cache: list[int] = []
    hits = 0
    for p in pages:
        if p in cache:
            hits += 1
            cache.remove(p)
            cache.insert(0, p)
        else:
            cache.insert(0, p)
            if len(cache) > c:
                cache.pop()
    return hits


def belady_fold(pages, nextuse, c=_C):
    cache: dict[int, int] = {}
    hits = 0
    for p, nu in zip(pages, nextuse):
        if p in cache:
            hits += 1
            cache[p] = nu
        else:
            if len(cache) >= c:
                victim = max(cache, key=lambda q: (cache[q], q))
                del cache[victim]
            cache[p] = nu
    return hits


_CACHE_ORACLE = f"""
    WITH RECURSIVE ev AS (
      SELECT CAST(ts AS DATE) AS day, user_id % {_PAGES} AS pg,
             row_number() OVER (PARTITION BY CAST(ts AS DATE)
               ORDER BY ts, event_id) AS rn
      FROM events),
    win AS (SELECT * FROM ev WHERE rn <= {_TRACE}),
    nu AS (
      SELECT day, pg, rn,
             coalesce(lead(rn) OVER (PARTITION BY day, pg ORDER BY rn),
                      {_BIG}) AS nxt
      FROM win),
    arr AS MATERIALIZED (
      SELECT day, list(pg ORDER BY rn) AS pgs,
             list(nxt ORDER BY rn) AS nus,
             CAST(count(*) AS BIGINT) AS n
      FROM nu GROUP BY day),
    fold AS (
      SELECT day, CAST(0 AS BIGINT) AS i,
             CAST([] AS BIGINT[]) AS lru,
             CAST([] AS STRUCT(pg BIGINT, nu BIGINT)[]) AS bel,
             CAST(0 AS BIGINT) AS lru_h, CAST(0 AS BIGINT) AS bel_h
      FROM arr
      UNION ALL
      SELECT day, i + 1,
             -- LRU update: hit -> move to front; miss -> push, trim
             CASE WHEN list_contains(lru, p)
                  THEN list_prepend(p, list_filter(lru, q -> q <> p))
                  ELSE list_prepend(p, lru)[1:{_C}] END,
             -- Belady update: hit -> refresh nextuse; miss -> evict
             -- max (nextuse, pg) when full, insert
             CASE WHEN len(list_filter(bel, b -> b.pg = p)) > 0
                  THEN list_append(list_filter(bel, b -> b.pg <> p),
                                   struct_pack(pg := p, nu := u))
                  WHEN len(bel) < {_C}
                  THEN list_append(bel, struct_pack(pg := p, nu := u))
                  ELSE list_append(list_filter(bel, b ->
                         NOT (b.nu = mx_nu AND b.pg = vmax_pg_raw)),
                       struct_pack(pg := p, nu := u)) END,
             lru_h + CASE WHEN list_contains(lru, p) THEN 1 ELSE 0 END,
             bel_h + CASE WHEN len(list_filter(bel, b -> b.pg = p)) > 0
                          THEN 1 ELSE 0 END
      FROM (
        SELECT f.day, f.i, f.lru, f.bel, f.lru_h, f.bel_h,
               a.pgs[CAST(f.i + 1 AS INTEGER)] AS p,
               a.nus[CAST(f.i + 1 AS INTEGER)] AS u,
               list_aggregate(list_transform(f.bel, b -> b.nu), 'max')
                 AS mx_nu,
               list_aggregate(list_transform(
                 list_filter(f.bel, b ->
                   b.nu = list_aggregate(list_transform(f.bel,
                     b2 -> b2.nu), 'max')),
                 b -> b.pg), 'max') AS vmax_pg_raw
        FROM fold f JOIN arr a ON a.day = f.day
        WHERE f.i < a.n)),
    fin AS (
      SELECT f.day, f.lru_h, f.bel_h, a.n FROM fold f
      JOIN arr a ON a.day = f.day WHERE f.i = a.n)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           n AS n_accesses,
           lru_h AS lru_hits,
           bel_h AS belady_hits,
           CAST(bel_h >= lru_h AS INTEGER) AS opt_dominates,
           CAST(1000000 * lru_h // n AS BIGINT) AS lru_hit_ppm,
           CAST(1000000 * bel_h // n AS BIGINT) AS belady_hit_ppm
    FROM fin
"""

_OUT_SCHEMA = (
    "day STRING, n_accesses LONG, lru_hits LONG, belady_hits LONG,"
    " opt_dominates INT, lru_hit_ppm LONG, belady_hit_ppm LONG"
)


@register(
    "cache_replay_lru_belady",
    _CACHE_ORACLE,
    tags=("systems", "cache", "stateful", "exact-arith"),
)
def q_cache_replay_lru_belady(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day LRU vs Belady hit counts on the fixed-length user-page
    trace (module docstring): distributed across days, exact
    sequential replay within each, next-use indices from a lead
    window; OPT dominance hash-checked."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("ts").cast("date")).orderBy("ts", "event_id")
    win = (
        ev.select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            F.expr(f"user_id % {_PAGES}").alias("pg"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= _TRACE)
    )
    nu = win.select(
        "*",
        F.coalesce(
            F.lead("rn").over(
                Window.partitionBy("day", "pg").orderBy("rn")
            ),
            F.lit(_BIG),
        ).alias("nxt"),
    )

    def fold_day(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        pages = [int(x) for x in pdf["pg"]]
        nus = [int(x) for x in pdf["nxt"]]
        n = len(pages)
        lh = lru_fold(pages)
        bh = belady_fold(pages, nus)
        return pd.DataFrame(
            [
                (
                    pdf["day"].iloc[0],
                    n,
                    lh,
                    bh,
                    int(bh >= lh),
                    1_000_000 * lh // n,
                    1_000_000 * bh // n,
                )
            ],
            columns=[c.split(" ")[0] for c in _OUT_SCHEMA.split(", ")],
        )

    return nu.groupBy("day").applyInPandas(fold_day, schema=_OUT_SCHEMA)
