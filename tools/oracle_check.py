"""Local replica of the driver's correctness gate: run every registered
query through Spark AND through DuckDB (oracle SQL) on the same parquet
tables, then compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    import pandas as pd

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if hasattr(v, "item"):
        return canon_value(v.item())
    return str(v)


def canon_rows(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(canon_value(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def main() -> int:
    import duckdb

    from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql
    from fraud_detection_in_banking_transactions_using_hadoop_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_skip = 0
    for q in registry():
        if only and q.name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {q.name}: spark error: {e}")
            n_fail += 1
            continue
        if q.sql is None:
            print(f"SKIP {q.name}: no oracle (rows-only), spark rows={len(sdf)}")
            n_skip += 1
            continue
        try:
            ddf = con.execute(resolve_sql(q, sf_dir)).df()
        except Exception as e:
            print(f"FAIL {q.name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0

        s_cols, s_rows = canon_rows(sdf)
        d_cols, d_rows = canon_rows(ddf)
        problems = []
        if s_cols != d_cols:
            problems.append(f"columns {s_cols} != {d_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        elif s_cols == d_cols and s_rows != d_rows:
            n_bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            example = next((a, b) for a, b in zip(s_rows, d_rows) if a != b)
            problems.append(f"{n_bad}/{len(s_rows)} rows differ, e.g. {example}")
        if problems:
            print(f"FAIL {q.name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {q.name}: rows={len(s_rows)} ({dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
