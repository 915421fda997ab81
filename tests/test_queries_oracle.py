"""Every registered query must match its DuckDB oracle at sf0.001 --
row count, column names, and order-insensitive canonical values
(the local replica of the driver's t2 gate)."""

from __future__ import annotations

import duckdb
import pytest

from registry_slice import slice_queries

from fraud_detection_in_banking_transactions_using_hadoop_spark.queries import registry, resolve_sql
from tools.oracle_check import TABLES, canon_rows

_QUERIES = slice_queries(registry())
_ORACLED = [q for q in _QUERIES if q.sql is not None]
# schema per query name, populated by test_query_matches_oracle so the
# schema-only assertion below doesn't re-invoke fns that do eager work
# at call time (streaming replays, LSH localCheckpoints)
_SCHEMAS: dict = {}


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("q", _QUERIES, ids=[q.name for q in _QUERIES])
def test_query_matches_oracle(q, spark, sf_dir, oracle):
    df = q.fn(spark, sf_dir)
    _SCHEMAS[q.name] = df.schema
    sdf = df.toPandas()
    if q.sql is None:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = oracle.execute(resolve_sql(q, sf_dir)).df()
    s_cols, s_rows = canon_rows(sdf)
    d_cols, d_rows = canon_rows(ddf)
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows)
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{len(mismatches)} rows differ; first: {mismatches[0]}"


@pytest.mark.parametrize("q", _ORACLED, ids=[q.name for q in _ORACLED])
def test_no_complex_output_columns(q, spark, sf_dir):
    """The driver's canonicalizer sorts result cells with pandas; array/
    struct/map cells raise `unhashable type` there (this is what broke
    array_funcs in round 1). Every oracled query must emit scalars only --
    stringify (array_join) any list-shaped output."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    # reuse the schema captured during the oracle-match run; fall back to
    # invoking the fn only when this test runs in isolation
    schema = _SCHEMAS.get(q.name) or q.fn(spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"non-scalar output columns in oracled query: {bad}"
