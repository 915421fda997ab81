"""Multi-dimensional data layout: Z-order (Morton) clustering.

Directory partitioning prunes on ONE value chain and bucketing co-locates
ONE join key; when scans filter on TWO independent dimensions (user AND
time, region AND amount), neither helps the second column. Z-ordering
sorts rows by the bit-interleaving of both dimensions, so consecutive
rows -- and therefore parquet row groups / files -- cover compact
rectangles in (x, y) space, and each file's column min/max statistics
become selective for BOTH columns. That is the entire trick behind
Delta/Iceberg OPTIMIZE ZORDER, reproduced here as a pure column
expression + a range-partitioned sorted write.

The z-value is built from plain shift/mask expressions (whole-stage
codegen, no UDF); a Hilbert curve has marginally better locality but
needs stateful bit logic -- the Morton form is the one expressible as
a flat expression tree, and at 16 bits per dimension the locality
difference is noise compared to row-group granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1. Callers normalize
    each dimension into [0, 2^bits) first (rank or fixed-point scale --
    z-ordering needs a bounded integer grid either way)."""
    x = x.cast("bigint")
    y = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical arithmetic as ANSI/DuckDB SQL (for oracles and for
    engines without the helper)."""
    # Every term fully parenthesized: SQL shift operators bind LOOSER
    # than '+', so an unparenthesized 'a << 2 + b << 3' chains the shifts.
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Z-ordered parquet write: range-partition on the z-value (contiguous
    z-ranges per file, unlike hash repartition) then sort within each
    partition, so every file covers one compact z-interval = one small
    (x, y) rectangle. At 100 TB this is the difference between a
    two-predicate scan reading every file and reading ~sqrt of them."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits))
    part = keyed.repartitionByRange(*( [num_files] if num_files else [] ), "__z")
    part.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)
