"""Z-order layout: bit parity vs a Python reference, and the actual
data-skipping property -- files written by write_zordered carry narrow
min/max ranges on BOTH dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_in_banking_transactions_using_hadoop_spark.operators.layout import (
    write_zordered,
    zorder_key,
    zorder_sql,
)
from fraud_detection_in_banking_transactions_using_hadoop_spark.sources.readers import read_table


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 77, 128, 255) for y in (0, 3, 64, 200, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _interleave_py(x, y, 8), (x, y)


def test_zorder_sql_matches_column_expression(spark):
    df = spark.range(500).select(
        (F.col("id") % 97).alias("x"), (F.col("id") * 7 % 256).alias("y")
    )
    both = df.select(
        zorder_key(F.col("x"), F.col("y"), bits=8).alias("z_col"),
        F.expr(zorder_sql("x", "y", bits=8)).alias("z_sql"),
    )
    assert both.filter(F.col("z_col") != F.col("z_sql")).count() == 0


def test_write_zordered_narrows_file_ranges(spark, sf_dir, tmp_path):
    """Each z-ordered file must cover a small (x, y) rectangle: the
    average per-file area is a fraction of the full grid, whereas an
    unordered write leaves every file spanning ~the whole grid."""
    ev = read_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).cast("bigint").alias("x"),
        (F.floor("value").cast("bigint") % 256).alias("y"),
    )
    n_files = 8
    zpath = str(tmp_path / "zordered")
    write_zordered(ev, zpath, F.col("x"), F.col("y"), bits=8, num_files=n_files)

    def file_stats(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("x") - F.min("x") + 1).alias("dx"),
                (F.max("y") - F.min("y") + 1).alias("dy"),
            )
            .select(F.avg(F.col("dx") * F.col("dy")).alias("area"))
            .collect()[0]["area"]
        )

    naive = str(tmp_path / "naive")
    ev.repartition(n_files).write.mode("overwrite").parquet(naive)

    z_area = file_stats(zpath)
    naive_area = file_stats(naive)
    # The grid is 256x192-ish; naive files span nearly all of it, z-files
    # must average well under half of the naive footprint.
    assert z_area < 0.5 * naive_area, (z_area, naive_area)
