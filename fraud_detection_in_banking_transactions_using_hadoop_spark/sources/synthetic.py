"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic card-transaction generator, `spark.read.format("fraud_synth")`.

Why it exists: load/soak testing the pipeline needs unbounded input that
(a) needs no files, (b) is reproducible run-to-run, and (c) generates in
parallel ON EXECUTORS -- `spark.range()` gives ids, but realistic typed
rows (amounts, zips, timestamps, status priors) need generation logic.
This is the engine's template for the custom-source extension surface:
partition planning in `partitions()`, per-partition iterators in
`read()`, schema declared up front.

Determinism: row content is a pure function of (seed, row index) via
md5 -- no RNG state, so retried tasks regenerate identical rows
(exactly-once safe) and any two runs agree.

Scale: `numPartitions` splits the keyspace evenly; each partition
streams rows without materializing them -- 10^9 rows is just more
partitions, zero driver memory.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _h(seed: int, i: int, field: str) -> int:
    d = hashlib.md5(f"{seed}:{i}:{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


class FraudSynthDataSource(DataSource):
    """Options: rows (default 1000), partitions (default 8), seed
    (default 42), cards (default 100)."""

    @classmethod
    def name(cls) -> str:
        return "fraud_synth"

    def schema(self) -> str:
        return (
            "card_id bigint, member_id bigint, amount double, postcode int, "
            "pos_id bigint, transaction_dt string, status string"
        )

    def reader(self, schema) -> "FraudSynthReader":
        return FraudSynthReader(self.options)

    def simpleStreamReader(self, schema) -> "FraudSynthStreamReader":
        return FraudSynthStreamReader(self.options)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class FraudSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_cards = int(options.get("cards", 100))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):
        t0 = datetime(2024, 1, 1)
        zips = [100, 200, 300, 400, 999]
        for i in range(partition.start, partition.end):
            card = _h(self.seed, i, "card") % self.n_cards + 1
            ts = t0 + timedelta(seconds=_h(self.seed, i, "ts") % (30 * 86400))
            yield (
                card,
                (card - 1) // 2 + 1,
                round((_h(self.seed, i, "amt") % 50000) / 100.0 + 1.0, 2),
                zips[_h(self.seed, i, "zip") % len(zips)],
                i,
                ts.strftime("%Y-%m-%d %H:%M:%S"),
                "GENUINE" if _h(self.seed, i, "st") % 10 else "FRAUDULENT",
            )


def _gen_row(seed: int, n_cards: int, i: int):
    t0 = datetime(2024, 1, 1)
    zips = [100, 200, 300, 400, 999]
    card = _h(seed, i, "card") % n_cards + 1
    ts = t0 + timedelta(seconds=_h(seed, i, "ts") % (30 * 86400))
    return (
        card,
        (card - 1) // 2 + 1,
        round((_h(seed, i, "amt") % 50000) / 100.0 + 1.0, 2),
        zips[_h(seed, i, "zip") % len(zips)],
        i,
        ts.strftime("%Y-%m-%d %H:%M:%S"),
        "GENUINE" if _h(seed, i, "st") % 10 else "FRAUDULENT",
    )


class FraudSynthStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: offset = next row index; each micro-batch emits
    `rows_per_batch` rows, stopping at `max_rows` (0 = unbounded soak).

    Exactly-once comes for free from determinism: `readBetweenOffsets`
    regenerates any replayed range bit-identically, so recovery after a
    crash re-produces the same rows the failed batch contained.
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 0))
        self.seed = int(options.get("seed", 42))
        self.n_cards = int(options.get("cards", 100))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        i0 = int(start["index"])
        i1 = i0 + self.rows_per_batch
        if self.max_rows:
            i1 = min(i1, self.max_rows)
        end = {"index": i1}
        return iter([_gen_row(self.seed, self.n_cards, i) for i in range(i0, i1)]), end

    def readBetweenOffsets(self, start, end):
        return iter(
            [_gen_row(self.seed, self.n_cards, i)
             for i in range(int(start["index"]), int(end["index"]))]
        )


def register_synthetic_source(spark) -> None:
    """Idempotent registration; after this,
    spark.read.format("fraud_synth").option("rows", n).load() works."""
    spark.dataSource.register(FraudSynthDataSource)
