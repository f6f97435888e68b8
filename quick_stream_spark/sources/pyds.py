"""Python Data Source (Spark 4 connector API) — O15 parity through the
modern pure-Python connector surface.

The reference's only source is an in-process channel (upsert.rs:77); a
Spark engine's equivalent contract is "any DataSource V2 connector".
Spark 4 lets one be written in pure Python (Arrow-batched under the
hood), so this module ships a deterministic synthetic source proving
the engine speaks that API end to end:

- ``SyntheticRowsDataSource`` (batch): N rows split over P input
  partitions, each row's payload derived from its id with Knuth
  multiplicative hashing — engine-independent integer arithmetic, so a
  DuckDB oracle can regenerate the exact rows and the roundtrip is
  hash-checked (plans/extensions.py source_python_datasource).
- ``read`` yields plain tuples; Spark batches them through Arrow.  A
  production connector would yield from its client library cursor the
  same way — partition planning (one InputPartition per parallel
  cursor) is the scale contract.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

KNUTH = 2654435761  # multiplicative hash constant
MOD = 2**32


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("qss_synthetic").option("rows", N)`` — a
    deterministic generator source."""

    @classmethod
    def name(cls) -> str:
        return "qss_synthetic"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, value DOUBLE"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(self.options)


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))

    def partitions(self):
        # one InputPartition per parallel reader task; ids are striped
        # across partitions so every partition sees the full id range
        # (a real connector would hand out shard/offset ranges here)
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        start = partition.value
        for i in range(start, self.n_rows, self.n_parts):
            h = (i * KNUTH) % MOD
            # h / 2^32 is a power-of-two division: exact in binary
            # floating point, so any engine reproduces it bit-for-bit
            yield (i, h % 16, h / MOD)


def register(spark) -> None:
    spark.dataSource.register(SyntheticRowsDataSource)


class SyntheticRowsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same deterministic generator: each
    ``latestOffset`` call advances the available range by ``chunk``
    rows until ``rows`` are exhausted — the offset/partition/commit
    protocol of a real streaming connector (a Kafka-style source would
    return broker offsets instead)."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", "1000"))
        self.chunk = int(options.get("chunk", "250"))
        self.current = 0

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        self.current = min(self.current + self.chunk, self.n_rows)
        return {"offset": self.current}

    def partitions(self, start, end):
        return [InputPartition((start["offset"], end["offset"]))]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            h = (i * KNUTH) % MOD
            yield (i, h % 16, h / MOD)

    def commit(self, end) -> None:
        pass


class SyntheticStreamDataSource(DataSource):
    """``spark.readStream.format("qss_synthetic_stream")`` — the
    streaming twin of :class:`SyntheticRowsDataSource`."""

    @classmethod
    def name(cls) -> str:
        return "qss_synthetic_stream"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, value DOUBLE"

    def streamReader(self, schema) -> SyntheticRowsStreamReader:
        return SyntheticRowsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticStreamDataSource)
