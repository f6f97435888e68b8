"""Pluggable bucket storage behind :class:`KeyedTable` (the seam
promised in operators/merge.py: "a Delta/Iceberg backend can be swapped
in behind ``KeyedTable`` unchanged").

The MERGE engine (dedup window, newer-wins guard, schema evolution,
soft/hard delete) is storage-agnostic; what a backend owns is the
physical layout: existence, bucket-partitioned reads with the evolved
schema NULL-filled, dynamic-overwrite writes of the touched buckets,
the authoritative table schema, and bucket removal.  ``BucketStore``
states that contract; :class:`InMemoryBucketStore` is the second,
deliberately trivial implementation that proves the seam — the same
contract tests in tests/test_merge.py run against both backends
(parameterized), so a Delta/Iceberg store only has to implement these
five operations to inherit the whole verified merge surface.

The default parquet layout stays inline in merge.py (it carries extra
parquet-specific machinery: manifest commit protocol, compaction,
footer-count fast paths); ``KeyedTable(store=...)`` routes the io
methods here instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BucketStore:
    """Abstract physical storage for a bucket-partitioned keyed table.

    Frames passed to :meth:`write` (and expected back from
    :meth:`read`) carry the bucket id as a regular column
    (``merge.BUCKET_COL``).
    """

    def exists(self) -> bool:
        raise NotImplementedError

    def read(self, schema) -> DataFrame:
        """Every stored row, as ``schema`` — rows written before a
        schema evolution are NULL-filled for the added columns."""
        raise NotImplementedError

    def write(self, df: DataFrame, mode: str) -> None:
        """``mode='overwrite'`` = DYNAMIC partition overwrite: replace
        exactly the buckets present in ``df``, leave the rest; this is
        the semantics Delta/Iceberg make atomic (replaceWhere /
        overwrite-by-filter)."""
        raise NotImplementedError

    def read_schema(self):
        raise NotImplementedError

    def write_schema(self, schema) -> None:
        raise NotImplementedError

    def drop_buckets(self, bucket_ids: list[int]) -> None:
        """Remove buckets that became empty (hard-delete cleanup)."""
        raise NotImplementedError


class InMemoryBucketStore(BucketStore):
    """Dict-of-buckets storage: the minimal second backend.

    Correctness-faithful, deliberately not scale-faithful (everything
    lives on the driver) — its job is to pin the seam: every contract
    test that passes on parquet must pass here with zero changes to
    KeyedTable's merge logic."""

    def __init__(self, spark: SparkSession) -> None:
        from quick_stream_spark.operators.merge import BUCKET_COL

        self.spark = spark
        self._bucket_col = BUCKET_COL
        self._buckets: dict[int, list[dict]] = {}
        self._schema = None

    def exists(self) -> bool:
        return self._schema is not None

    def read(self, schema) -> DataFrame:
        schema = schema if schema is not None else self._schema
        rows = [
            tuple(rec.get(f.name) for f in schema.fields)
            for recs in self._buckets.values()
            for rec in recs
        ]
        return self.spark.createDataFrame(rows, schema)

    def write(self, df: DataFrame, mode: str) -> None:
        by_bucket: dict[int, list[dict]] = {}
        for row in df.collect():
            rec = row.asDict()
            by_bucket.setdefault(rec[self._bucket_col], []).append(rec)
        if mode not in ("overwrite",):
            raise ValueError(f"unsupported write mode: {mode!r}")
        # dynamic overwrite: only buckets present in the data change
        self._buckets.update(by_bucket)
        self._schema = df.schema

    def read_schema(self):
        return self._schema

    def write_schema(self, schema) -> None:
        self._schema = schema

    def drop_buckets(self, bucket_ids: list[int]) -> None:
        for b in bucket_ids:
            self._buckets.pop(b, None)
