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


class LogStructuredBucketStore(BucketStore):
    """Third backend: a from-scratch log-structured ACID store —
    immutable data files published through the same atomic
    :class:`~quick_stream_spark.operators.commitlog.ManifestLog`
    snapshot protocol the inline parquet layout uses in manifest mode.

    This is the "real lakehouse backend" slot from the r4 verdict:
    ``delta-spark`` / Iceberg runtime jars are not installable in this
    offline environment (pip resolves no distribution; no jars on
    disk — attempt recorded in COVERAGE.md), so the Delta-style
    contract is implemented from scratch instead: every :meth:`write`
    appends new files under a fresh commit dir and atomically publishes
    a snapshot that replaces exactly the buckets present in the written
    frame (dynamic-overwrite semantics, but CRASH-ATOMIC — readers see
    the old snapshot until the single manifest rename lands, unlike the
    inline direct layout's documented mid-write exposure).  Scale
    posture: fully distributed — data moves only through executor-side
    parquet io; the driver handles the (num_buckets-bounded) manifest.

    The bucket id is persisted twice by design: as the partition dir
    (``__qss_bucket=N``, what the manifest maps) and as a real data
    column (``__qss_bucket_v``), because snapshot reads open an explicit
    file LIST (no common basePath across commit dirs), which loses
    partition-dir columns — one int column buys back the contract's
    bucket-carrying frames without a per-bucket union.
    """

    _SCHEMA_FILE = "_qss_store_schema.json"
    _BUCKET_DATA_COL = "__qss_bucket_v"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        soft_delete_col: str | None = None,
        zone_map_cols=None,
    ) -> None:
        """``soft_delete_col=None`` (the default) = adopt the owning
        :class:`KeyedTable`'s liveness column when the table attaches
        this store — the column the stats pass counts MUST be the one
        the merge engine maintains, or ``count_fast(active_only=True)``
        silently counts the wrong flag.  Passing it explicitly is for
        store-only use (no table); a mismatch with an attaching table
        raises at construction (merge.KeyedTable.__init__).
        ``zone_map_cols`` follows the same adopt-or-validate contract:
        per-bucket min/max for these columns ride every commit, so
        ``KeyedTable.read_range`` skips non-overlapping buckets on this
        backend exactly as in inline manifest mode."""
        from quick_stream_spark.operators.commitlog import ManifestLog
        from quick_stream_spark.operators.merge import BUCKET_COL

        self.spark = spark
        self.path = path
        self._bucket_col = BUCKET_COL
        self._soft_delete_col = soft_delete_col
        self._zone_map_cols = (
            tuple(zone_map_cols) if zone_map_cols is not None else None
        )
        self._log = ManifestLog(spark, path)

    def exists(self) -> bool:
        return self._log.latest_version() is not None

    def read(self, schema) -> DataFrame:
        return self.read_version(schema)

    def read_version(
        self,
        schema,
        version: int | None = None,
        bucket_ids: list[int] | None = None,
    ) -> DataFrame:
        """Snapshot read — latest when ``version`` is None, a retained
        historical snapshot otherwise (time travel through the shared
        ManifestLog, same contract as the inline manifest layout), with
        optional bucket pruning (``bucket_ids``) so change-data reads
        scan only the buckets whose file lists differ."""
        mapping = self._log.read(version)
        if bucket_ids is not None:
            mapping = {b: fs for b, fs in mapping.items() if b in bucket_ids}
        return self.read_mapping(schema, mapping)

    def read_mapping(self, schema, mapping: dict[int, list[str]]) -> DataFrame:
        """Scan an explicit bucket->files mapping (e.g. a zone-pruned
        subset of a snapshot, KeyedTable._pruned_mapping) with the
        evolved schema NULL-filled."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructField, StructType

        schema = schema if schema is not None else self.read_schema()
        files = self._log.resolve(mapping)
        if not files:
            return self.spark.createDataFrame([], schema)
        file_schema = StructType(
            [
                StructField(self._BUCKET_DATA_COL, f.dataType, f.nullable)
                if f.name == self._bucket_col
                else f
                for f in schema.fields
            ]
        )
        # explicit evolved schema: pre-evolution files NULL-fill the
        # added columns, no mergeSchema footer sweep
        return (
            self.spark.read.schema(file_schema)
            .parquet(*files)
            .withColumnRenamed(self._BUCKET_DATA_COL, self._bucket_col)
            .select(*[F.col(f.name) for f in schema.fields])
        )

    def write(self, df: DataFrame, mode: str) -> None:
        from pyspark.sql import functions as F

        if mode != "overwrite":
            raise ValueError(f"unsupported write mode: {mode!r}")
        commit_dir = self._log.new_commit_dir()
        (
            df.withColumn(self._BUCKET_DATA_COL, F.col(self._bucket_col))
            .write.mode("overwrite")
            .partitionBy(self._bucket_col)
            .parquet(commit_dir)
        )
        new_files = self._log.list_bucket_files(commit_dir)
        base_version = self._log.latest_version()
        mapping = self._log.read(base_version) if base_version is not None else {}
        prev_stats = (
            self._log.read_stats(base_version) if base_version is not None else {}
        )  # {} = no snapshot, None = pre-stats
        prev_zones = (
            self._log.read_zones(base_version) if base_version is not None else {}
        )
        # dynamic-overwrite semantics: replace exactly the buckets the
        # frame carries rows for; every other bucket carries forward —
        # declared as the transaction so a disjoint-bucket race
        # re-points instead of failing (commitlog.ManifestLog.commit)
        mapping.update(new_files)
        stats, zones = self._next_meta(
            prev_stats, prev_zones, mapping, new_files, df.schema, commit_dir
        )
        self._log.commit(
            mapping,
            stats=stats,
            touched=set(new_files),
            base_version=base_version,
            zones=zones,
        )

    def _next_meta(
        self, prev_stats, prev_zones, mapping, new_files, schema, commit_dir
    ):
        """Per-bucket ``[rows, active_rows]`` stats and zone-map bounds
        for the commit — the same metadata contract as the inline
        manifest layout (merge.py:_write_manifest_commit, shared
        ``compute_commit_meta`` kernel), so ``count_fast`` and
        ``read_range`` work identically on this backend.  COVERAGE is
        the invariant for each independently: publish only when every
        carried-forward bucket is covered (otherwise None -> honest
        scan fallback)."""
        from quick_stream_spark.operators.merge import (
            carry_forward_meta,
            carry_forward_zones,
            compute_commit_meta,
        )

        carried = [b for b in mapping if b not in new_files]
        stats = (
            carry_forward_meta(prev_stats, carried, [])
            if self._soft_delete_col is not None
            and self._soft_delete_col in schema.fieldNames()
            else None
        )
        zcols = tuple(self._zone_map_cols or ())
        zones = (
            carry_forward_zones(prev_zones, mapping, new_files)
            if zcols
            else None
        )
        if new_files and (stats is not None or zones is not None):
            new_stats, new_zones = compute_commit_meta(
                self.spark,
                commit_dir,
                schema,
                self._bucket_col,
                self._soft_delete_col,
                zcols,
                table_path=self.path,
            )
            if stats is not None:
                stats.update(new_stats or {})
            if zones is not None:
                zones.update(new_zones)
        return stats, zones

    def read_schema(self):
        import json as _json

        from pyspark.sql.types import StructType

        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, _, jvm = _hadoop_fs(self.spark, self.path)
        p = jvm.org.apache.hadoop.fs.Path(
            "/".join([self.path.rstrip("/"), self._SCHEMA_FILE])
        )
        if not fs.exists(p):
            return None
        stream = fs.open(p)
        try:
            data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()
        return StructType.fromJson(_json.loads(data.decode("utf-8")))

    def write_schema(self, schema) -> None:
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, _, jvm = _hadoop_fs(self.spark, self.path)
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(self.path))
        p = jvm.org.apache.hadoop.fs.Path(
            "/".join([self.path.rstrip("/"), self._SCHEMA_FILE])
        )
        out = fs.create(p, True)
        out.write(bytearray(schema.json().encode("utf-8")))
        out.close()

    def drop_buckets(self, bucket_ids: list[int]) -> None:
        base_version = self._log.latest_version()
        mapping = self._log.read(base_version) if base_version is not None else {}
        prev_stats = (
            self._log.read_stats(base_version) if base_version is not None else {}
        )
        prev_zones = (
            self._log.read_zones(base_version) if base_version is not None else {}
        )
        changed = False
        for b in bucket_ids:
            if mapping.pop(b, None) is not None:
                changed = True
        if changed:

            def _kept(prev):
                prev = prev or {}
                if any(b not in prev for b in mapping):
                    return None
                return {b: prev[b] for b in mapping}

            def _kept_zones(prev):
                # zones are PATH-keyed: keep the surviving files' bounds
                prev = prev or {}
                paths = [p for fl in mapping.values() for p in fl]
                if any(p not in prev for p in paths):
                    return None
                return {p: prev[p] for p in paths}

            self._log.commit(
                mapping,
                stats=_kept(prev_stats),
                touched=set(bucket_ids),
                base_version=base_version,
                zones=_kept_zones(prev_zones) if self._zone_map_cols else None,
            )

    def vacuum(self, keep_versions: int = 1) -> int:
        """Reclaim data files unreferenced by recent snapshots
        (including crash orphans) — delegated to the shared log."""
        return self._log.vacuum(keep_versions)


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
