"""Sources (reference O15) and the test-data loaders.

The reference's only source is a tokio mpsc channel of record batches
(upsert.rs:77); the Spark equivalent is any Structured Streaming source.
For deterministic offline tests we use the file source: each "channel
delivery" is one parquet file, replayed with ``maxFilesPerTrigger=1`` and
an ``availableNow`` trigger.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table.  ``events.ts`` is parquet TIMESTAMP(NANOS);
    how Spark surfaces it depends on the version:

    - Spark <= 4.0 rejects it by default; with
      ``spark.sql.legacy.parquet.nanosAsLong`` (set only around the
      read, then restored) it arrives as long nanos, which we truncate
      to microseconds with integer division (the values exceed 2^53, so
      float math would corrupt them);
    - Spark >= 4.1 reads it natively as ``timestamp_ntz`` (microsecond-
      truncated; the legacy conf is a no-op).

    Either way the column is normalized to a session-time-zone TIMESTAMP
    — the event-time type ``withWatermark`` requires — and the session
    time zone is pinned to UTC (``pin_session``), so the NTZ->LTZ cast
    preserves the wall-clock values and matches DuckDB's own naive
    ns->us truncation."""
    if name == "events":
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(conf_key)  # defined default ("false") if unset
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
            # force analysis (and the parquet footer read) while the
            # conf is still set; the lazy plan keeps the resolved schema
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            elif ts_type == "timestamp_ntz":
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            spark.conf.set(conf_key, prev)
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLES
) -> None:
    """Register the driver tables as temp views so ``spark.sql`` queries
    (grouping sets etc.) can name them like the DuckDB oracle does."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_batches_as_files(batches: Sequence[DataFrame], directory: str) -> list[str]:
    """Materialize each batch DataFrame as a single parquet file in
    ``directory`` (named in batch order) — the offline stand-in for the
    reference's sequence of channel deliveries (lib.rs:158-176)."""
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i, b in enumerate(batches):
        p = os.path.join(directory, f"batch-{i:05d}")
        b.coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths


def write_split_as_files(df: DataFrame, batch_expr, n_batches: int, directory: str) -> None:
    """Materialize ``n_batches`` delivery files in ONE Spark job:
    partition the frame by a batch expression and write one file per
    partition value (vs one job per batch with
    :func:`write_batches_as_files`).  Only valid when the consumer's
    semantics are batch-order independent — the file source may pick
    any order for same-mtime files."""
    (
        df.withColumn("__batch", batch_expr)
        .repartition(F.col("__batch"))
        .write.mode("overwrite")
        .partitionBy("__batch")
        .parquet(directory)
    )


def stream_parquet_dir(
    spark: SparkSession,
    directory: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of batch files; one file per
    micro-batch by default, mirroring one channel delivery per cycle."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(directory)
    )
