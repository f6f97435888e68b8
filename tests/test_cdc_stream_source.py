"""The change feed as a structured stream (sources/pyds.py
CdcStreamDataSource): draining the qss_cdc source must reproduce the
batch API exactly — the initial snapshot as inserts, then every
commit's read_changes delta with its version."""

import os
import tempfile
import time
from datetime import datetime

from pyspark.sql import functions as F

from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.sources.pyds import register_cdc

SCHEMA = "pkey long, modified_date timestamp, arrival long, payload string"


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _drain(spark, path, expected_rows):
    register_cdc(spark)
    work = tempfile.mkdtemp(prefix="qss-cdcs-")
    name = f"cdcs_{abs(hash(work)) % 10**8}"
    q = (
        spark.readStream.format("qss_cdc")
        .option("path", path)
        .option("keys", "pkey")
        .load()
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", work + "/ckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table(name).count() >= expected_rows:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    return spark.table(name)


def _sorted_rows(sdf):
    cols = sorted(sdf.columns)
    return sorted(tuple(r[c] for c in cols) for r in sdf.collect())


def test_stream_equals_batch_change_feed(spark, tmp_table_dir):
    src = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "src"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        commit_protocol="manifest",
    )
    src.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a1"),
                          (2, datetime(2024, 1, 1), 2, "b1"),
                          (3, datetime(2024, 1, 1), 3, "c1")]))
    src.upsert(df(spark, [(1, datetime(2024, 1, 5), 4, "a2"),
                          (4, datetime(2024, 1, 2), 5, "d1")]))
    src.soft_delete(df(spark, [(2, datetime(2024, 2, 1), 6, "x")]))
    src.hard_delete(df(spark, [(3, datetime(2024, 2, 2), 7, "x")]))

    versions = src.snapshot_versions()
    expected = src.read(version=versions[0]).select(
        "*",
        F.lit("insert").alias("_change_type"),
        F.lit(versions[0]).cast("int").alias("_commit_version"),
    )
    for a, b in zip(versions, versions[1:]):
        expected = expected.unionByName(src.read_changes(a, b))
    exp_rows = _sorted_rows(expected)

    got = _drain(spark, src.path, len(exp_rows))
    assert sorted(got.columns) == sorted(expected.columns)
    assert _sorted_rows(got) == exp_rows


def test_checkpoint_resume_reads_only_new_commits(spark, tmp_table_dir):
    """Stop the stream after draining two commits, add two more, then
    restart from the same checkpoint: the second run must emit ONLY the
    new commits' changes (offsets = manifest versions, tracked in the
    checkpoint like any connector's)."""
    src = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "src"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        commit_protocol="manifest",
    )
    src.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a1")]))
    src.upsert(df(spark, [(2, datetime(2024, 1, 2), 2, "b1")]))

    register_cdc(spark)
    work = tempfile.mkdtemp(prefix="qss-cdcr-")

    def run():
        # file sink: the memory sink cannot recover from a checkpoint
        q = (
            spark.readStream.format("qss_cdc")
            .option("path", src.path)
            .option("keys", "pkey")
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", work + "/out")
            .option("checkpointLocation", work + "/ckpt")  # SHARED checkpoint
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(work + "/out")

    first = run()
    assert {(r.pkey, r._change_type, r._commit_version) for r in first.collect()} == {
        (1, "insert", 1),
        (2, "insert", 2),
    }

    src.upsert(df(spark, [(1, datetime(2024, 2, 1), 3, "a2")]))
    src.hard_delete(df(spark, [(2, datetime(2024, 2, 2), 4, "x")]))

    total = run()
    got = {(r.pkey, r.payload, r._change_type, r._commit_version)
           for r in total.collect()}
    # exactly the old 2 rows plus versions 3 and 4 — a re-emission of the
    # committed offsets would inflate the row count
    assert total.count() == 5
    assert got == {
        (1, "a1", "insert", 1),
        (2, "b1", "insert", 2),
        (1, "a1", "update_preimage", 3),
        (1, "a2", "update_postimage", 3),
        (2, "b1", "delete", 4),
    }
