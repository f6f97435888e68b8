"""Manifest statistics (operators/commitlog.py stats +
KeyedTable.count_fast): every commit publishes per-bucket row counts
atomically with its snapshot, so COUNT(*) is answered from metadata —
exact across merges, deletes, compaction, restore and time travel, and
readable even when the data files themselves are not."""

import os
from datetime import datetime

import pytest

from quick_stream_spark.operators.merge import KeyedTable

SCHEMA = "pkey long, modified_date timestamp, arrival long, payload string"


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def mk(spark, root, name="t", protocol="manifest"):
    return KeyedTable(
        spark,
        os.path.join(root, name),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        commit_protocol=protocol,
    )


B1 = [(i, datetime(2024, 1, 1), i, f"p{i}") for i in range(10)]
B2 = [(9, datetime(2024, 1, 5), 20, "p9b"), (10, datetime(2024, 1, 2), 21, "new")]


def test_count_fast_tracks_every_commit_kind(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir)
    t.upsert(df(spark, B1))
    assert t.count_fast() == t.read().count() == 10
    t.upsert(df(spark, B2))  # one update + one insert
    assert t.count_fast() == t.read().count() == 11
    t.soft_delete(df(spark, [(1, datetime(2024, 2, 1), 30, "x")]))
    assert t.count_fast() == 11
    assert t.count_fast(active_only=True) == t.read(active_only=True).count() == 10
    t.hard_delete(df(spark, [(2, datetime(2024, 2, 2), 31, "x"),
                             (3, datetime(2024, 2, 2), 32, "x")]))
    assert t.count_fast() == t.read().count() == 9
    t.compact()  # layout-only: counts must not move
    assert t.count_fast() == 9
    assert t.count_fast(active_only=True) == 8


def test_count_fast_time_travel_and_restore(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir)
    t.upsert(df(spark, B1))
    v1 = t.snapshot_versions()[-1]
    t.hard_delete(df(spark, [(0, datetime(2024, 2, 1), 30, "x")]))
    assert t.count_fast(version=v1) == 10
    assert t.count_fast() == 9
    t.restore(v1)
    assert t.count_fast() == 10  # restore republishes the old stats


def test_count_fast_is_metadata_only(spark, tmp_table_dir):
    """Corrupt every data file in place: a scan would now fail, but the
    metadata count still answers — proof no data file is opened."""
    t = mk(spark, tmp_table_dir)
    t.upsert(df(spark, B1))
    t.vacuum(keep_versions=1)
    mapping = t._log.read()
    for path in t._log.resolve(mapping):
        with open(path, "wb") as f:
            f.write(b"not parquet anymore")
    assert t.count_fast() == 10
    assert t.count_fast(active_only=True) == 10
    with pytest.raises(Exception):
        t.read().count()


def test_count_fast_requires_manifest(spark, tmp_table_dir):
    d = mk(spark, tmp_table_dir, protocol="direct")
    with pytest.raises(ValueError, match="manifest"):
        d.count_fast()


def test_pre_stats_manifest_falls_back_to_scan(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir)
    t.upsert(df(spark, B1))
    # simulate an old manifest: strip the stats key in place
    import json
    mdir = os.path.join(t.path, "_qss_manifest")
    for name in os.listdir(mdir):
        p = os.path.join(mdir, name)
        if name.startswith(".") or not name.endswith(".json"):
            os.remove(p)  # drop Hadoop .crc sidecars: we rewrite the json
            continue
        doc = json.load(open(p))
        doc.pop("stats", None)
        json.dump(doc, open(p, "w"))
    assert t._log.read_stats() is None
    assert t.count_fast() == 10  # honest fallback still correct


def test_pre_stats_manifest_stays_honest_after_new_commit(spark, tmp_table_dir):
    """A commit on top of a pre-stats manifest must NOT publish a
    partial stats dict covering only its own buckets: carried-forward
    buckets have no entries, and count_fast would silently sum the
    partial dict.  The fix commits without stats (honest scan
    fallback) until no pre-stats buckets are carried forward."""
    import json
    t = mk(spark, tmp_table_dir)
    t.upsert(df(spark, B1))
    mdir = os.path.join(t.path, "_qss_manifest")
    for name in os.listdir(mdir):
        p = os.path.join(mdir, name)
        if name.startswith(".") or not name.endswith(".json"):
            os.remove(p)
            continue
        doc = json.load(open(p))
        doc.pop("stats", None)
        json.dump(doc, open(p, "w"))
    assert t._log.read_stats() is None
    # incremental commit touches a subset of buckets; others carry forward
    t.upsert(df(spark, B2))
    assert t.count_fast() == t.read().count() == 11  # was: partial-sum lie
    # once a commit replaces EVERY bucket (compaction), stats can resume
    t.compact()
    assert t._log.read_stats() is not None
    assert t.count_fast() == 11


def test_count_fast_missing_table_raises_like_read(spark, tmp_table_dir):
    t = mk(spark, tmp_table_dir, name="never_written")
    with pytest.raises(FileNotFoundError):
        t.count_fast()


def test_count_fast_on_logstore_backend(spark, tmp_table_dir):
    """r8: the logstore BucketStore publishes the same per-bucket
    [rows, active_rows] stats with every commit, so count_fast answers
    from pure manifest metadata on the store backend too — including
    after soft deletes (active counts) and hard deletes (dropped
    buckets leave the stats)."""
    from quick_stream_spark.operators.backends import LogStructuredBucketStore

    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "t-ls"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        store=LogStructuredBucketStore(
            spark, os.path.join(tmp_table_dir, "t-ls")
        ),
    )
    t.upsert(df(spark, B1))
    assert t.count_fast() == t.read().count()
    assert t.count_fast(active_only=True) == t.read().count()

    # soft delete one key: total count unchanged, active count drops
    one = df(spark, B1[:1])
    t.soft_delete(one)
    assert t.count_fast() == t.read().count()
    assert (
        t.count_fast(active_only=True)
        == t.read(active_only=True).count()
        == t.read().count() - 1
    )

    # hard delete: rows leave both the table and the metadata counts
    t.hard_delete(one)
    assert t.count_fast() == t.read().count()

    # a fresh handle reads the same metadata
    t2 = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "t-ls"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        store=LogStructuredBucketStore(
            spark, os.path.join(tmp_table_dir, "t-ls")
        ),
    )
    assert t2.count_fast() == t.read().count()


def test_store_soft_delete_col_adopted_and_mismatch_rejected(
    spark, tmp_table_dir
):
    """ADVICE r8: a store's stats pass must count the SAME liveness
    column the owning table maintains.  The store defaults its column
    to None and adopts the table's at attach time; an explicit mismatch
    is a construction-time ValueError, never a wrong count_fast."""
    from quick_stream_spark.operators.backends import LogStructuredBucketStore

    store = LogStructuredBucketStore(spark, os.path.join(tmp_table_dir, "a"))
    assert store._soft_delete_col is None
    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "a"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        soft_delete_col="is_live",
        store=store,
    )
    assert store._soft_delete_col == "is_live"
    t.upsert(df(spark, B1))
    assert t.count_fast(active_only=True) == t.read().count() == 10

    with pytest.raises(ValueError, match="soft-delete column"):
        KeyedTable(
            spark,
            os.path.join(tmp_table_dir, "b"),
            keys=("pkey",),
            soft_delete_col="is_live",
            store=LogStructuredBucketStore(
                spark,
                os.path.join(tmp_table_dir, "b"),
                soft_delete_col="row_active",
            ),
        )


def test_all_null_liveness_does_not_crash_the_stats_commit(
    spark, tmp_table_dir
):
    """ADVICE r8: F.sum over an all-NULL liveness column returns NULL;
    int(None) crashed the commit mid-write.  Both stats passes (the
    store's _next_stats and the inline _write_manifest_commit) must
    coalesce to 0 — NULL liveness means not-active, and the commit
    lands."""
    from pyspark.sql import functions as F

    from quick_stream_spark.operators.backends import LogStructuredBucketStore
    from quick_stream_spark.operators.merge import BUCKET_COL

    # store path: write a bucket whose liveness is NULL for every row
    store = LogStructuredBucketStore(
        spark, os.path.join(tmp_table_dir, "s"), soft_delete_col="row_active"
    )
    frame = spark.createDataFrame(
        [(1, None), (2, None)], "pkey long, row_active boolean"
    ).withColumn(BUCKET_COL, F.lit(0))
    store.write(frame, "overwrite")  # TypeError before the coalesce fix
    stats = store._log.read_stats(store._log.latest_version())
    assert stats == {0: [2, 0]}

    # inline manifest path: an update batch carrying explicit NULLs
    t = mk(spark, tmp_table_dir, name="m", protocol="manifest")
    rows = [(i, datetime(2024, 1, 1), i, f"p{i}") for i in range(4)]
    null_live = df(spark, rows).withColumn(
        "row_active", F.lit(None).cast("boolean")
    )
    t.upsert(null_live)
    assert t.count_fast() == 4
    assert t.count_fast(active_only=True) == 0
    assert t.read(active_only=True).count() == 0


def test_commit_meta_is_free_when_nothing_is_tracked():
    """Structural pin (r11 verdict ask #5): ``compute_commit_meta`` on
    a table that tracks neither liveness stats nor zone maps performs
    ZERO Spark actions — the guard returns before any read.  Pinned by
    passing no SparkSession at all: if the footer aggregation ever ran
    for a metadata-free commit, this would raise instead of returning
    the empty result."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quick_stream_spark.operators.merge import compute_commit_meta

    schema = StructType(
        [StructField("pkey", LongType()), StructField("bucket", LongType())]
    )
    stats, zones = compute_commit_meta(
        None,  # would crash on any Spark use
        "/nonexistent-commit-dir",
        schema,
        "bucket",
        None,  # no soft-delete column -> no stats
        (),    # no zone columns -> no zones
    )
    assert stats is None and zones == {}
    # same guard when the configured columns are absent from the schema
    stats, zones = compute_commit_meta(
        None, "/nonexistent", schema, "bucket", "row_active", ("missing",)
    )
    assert stats is None and zones == {}
