"""Multi-table routing tests mirroring the reference's two-table
end-to-end fixture (multi_table_upsert.rs:637-816: tables test1/test2,
records routed by a `table` discriminator, per-table dedup+upsert)."""

import os
from datetime import datetime

import pytest

from quick_stream_spark.operators.router import MultiTableRouter

SCHEMA = "pkey long, modified_date timestamp, arrival long, table string, comment string"


@pytest.fixture()
def router(spark, tmp_table_dir):
    return MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "multi"),
        table_col="table",
        tables=["test1", "test2"],
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
    )


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_routes_and_dedups_per_table(spark, router):
    router.upsert_batch(
        df(
            spark,
            [
                # same pkey in BOTH tables: must not collide across tables
                (1, datetime(2024, 1, 1), 1, "test1", "t1-old"),
                (1, datetime(2024, 1, 1, 0, 0, 1), 2, "test1", "t1-new"),
                (1, datetime(2024, 1, 1), 3, "test2", "t2-a"),
                (2, datetime(2024, 1, 1), 4, "test2", "t2-b"),
            ],
        )
    )
    got = {
        (r.table, r.pkey): r.comment
        for r in router.read_union().collect()
    }
    assert got == {
        ("test1", 1): "t1-new",
        ("test2", 1): "t2-a",
        ("test2", 2): "t2-b",
    }


def test_second_batch_updates_each_table(spark, router):
    router.upsert_batch(df(spark, [(1, datetime(2024, 1, 1), 1, "test1", "a")]))
    router.upsert_batch(
        df(
            spark,
            [
                (1, datetime(2024, 1, 2), 2, "test1", "a2"),
                (9, datetime(2024, 1, 2), 3, "test2", "fresh"),
            ],
        )
    )
    got = {(r.table, r.pkey): r.comment for r in router.read_union().collect()}
    assert got == {("test1", 1): "a2", ("test2", 9): "fresh"}


def test_multi_table_soft_delete(spark, router):
    router.upsert_batch(
        df(
            spark,
            [
                (1, datetime(2024, 1, 1), 1, "test1", "a"),
                (1, datetime(2024, 1, 1), 2, "test2", "b"),
            ],
        )
    )
    router.soft_delete_batch(df(spark, [(1, datetime(2024, 1, 2), 3, "test2", None)]))
    got = {(r.table, r.pkey): r.row_active for r in router.read_union().collect()}
    assert got == {("test1", 1): True, ("test2", 1): False}
    active = {(r.table, r.pkey) for r in router.read_union(active_only=True).collect()}
    assert active == {("test1", 1)}


def test_discovered_tables_without_explicit_list(spark, tmp_table_dir):
    r = MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "disc"),
        table_col="table",
        tables=None,
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
    )
    r.upsert_batch(
        df(
            spark,
            [
                (1, datetime(2024, 1, 1), 1, "alpha", "x"),
                (2, datetime(2024, 1, 1), 2, "beta", "y"),
            ],
        )
    )
    assert r.target("alpha").exists() and r.target("beta").exists()
    assert {r_.pkey for r_ in r.target("alpha").read().collect()} == {1}


def test_fan_out_overlaps_independent_tables(spark, tmp_table_dir):
    """With >= 8 destination tables the per-table merges must overlap
    (thread-pool submission), not serialize: recorded (start, end)
    windows of the apply calls must intersect, and the end state must
    still be exactly the routed rows."""
    import threading
    import time as _time

    tables = [f"t{i}" for i in range(8)]
    r = MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "wide"),
        table_col="table",
        tables=tables,
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
        max_concurrency=4,
    )
    rows = [
        (i, datetime(2024, 1, 1), i, tables[i % 8], f"c{i}") for i in range(16)
    ]
    windows = []
    lock = threading.Lock()

    def spy_apply(kt, part):
        t0 = _time.monotonic()
        kt.upsert(part)
        with lock:
            windows.append((t0, _time.monotonic()))

    r._fan_out(df(spark, rows), spy_apply)
    assert len(windows) == 8
    overlaps = sum(
        1
        for i, (s1, e1) in enumerate(windows)
        for s2, e2 in windows[i + 1 :]
        if s1 < e2 and s2 < e1
    )
    assert overlaps > 0, f"fan-out ran serially: {windows}"
    got = {(x.table, x.pkey) for x in r.read_union().collect()}
    assert got == {(tables[i % 8], i) for i in range(16)}


def test_stream_config_caps_fanout_concurrency(spark, tmp_table_dir):
    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.streaming.stream import MultiTableUpsertQuickStream

    r = MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "cfg"),
        tables=["a", "b"],
    )
    cfg = QuickStreamConfig(name="cap-test", max_con_count=3)
    MultiTableUpsertQuickStream(r, config=cfg)
    assert r.max_concurrency == 3
    # an explicitly pinned router width wins over the stream config
    r2 = MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "cfg2"),
        tables=["a"],
        max_concurrency=1,
    )
    MultiTableUpsertQuickStream(r2, config=cfg)
    assert r2.max_concurrency == 1
