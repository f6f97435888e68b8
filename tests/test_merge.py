"""End-state contract tests for KeyedTable (SURVEY.md §2 query-semantics
note): after any batch sequence, one row per key with the winning
record's values; soft-deleted keys keep their row with row_active=false."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from quick_stream_spark.operators.merge import BUCKET_COL, KeyedTable

SCHEMA = "pkey long, modified_date timestamp, arrival long, payload string"


def _store_kw(spark, backend: str, root: str = "") -> dict:
    if backend == "memory":
        from quick_stream_spark.operators.backends import InMemoryBucketStore

        return {"store": InMemoryBucketStore(spark)}
    if backend == "logstore":
        from quick_stream_spark.operators.backends import LogStructuredBucketStore

        return {"store": LogStructuredBucketStore(spark, os.path.join(root, "log"))}
    return {}


@pytest.fixture(params=["parquet", "memory", "logstore"])
def store_kw(spark, tmp_table_dir, request):
    """Storage-backend axis: the MERGE contract tests run against the
    bucket-partitioned parquet layout, the in-memory dict-of-buckets
    store, and the log-structured ACID store (operators/backends.py),
    proving the KeyedTable storage seam — the merge semantics may not
    depend on the physical layer."""
    return _store_kw(spark, request.param, tmp_table_dir)


@pytest.fixture()
def table(spark, tmp_table_dir, store_kw):
    return KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "t"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        **store_kw,
    )


@pytest.fixture()
def ptable(spark, tmp_table_dir):
    """Parquet-only table, for tests of the physical layout itself
    (partition pruning, file mtimes, compaction, write-plan shape)."""
    return KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "t"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
    )


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def state(table):
    return {r.pkey: (r.payload, r.row_active) for r in table.read().collect()}


def test_upsert_creates_then_updates(spark, table):
    table.upsert(
        df(
            spark,
            [
                (1, datetime(2024, 1, 1), 1, "a"),
                (1, datetime(2024, 1, 1, 0, 0, 1), 2, "b"),
                (2, datetime(2024, 1, 1, 0, 0, 2), 3, "c"),
            ],
        )
    )
    assert state(table) == {1: ("b", True), 2: ("c", True)}
    table.upsert(df(spark, [(2, datetime(2024, 1, 2), 4, "c2"), (3, datetime(2024, 1, 2), 5, "d")]))
    assert state(table) == {1: ("b", True), 2: ("c2", True), 3: ("d", True)}


def test_batch_wins_reproduces_on_conflict_do_update(spark, table):
    """Faithful mode: an older record in a later batch still overwrites
    (the reference's SQL updates unconditionally on conflict)."""
    table.upsert(df(spark, [(1, datetime(2024, 1, 5), 1, "new")]))
    table.upsert(df(spark, [(1, datetime(2024, 1, 1), 2, "old")]))
    assert state(table) == {1: ("old", True)}


def test_newer_wins_guard(spark, table):
    table.upsert(df(spark, [(1, datetime(2024, 1, 5), 1, "new")]), newer_wins=True)
    table.upsert(df(spark, [(1, datetime(2024, 1, 1), 2, "old")]), newer_wins=True)
    assert state(table) == {1: ("new", True)}
    # equal version: current wins (strict > guard)
    table.upsert(df(spark, [(1, datetime(2024, 1, 5), 3, "tie")]), newer_wins=True)
    assert state(table) == {1: ("new", True)}


def test_soft_delete_keeps_row_marks_inactive(spark, table):
    table.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a"), (2, datetime(2024, 1, 1), 2, "b")]))
    table.soft_delete(df(spark, [(2, datetime(2024, 1, 2), 3, None)]))
    assert state(table) == {1: ("a", True), 2: ("b", False)}
    # re-upsert reactivates with new values (DO UPDATE sets all columns)
    table.upsert(df(spark, [(2, datetime(2024, 1, 3), 4, "b2")]))
    assert state(table) == {1: ("a", True), 2: ("b2", True)}


def test_soft_delete_nonexistent_key_is_noop(spark, table):
    table.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a")]))
    table.soft_delete(df(spark, [(99, datetime(2024, 1, 2), 2, None)]))
    assert state(table) == {1: ("a", True)}


def test_hard_delete_removes_rows(spark, table):
    table.upsert(
        df(
            spark,
            [(k, datetime(2024, 1, 1), k, f"p{k}") for k in range(10)],
        )
    )
    table.hard_delete(df(spark, [(k, datetime(2024, 1, 2), 100 + k, None) for k in range(5)]))
    assert set(state(table)) == {5, 6, 7, 8, 9}


def test_hard_delete_all_rows_empties_table(spark, table):
    table.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a")]))
    table.hard_delete(df(spark, [(1, datetime(2024, 1, 2), 2, None)]))
    # table dir may still exist but hold no rows in any bucket
    remaining = [
        f
        for f in (os.listdir(table.path) if os.path.exists(table.path) else [])
        if f.startswith(BUCKET_COL)
    ]
    assert remaining == []


def test_merge_touches_only_affected_buckets(spark, ptable):
    """Scale contract: a batch rewrites only the bucket partitions its
    keys hash into — untouched partition files must be byte-identical."""
    ptable.upsert(df(spark, [(k, datetime(2024, 1, 1), k, f"p{k}") for k in range(64)]))
    before = _partition_mtimes(ptable.path)
    assert len(before) == 4  # all buckets populated

    one_key = df(spark, [(0, datetime(2024, 1, 2), 999, "upd")])
    bucket_of_0 = one_key.select(
        F.pmod(F.xxhash64(F.col("pkey")), F.lit(4)).cast("int")
    ).collect()[0][0]
    ptable.upsert(one_key)

    after = _partition_mtimes(ptable.path)
    for part, files in before.items():
        if part == f"{BUCKET_COL}={bucket_of_0}":
            continue
        assert after[part] == files, f"untouched partition {part} was rewritten"


def test_merge_read_is_partition_pruned(spark, ptable):
    """The touched-bucket read must prune at the partition level — the
    scan's PartitionFilters must carry the bucket predicate, so a merge
    never lists or reads untouched bucket directories."""
    import contextlib
    import io
    from datetime import datetime as dt

    ptable.upsert(df(spark, [(k, dt(2024, 1, 1), k, f"p{k}") for k in range(64)]))
    pruned = ptable._current_in([1])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "__qss_bucket" in pf and "1" in pf, plan


def _partition_mtimes(path):
    out = {}
    for d in os.listdir(path):
        if not d.startswith(BUCKET_COL):
            continue
        full = os.path.join(path, d)
        out[d] = sorted(
            (f, os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full)
            if f.endswith(".parquet")
        )
    return out


def test_compact_restores_one_file_per_bucket(spark, ptable):
    """Merges append files to touched buckets; compact() must rewrite
    each bucket to one file with values untouched."""
    # AQE coalesces tiny merges to one task per bucket, so force the
    # multi-file state a high-frequency merge stream produces at scale
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for b in range(4):
            ptable.upsert(
                df(
                    spark,
                    [(k, datetime(2024, 1, 1 + b), 100 * b + k, f"v{b}-{k}") for k in range(16)],
                )
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    before_rows = {(r.pkey, r.payload) for r in ptable.read().collect()}
    assert ptable.file_count() > 4  # merge growth happened
    ptable.compact()
    assert ptable.file_count() == 4  # one file per bucket
    after_rows = {(r.pkey, r.payload) for r in ptable.read().collect()}
    assert after_rows == before_rows


def test_composite_keys(spark, tmp_table_dir, store_kw):
    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "ck"),
        keys=("k1", "k2"),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
        **store_kw,
    )
    schema = "k1 long, k2 string, modified_date timestamp, arrival long, v string"
    t.upsert(spark.createDataFrame([(1, "x", datetime(2024, 1, 1), 1, "a")], schema))
    t.upsert(spark.createDataFrame([(1, "y", datetime(2024, 1, 1), 2, "b")], schema))
    t.upsert(spark.createDataFrame([(1, "x", datetime(2024, 1, 2), 3, "a2")], schema))
    got = {(r.k1, r.k2): r.v for r in t.read().collect()}
    assert got == {(1, "x"): "a2", (1, "y"): "b"}


def test_merge_scan_uses_dynamic_partition_pruning(spark, tmp_table_dir):
    """The incremental-merge read of current state must carry a
    dynamicpruningexpression partition filter on the bucket column —
    only the batch's touched bucket directories are read, with no
    driver-side bucket collect (the 100 TB incremental-merge contract)."""
    import contextlib
    import io

    from quick_stream_spark.operators.merge import BUCKET_COL

    from pyspark.sql import functions as F

    from quick_stream_spark.sources.readers import load_table

    # DPP's benefit heuristic skips tiny tables (where a full scan is
    # cheaper than the pruning subquery — the semi-join still filters
    # correctly there, just without partition pruning).  Use the sf0.01
    # events table, a realistic incremental-merge target that engages it.
    sf_dir = "/root/testdata/sf0.01"
    ev = load_table(spark, sf_dir, "events")
    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "dpp"),
        keys=("user_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
    )
    t.upsert(ev.filter(F.col("event_id") % 4 == 0), newer_wins=True)
    up = t._prepare_updates(ev.filter(F.col("event_id") % 1000 == 1), dedup=False)
    pruned = t._pruned_current(up)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan.lower(), plan
    assert BUCKET_COL in plan


def test_schema_evolution_adds_column(spark, tmp_table_dir, store_kw):
    """A batch with a new column evolves the table; old winners read
    back NULL for it — including rows in buckets the evolving batch
    never rewrote (NULL-filled via the sidecar schema at read time)."""
    from pyspark.sql import functions as F

    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "evo"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
        **store_kw,
    )
    base = df(spark, [(k, datetime(2024, 1, 1), k, f"v{k}") for k in range(16)])
    t.upsert(base, newer_wins=True)
    # evolve with a single-key batch: most buckets stay untouched
    evolved = df(spark, [(1, datetime(2024, 1, 2), 100, "new")]).withColumn(
        "score", F.lit(9.5)
    )
    t.upsert(evolved, newer_wins=True)
    rows = {r.pkey: (r.payload, r.score) for r in t.read().collect()}
    assert rows[1] == ("new", 9.5)
    assert rows[2] == ("v2", None)  # untouched bucket, NULL-filled
    assert len(rows) == 16


def test_missing_columns_fail_fast_unless_allowed(spark, tmp_table_dir, store_kw):
    import pytest as _pytest

    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "miss"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
        **store_kw,
    )
    t.upsert(df(spark, [(1, datetime(2024, 1, 1), 1, "a")]))
    partial = spark.createDataFrame(
        [(2, datetime(2024, 1, 2), 2)], "pkey long, modified_date timestamp, arrival long"
    )
    with _pytest.raises(ValueError, match="missing table columns"):
        t.upsert(partial)
    t.upsert(partial, allow_missing_columns=True)
    rows = {r.pkey: r.payload for r in t.read().collect()}
    assert rows == {1: "a", 2: None}


def test_merge_observation_metrics(spark, table):
    """Every upsert refreshes last_merge_stats via Observation metrics
    (executor-side, no extra job) — the reference's per-cycle upsert
    count logs."""
    from datetime import datetime as dt

    table.upsert(df(spark, [(1, dt(2024, 1, 1), 1, "a"), (2, dt(2024, 1, 1), 2, "b")]))
    assert table.last_merge_stats == {"rows_written": 2, "rows_active": 2}
    table.upsert(df(spark, [(3, dt(2024, 1, 2), 3, "c")]))
    # merge rewrites only touched buckets: written = bucket residents
    assert table.last_merge_stats["rows_written"] >= 1
    assert table.last_merge_stats["rows_active"] == table.last_merge_stats["rows_written"]


def test_pre_reduce_upsert_matches_plain_path(spark, tmp_table_dir):
    """The hot-key skew guard (map-side max_by pre-reduce) must produce
    the identical end state as the plain merge window — including
    equal-version ties (earliest arrival wins) and batch-wins vs
    newer-wins — on a batch where one key carries most of the rows."""
    import os
    from datetime import datetime, timedelta

    from quick_stream_spark.operators.merge import KeyedTable

    base = datetime(2024, 1, 1)
    # viral key 7: many updates, with version ties at the top
    hot = [(7, base + timedelta(hours=min(i, 50)), i, f"h{i}") for i in range(200)]
    cold = [(k, base + timedelta(hours=k), 1000 + k, f"c{k}") for k in range(10)]
    first = [(7, base, 0, "seed"), (3, base, 1, "seed3")]

    states = {}
    for variant, pre in (("plain", False), ("reduced", True)):
        for nw in (False, True):
            t = KeyedTable(
                spark,
                os.path.join(tmp_table_dir, f"t_{variant}_{nw}"),
                keys=("pkey",),
                version_col="modified_date",
                arrival_col="arrival",
                num_buckets=4,
            )
            schema = "pkey long, modified_date timestamp, arrival long, payload string"
            t.upsert(spark.createDataFrame(first, schema))
            t.upsert(
                spark.createDataFrame(hot + cold, schema),
                newer_wins=nw,
                pre_reduce=pre,
            )
            states[(variant, nw)] = {
                r.pkey: (r.modified_date, r.arrival, r.payload)
                for r in t.read().collect()
            }
    assert states[("plain", False)] == states[("reduced", False)]
    assert states[("plain", True)] == states[("reduced", True)]
    # the tie rule itself: among the capped-version rows of the hot key,
    # the EARLIEST arrival at the max version wins
    assert states[("plain", True)][7][1] == 50


def test_maybe_compact_policy(spark, tmp_table_dir):
    """Auto-compaction fires only past the per-bucket file threshold,
    preserves values, and is metadata-cheap when below it."""
    import os
    from datetime import datetime

    from quick_stream_spark.operators.merge import KeyedTable

    for protocol in ("direct", "manifest"):
        t = KeyedTable(
            spark,
            os.path.join(tmp_table_dir, f"mc_{protocol}"),
            keys=("pkey",),
            version_col="modified_date",
            arrival_col="arrival",
            num_buckets=1,  # every merge appends files to the same bucket
            commit_protocol=protocol,
        )
        schema = "pkey long, modified_date timestamp, arrival long, payload string"
        # AQE coalescing collapses tiny merges to one task file; disable
        # it so the merge writes several task-aligned files per bucket
        prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            t.upsert(
                spark.createDataFrame(
                    [(k, datetime(2024, 1, 1), k, f"p{k}") for k in range(64)],
                    schema,
                ).repartition(8)
            )
            t.upsert(
                spark.createDataFrame(
                    [(k, datetime(2024, 1, 2), 100 + k, f"q{k}") for k in range(64)],
                    schema,
                ).repartition(8)
            )
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
        assert t.file_count() > 1
        before = {r.pkey: r.payload for r in t.read().collect()}
        assert t.maybe_compact(max_files_per_bucket=100) is False  # under threshold
        assert t.maybe_compact(max_files_per_bucket=1) is True
        assert {r.pkey: r.payload for r in t.read().collect()} == before


def test_delete_paths_skip_cosmetic_bucket_repartition(spark, ptable):
    """soft_delete / hard_delete must write with repartition=False like
    the upsert path: their key-joins already leave rows bucket-coherent,
    so a bucket re-shuffle before the write is a full extra exchange per
    delete batch.  Pinned two ways: the _write call's flag, and the
    absence of a RoundRobin/bucket repartition exchange in the plan
    actually handed to the writer."""
    ptable.upsert(df(spark, [(k, datetime(2024, 1, 1), k, f"p{k}") for k in range(20)]))
    seen = []
    orig = ptable._write

    def spy(frame, mode, repartition=True):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        seen.append((repartition, plan))
        return orig(frame, mode, repartition=repartition)

    ptable._write = spy
    try:
        ptable.soft_delete(df(spark, [(1, datetime(2024, 2, 1), 30, "x")]))
        ptable.hard_delete(df(spark, [(2, datetime(2024, 2, 2), 31, "x")]))
    finally:
        ptable._write = orig
    assert [flag for flag, _ in seen] == [False, False]
    for _, plan in seen:
        # an explicit .repartition(bucket) shuffle would print with the
        # REPARTITION_BY_COL origin; join-required ENSURE_REQUIREMENTS
        # exchanges (e.g. the DPP distinct) are legitimate and ignored
        assert "REPARTITION_BY_COL" not in plan, plan
    assert state(ptable)[1] == ("p1", False)
    assert 2 not in state(ptable)


def test_layout_maintenance_ops_reject_custom_store(spark, tmp_table_dir):
    """compact/maybe_compact/file_count manage the inline parquet
    layout; on a store-backed KeyedTable they must fail with a clear
    contract error (ADVICE r4), and composing a custom store with
    streaming auto-compaction must fail at BUILD time, not mid-stream
    inside foreachBatch."""
    from quick_stream_spark.operators.backends import InMemoryBucketStore
    from quick_stream_spark.streaming.stream import UpsertQuickStream

    t = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "stored"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
        store=InMemoryBucketStore(spark),
    )
    for op in (t.compact, t.maybe_compact, t.file_count):
        with pytest.raises(ValueError, match="BucketStore"):
            op()
    with pytest.raises(ValueError, match="auto_compact_every"):
        UpsertQuickStream(t, auto_compact_every=2)
