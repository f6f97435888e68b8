"""Reference-semantics queries (SURVEY.md §2.1 O1-O10, O15-O17).

These replay the reference's end-state contract on the ``events`` table
(FIXTURES.md fixture roles: ``user_id`` is the pkey, ``ts`` the
``modified_date``, ``event_id`` the arrival order).  Each query drives
the REAL operators — actual merges into a temp managed table, actual
Structured Streaming replay — and the oracle states the end-state
contract in plain SQL, so the comparison checks semantics, not plumbing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.operators.dedup import latest_per_key
from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.operators.router import MultiTableRouter
from quick_stream_spark.plans._util import pin_session, rows_sized_parts, scoped_shuffle, shared_cache
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import (
    load_table,
    stream_parquet_dir,
    write_batches_as_files,
    write_split_as_files,
)
from quick_stream_spark.streaming.stream import UpsertQuickStream

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session(spark)
    return load_table(spark, sf_dir, "events")


_EVENTS_COUNT_CACHE: dict = shared_cache({})


def _events_scope(spark: SparkSession, sf_dir: str):
    """Scoped shuffle width for the eager merge replays: a merge's
    window shuffles the batch + touched buckets, so width follows the
    events row count (metadata-only parquet count, cached).  The
    returned end-state read is lazy and runs at the ambient width."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EVENTS_COUNT_CACHE:
        _EVENTS_COUNT_CACHE[key] = load_table(spark, sf_dir, "events").count()
    return scoped_shuffle(spark, rows_sized_parts(_EVENTS_COUNT_CACHE[key], 100_000))


def _table(spark: SparkSession, **kw) -> KeyedTable:
    return KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("user_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        **kw,
    )


# --------------------------------------------------------------------------
# O1/O2 — last-writer-wins dedup


_LATEST_PER_KEY_SQL = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
"""


@register(
    "r_dedup_latest_per_key",
    oracle=f"""
    SELECT 'window' AS impl, * FROM ({_LATEST_PER_KEY_SQL})
    UNION ALL
    SELECT 'agg' AS impl, * FROM ({_LATEST_PER_KEY_SQL})
    """,
    tags=("reference", "dedup"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 (lib.rs:12-16): one row per key, newest ``ts`` wins, equal-ts
    ties go to the earliest arrival — computed by BOTH physical
    strategies, tagged: the window variant (row_number, map-side
    WindowGroupLimit pre-reduction) and the aggregation variant (max_by
    over a struct, map-side partial aggregation — the shuffle-light
    choice when keys repeat within partitions).  Identical results by
    construction; the oracle states the contract once for each tag."""
    from quick_stream_spark.operators.dedup import latest_per_key_agg

    ev = _events(spark, sf_dir)
    win = latest_per_key(
        ev, keys=("user_id",), version_col="ts", arrival_col="event_id"
    ).select(F.lit("window").alias("impl"), *EVENT_COLS)
    agg = latest_per_key_agg(
        ev, keys=("user_id",), version_col="ts", arrival_col="event_id"
    ).select(F.lit("agg").alias("impl"), *EVENT_COLS)
    return win.unionByName(agg)


# --------------------------------------------------------------------------
# O5 — upsert end state (two-batch replay, faithful ON CONFLICT DO UPDATE)


@register(
    "r_upsert_endstate",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge"),
)
def r_upsert_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 (upsert.rs:271-303): replay two batches (even event_ids, then
    odd) through real merges.  Batch-wins semantics: the second batch's
    record overwrites even when its ``ts`` is older — exactly the
    reference's unconditional ``DO UPDATE`` (lib.rs:111)."""
    ev = _events(spark, sf_dir)
    target = _table(spark)
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0))
        target.upsert(ev.filter(F.col("event_id") % 2 == 1))
    return target.read().select(*EVENT_COLS, "row_active")


@register(
    "r_upsert_endstate_guarded",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge"),
)
def r_upsert_endstate_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 with the newer-wins idempotency guard: end state is the global
    argmax per key, independent of batch order."""
    ev = _events(spark, sf_dir)
    target = _table(spark)
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
    return target.read().select(*EVENT_COLS, "row_active")


@register(
    "r_upsert_endstate_manifest",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge", "manifest"),
)
def r_upsert_endstate_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r_upsert_endstate replayed through the MANIFEST commit protocol
    (operators/commitlog.py): append-only data files published by
    atomic snapshot manifests — the crash-consistent mode.  The oracle
    is identical to the direct protocol's by construction; protocol
    choice is purely physical."""
    ev = _events(spark, sf_dir)
    target = _table(spark, commit_protocol="manifest")
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0))
        target.upsert(ev.filter(F.col("event_id") % 2 == 1))
    return target.read().select(*EVENT_COLS, "row_active")


@register(
    "r_upsert_endstate_pointer",
    bench=True,  # the bounded-commit ingestion leg in BENCH (r12 ask #4)
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 4) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge", "bounded"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_upsert_endstate_pointer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r_upsert_endstate replayed on the POINTER layout (bounded
    O(commit) commits: ``manifest_parquet_threshold=0``, checkpoint
    cadence 3) with four sequential batches, so the paths a long-lived
    big table actually runs — delta documents, the seed parquet-
    checkpoint crossing inside ``commit_bounded``, and a cadence
    checkpoint — are exercised AND timed in BENCH, not only in unit
    timings (r12 verdict ask #4).  Batch-wins semantics: the winner per
    key is the row from the highest batch index (later batch
    unconditionally overwrites — lib.rs:111), then latest ``ts``,
    earliest arrival."""
    ev = _events(spark, sf_dir)
    target = _table(
        spark,
        commit_protocol="manifest",
        manifest_checkpoint_interval=3,
        manifest_parquet_threshold=0,
    )
    with _events_scope(spark, sf_dir):
        for b in range(4):
            target.upsert(ev.filter(F.col("event_id") % 4 == b))
    return target.read().select(*EVENT_COLS, "row_active")


@register(
    "r_incremental_read_zonemap",
    # end state = guarded (newer-wins) latest per key; the incremental
    # read returns exactly its rows with ts >= max(ts) - 30 days.  The
    # cut is computed from the same events table by both engines — no
    # interpolated quantiles, so the boundary is exact.
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    )
    WHERE rn = 1
      AND ts >= (SELECT max(ts) - INTERVAL '30 days' FROM events)
    """,
    tags=("reference", "merge", "skipping"),
    )
def r_incremental_read_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map incremental consumption (KeyedTable.read_range): merge
    two real batches into a manifest table tracking per-bucket min/max
    of the version column, then read "rows modified in the last 30
    days" — the scan opens only buckets whose committed ts bounds
    overlap the cut (pruning audited in tests/test_zone_maps.py; this
    query pins the RESULT contract: read_range == end state filtered).
    Reference anchor: the reference re-reads whole target tables per
    cycle (upsert.rs:271-303 has no read pruning); this is the
    capability a 100 TB downstream consumer needs instead of CDC."""
    ev = _events(spark, sf_dir)
    target = _table(spark, commit_protocol="manifest", zone_map_cols=("ts",))
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
    cut = ev.agg(F.expr("max(ts) - INTERVAL 30 DAYS").alias("c")).collect()[0].c
    return target.read_range("ts", lo=cut).select(*EVENT_COLS, "row_active")


@register(
    "r_point_lookup_endstate",
    # batch-wins end state (odd batch second, unconditional DO UPDATE)
    # restricted to the looked-up key set
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id % 25 = 0
    """,
    tags=("reference", "merge", "skipping"),
    )
def r_point_lookup_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-pruned point reads (KeyedTable.lookup): after the standard
    two-batch replay, look up a bounded key set (user_id % 25 == 0) —
    the read opens only those keys' hash buckets (bucket = hash(key) %
    N is the layout, so a k-key lookup costs k buckets at any table
    size; file-level pruning audited in tests/test_zone_maps.py).  The
    oracle restates the batch-wins end state restricted to the same
    keys."""
    ev = _events(spark, sf_dir)
    target = _table(spark, commit_protocol="manifest")
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0))
        target.upsert(ev.filter(F.col("event_id") % 2 == 1))
    keys = sorted(
        r.user_id
        for r in ev.select("user_id")
        .filter(F.col("user_id") % 25 == 0)
        .distinct()
        .collect()
    )
    return target.lookup(keys).select(*EVENT_COLS, "row_active")


@register(
    "r_lookup_composite_endstate",
    # guarded (newer-wins) end state per COMPOSITE key, restricted to
    # the looked-up key tuples
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id % 25 = 0 AND event_type IN ('click', 'view')
    """,
    tags=("reference", "merge", "skipping"),
)
def r_lookup_composite_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key point reads with leading-key zone pruning (r10):
    the table is keyed on (user_id, event_type) — the reference's
    single-i64-pkey model generalized — clustered on the leading key
    (``compact(sort_by=keys[0])``), and a bounded tuple set is looked
    up.  Hash pruning opens only the tuples' buckets; inside them the
    per-file user_id bounds skip the other key ranges' slices (prefix
    pruning; the residual semi-join resolves event_type) — the
    multi-key twin of ``r_point_lookup_endstate``.  The oracle
    restates the newer-wins end state per composite key restricted to
    the same tuples."""
    ev = _events(spark, sf_dir)
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("user_id", "event_type"),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        commit_protocol="manifest",
        zone_map_cols=("user_id",),
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        target.compact(target_files_per_bucket=4, sort_by="user_id")
    keys = sorted(
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type")
        .filter(
            (F.col("user_id") % 25 == 0)
            & F.col("event_type").isin("click", "view")
        )
        .distinct()
        .collect()
    )
    return target.lookup(keys).select(*EVENT_COLS, "row_active")


@register(
    "r_read_where_clustered",
    # guarded end state, conjunctively sliced: last 30 days AND a
    # user-id band; the ts cut comes from the data in both engines
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    )
    WHERE rn = 1
      AND ts >= (SELECT max(ts) - INTERVAL '30 days' FROM events)
      AND user_id BETWEEN 3 AND 9
    """,
    tags=("reference", "merge", "skipping"),
)
def r_read_where_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive 2-dim zone-pruned consumption (r10): the merged
    table is HIERARCHICALLY clustered — ``compact(sort_by=(ts,
    user_id))`` cuts each bucket into ts-range slices with user_id
    contiguous inside equal-ts runs — then ``read_where`` slices on
    BOTH dimensions ("rows modified in the last 30 days for this user
    band"), opening only files whose committed bounds overlap both
    ranges (2-dim skip rate measured in tests/test_zone_maps.py).
    The residual filters keep the result exactly equal to
    ``read().filter(...)`` on any layout — mis-tuned clustering can
    only cost speed, never correctness."""
    ev = _events(spark, sf_dir)
    target = _table(
        spark, commit_protocol="manifest", zone_map_cols=("ts", "user_id")
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        target.compact(target_files_per_bucket=4, sort_by=("ts", "user_id"))
    cut = ev.agg(F.expr("max(ts) - INTERVAL 30 DAYS").alias("c")).collect()[0].c
    return target.read_where(
        {"ts": (cut, None), "user_id": (3, 9)}
    ).select(*EVENT_COLS, "row_active")


@register(
    "r_read_where_zorder",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    # the table is keyed on event_id (every event is a row), so the
    # guarded end state is the events table itself; the query slices
    # it on two ORTHOGONAL dimensions
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM events
    WHERE user_id BETWEEN 20 AND 60 AND value BETWEEN 50.0 AND 120.0
    """,
    tags=("reference", "merge", "skipping"),
)
def r_read_where_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered conjunctive consumption (r11, verdict ask #6):
    ``compact(method='zorder', sort_by=('user_id', 'value'))``
    interleaves range-rank bits so every file covers a narrow
    RECTANGLE in (user_id, value) — the right layout for fine-grained
    ORTHOGONAL dimensions, where the hierarchical sort of
    ``r_read_where_clustered`` would leave the secondary bounds
    full-range.  ``read_where`` then slices on both dimensions,
    opening only files whose committed per-file bounds overlap BOTH
    bands (side-by-side layout measurement in tests/test_zone_maps.py:
    13/32 vs 32/32 files on the orthogonal case).  The residual
    filters keep the result exactly equal to ``read().filter(...)`` —
    rank approximation can only cost skipping sharpness, never
    correctness.  The table is keyed on ``event_id`` so the merged end
    state is the full events set and the pruning works at data scale."""
    ev = _events(spark, sf_dir)
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("event_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        commit_protocol="manifest",
        zone_map_cols=("user_id", "value"),
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        target.compact(
            target_files_per_bucket=4,
            sort_by=("user_id", "value"),
            method="zorder",
        )
    return target.read_where(
        {"user_id": (20, 60), "value": (50.0, 120.0)}
    ).select(*EVENT_COLS, "row_active")


@register(
    "r_lookup_bloom_endstate",
    # keyed on event_id, so the end state is the events table itself
    # restricted to the looked-up key set
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM events
    WHERE event_id % 97 = 0
    """,
    tags=("reference", "merge", "skipping"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def r_lookup_bloom_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sidecar point lookups on an UNSORTED high-cardinality key
    (r11): the table is keyed on ``event_id`` with
    ``key_bloom_bits`` set, so every commit writes a per-file
    ``.kbloom`` sidecar over the file's key tuples; after an unsorted
    multi-file compaction (``compact(target_files_per_bucket=4)`` —
    the shape of a large rolled bucket, where zone maps cannot prune
    because nothing is sorted), a bounded key lookup opens ~1 file per
    key instead of the key's whole bucket: hash pruning picks the
    bucket, the bloom drops its other rolled files (file-skip rate
    measured in tests/test_key_bloom.py; false positives only — the
    residual semi-join keeps the result exactly the key-filtered end
    state).  Delta/Iceberg expose the same capability as bloom filter
    indexes; the reference re-reads whole tables per cycle
    (upsert.rs:271-303)."""
    ev = _events(spark, sf_dir)
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("event_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        commit_protocol="manifest",
        key_bloom_bits=1 << 14,
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        target.compact(target_files_per_bucket=4)  # rolled, UNSORTED
    keys = sorted(
        r.event_id
        for r in ev.select("event_id")
        .filter(F.col("event_id") % 97 == 0)
        .distinct()
        .collect()
    )
    return target.lookup(keys).select(*EVENT_COLS, "row_active")


_PRUNING_CHECKS = (
    "zone_files_positive",
    "zone_prunes_some_files",
    "zone_skip_floor",
    "zone_counts_consistent",
    "unmapped_col_full_scan",
    "lookup_buckets_bounded",
    "bloom_prunes_some_files",
    "bloom_skip_floor",
)


@register(
    "r_pruning_diagnostics",
    # the contract is a fixed set of (check, ok) rows: every check must
    # hold on ANY correct layout at ANY sf, the way the HLL accuracy
    # contract pins approx_count_distinct — a silent regression of the
    # zone/bloom pruning pipeline to full scans flips a row to FALSE
    # and hash-mismatches
    oracle="SELECT check_name, TRUE AS ok FROM (VALUES "
    + ", ".join(f"('{c}')" for c in _PRUNING_CHECKS)
    + ") AS t(check_name)",
    tags=("reference", "merge", "skipping", "diagnostics"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def r_pruning_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planning-diagnostics contract (r11 verdict ask #3): the storage
    layer's ``skipping_stats`` / ``lookup_stats`` answers — how much a
    conjunctive range scan and a bounded point lookup would skip,
    WITHOUT running the scan — exported as boolean contract rows so the
    driver oracle fails if pruning silently regresses to full scans.

    One Z-order-clustered, bloom-indexed table exercises both planning
    pipelines (the same layout the ``r_read_where_zorder`` /
    ``r_lookup_bloom_endstate`` flagships consume):

    - ``skipping_stats`` on the conjunctive (user_id, value) rectangle
      must report fewer files scanned than total (zone pruning engaged)
      with a skip-rate floor, while a range on an UN-zone-mapped column
      must honestly report 0.0 skipped (everything scans) — the
      operational "this table needs zone_map_cols" signal;
    - ``lookup_stats`` on 3 point keys must bound the scanned buckets
      by the key count (hash layout) and report the bloom sidecars
      dropping rolled files inside those buckets, with a skip floor.

    The reference re-reads whole tables per cycle (upsert.rs:271-303);
    Delta/Iceberg expose the same planning metadata via file stats +
    bloom indexes but no first-class skip-rate diagnostic."""
    ev = _events(spark, sf_dir)
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("event_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        commit_protocol="manifest",
        zone_map_cols=("user_id", "value"),
        key_bloom_bits=1 << 17,
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        target.compact(
            target_files_per_bucket=4,
            sort_by=("user_id", "value"),
            method="zorder",
        )
    zs = target.skipping_stats({"user_id": (20, 60), "value": (50.0, 120.0)})
    fs = target.skipping_stats({"event_type": ("a", "z")})  # no zones col
    keys = [
        r.event_id
        for r in ev.select("event_id")
        .filter(F.col("event_id") % 97 == 0)
        .distinct()
        .orderBy("event_id")
        .limit(3)
        .collect()
    ]
    ls = target.lookup_stats(keys)
    results = {
        "zone_files_positive": zs["files_total"] > 0,
        "zone_prunes_some_files": zs["files_scanned"] < zs["files_total"],
        "zone_skip_floor": zs["skipped_fraction"] >= 0.25,
        "zone_counts_consistent": (
            zs["files_scanned"] <= zs["files_total"]
            and zs["buckets_scanned"] <= zs["buckets_total"]
        ),
        "unmapped_col_full_scan": (
            fs["skipped_fraction"] == 0.0
            and fs["files_scanned"] == fs["files_total"]
        ),
        "lookup_buckets_bounded": (
            ls["buckets_scanned"] <= len(keys)
            and ls["buckets_scanned"] <= ls["buckets_total"]
        ),
        "bloom_prunes_some_files": ls["files_scanned"] < ls["files_in_buckets"],
        "bloom_skip_floor": ls["skipped_fraction"] >= 0.4,
    }
    return spark.createDataFrame(
        [(c, bool(results[c])) for c in _PRUNING_CHECKS],
        "check_name string, ok boolean",
    )


_MAINT_CHECKS = (
    "restore_roundtrip_state",
    "restore_is_metadata_only",
    "restore_keeps_time_travel",
    "history_versions_match",
    "history_rows_reconcile",
    "vacuum_reclaims_exact",
    "vacuum_preserves_endstate",
    "vacuum_drops_old_versions",
)


@register(
    "r_maintenance_contract",
    # like r_pruning_diagnostics: the contract is a fixed set of
    # (check, ok) rows that must hold on ANY correct maintenance
    # implementation at ANY sf — a silent regression of restore /
    # vacuum / history flips a row to FALSE and hash-mismatches
    oracle="SELECT check_name, TRUE AS ok FROM (VALUES "
    + ", ".join(f"('{c}')" for c in _MAINT_CHECKS)
    + ") AS t(check_name)",
    tags=("reference", "merge", "maintenance", "diagnostics"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_maintenance_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance contract (r12 verdict ask #3): the table-maintenance
    surface — ``restore`` (Delta RESTORE analog), ``vacuum``
    (unreferenced-file reclaim) and ``history()`` row metrics (the
    operationMetrics analog) — exported as boolean contract rows, the
    way ``r_pruning_diagnostics`` pins pruning.

    The table runs on the POINTER layout (``manifest_parquet_threshold
    =0``, cadence 3), so the paths this round's predecessors
    distributed — ``restore_bounded``'s chain-built checkpoint, the
    seed checkpoint inside ``commit_bounded``, and vacuum's
    spool + ANTI JOIN reclaim (commitlog.py) — are exactly the code
    under check, not the inline-JSON small-table path:

    - **restore** must round-trip the pre-corruption end state
      exactly (symmetric ``exceptAll`` empty both ways), be pure
      metadata (the republished bucket->file mapping is identical to
      the target version's), and keep the undone version time-travel
      readable (restore is a NEW commit, not history rewrite);
    - **history()** must list exactly the snapshot versions in order,
      tag the rollback commit ``op='restore'``, and its row metrics
      must reconcile: for every delta commit with stats coverage,
      ``rows_total == prev rows_total + num_rows_added -
      num_rows_removed`` (at least one such row must exist — the
      check cannot pass vacuously);
    - **vacuum(keep_versions=1)** must reclaim EXACTLY the data files
      on disk that the kept snapshot does not reference (the expected
      set is computed independently here by walking the commits dir
      and diffing against the kept manifest), preserve the end state
      byte-for-byte, and make the dropped version's time travel fail
      loudly (FileNotFoundError), never return stale rows.

    The reference has no maintenance surface at all — it re-reads
    whole tables per cycle (upsert.rs:271-303) and leaves retention to
    the DBA; Delta documents the same three contracts (RESTORE /
    VACUUM / DESCRIBE HISTORY) informally but ships no executable
    check of them."""
    import os

    from quick_stream_spark.operators.commitlog import COMMITS_DIR

    ev = _events(spark, sf_dir)
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/t",
        keys=("event_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=8,
        commit_protocol="manifest",
        manifest_checkpoint_interval=3,
        manifest_parquet_threshold=0,
    )
    log = target._snapshot_log()
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(ev.filter(F.col("event_id") % 2 == 1), newer_wins=True)
        # v3 = cadence: the seed parquet checkpoint crossing
        target.soft_delete(ev.filter(F.col("event_id") % 11 == 0))
        good = target.snapshot_versions()[-1]
        # the "bad" batch restore must undo: newer timestamps so
        # newer-wins applies, values corrupted
        target.upsert(
            ev.filter(F.col("event_id") % 7 == 0)
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 365 DAYS"))
            .withColumn("value", -F.col("value")),
            newer_wins=True,
        )
        bad = target.snapshot_versions()[-1]
        restored = target.restore(good)

    def _same_state(va, vb) -> bool:
        a = target.read(version=va).select(*EVENT_COLS, "row_active")
        b = target.read(version=vb).select(*EVENT_COLS, "row_active")
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    results = {
        "restore_roundtrip_state": _same_state(restored, good),
        "restore_is_metadata_only": (
            {b: sorted(fl) for b, fl in log.read(restored).items()}
            == {b: sorted(fl) for b, fl in log.read(good).items()}
        ),
        "restore_keeps_time_travel": (
            not _same_state(bad, good)  # still readable AND different
        ),
    }
    hist = target.history().orderBy("version").collect()
    results["history_versions_match"] = (
        [r["version"] for r in hist] == target.snapshot_versions()
        and hist[-1]["op"] == "restore"
    )
    prev_total, reconciled, ok = None, 0, True
    for r in hist:
        if (
            r["kind"] == "delta"
            and prev_total is not None
            and r["num_rows_added"] is not None
            and r["num_rows_removed"] is not None
            and r["rows_total"] is not None
        ):
            reconciled += 1
            ok = ok and (
                r["rows_total"]
                == prev_total + r["num_rows_added"] - r["num_rows_removed"]
            )
        if r["rows_total"] is not None:
            prev_total = r["rows_total"]
    results["history_rows_reconcile"] = (
        ok and reconciled >= 1 and hist[-1]["rows_total"] == target.count_fast()
    )
    # independent expected-garbage set: every data file on disk under
    # the commits dir minus the kept (latest) snapshot's references
    croot = os.path.join(target.path, COMMITS_DIR)
    on_disk = {
        os.path.relpath(os.path.join(d, f), target.path)
        for d, _, fl in os.walk(croot)
        for f in fl
        if f.endswith(".parquet")
    }
    referenced = {p for fl in log.read(restored).values() for p in fl}
    expected_garbage = on_disk - referenced
    # independent pre-vacuum end-state snapshot (plain parquet copy):
    # if vacuum wrongly reclaims a REFERENCED file, the post-vacuum
    # read loses rows (or fails) against this copy
    pre_dir = tempfile.mkdtemp(prefix="qss-q-") + "/pre"
    target.read().select(*EVENT_COLS, "row_active").write.parquet(pre_dir)
    removed = target.vacuum(keep_versions=1)
    results["vacuum_reclaims_exact"] = (
        removed == len(expected_garbage) and removed > 0
    )
    pre = spark.read.parquet(pre_dir)
    post = target.read().select(*EVENT_COLS, "row_active")
    results["vacuum_preserves_endstate"] = (
        pre.exceptAll(post).isEmpty() and post.exceptAll(pre).isEmpty()
    )
    try:
        target.read(version=bad).count()
        results["vacuum_drops_old_versions"] = False
    except FileNotFoundError:
        results["vacuum_drops_old_versions"] = True
    return spark.createDataFrame(
        [(c, bool(results[c])) for c in _MAINT_CHECKS],
        "check_name string, ok boolean",
    )


# --------------------------------------------------------------------------
# O6 — soft / hard delete end state


@register(
    "r_delete_endstate",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT 'soft' AS mode, event_id, ts, user_id, event_type, value, props,
           user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
             AS row_active
    FROM latest
    UNION ALL
    SELECT 'hard' AS mode, event_id, ts, user_id, event_type, value, props,
           TRUE AS row_active
    FROM latest
    WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
    """,
    tags=("reference", "delete"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_delete_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (delete.rs:251-285): upsert everything, then delete every key
    that ever produced an 'error' event — both delete executors, tagged:

    - ``soft`` — deleted keys keep their row with ``row_active=false``
      (the reference's "data soft deleter");
    - ``hard`` — WHEN MATCHED THEN DELETE: rows physically removed.
    """
    ev = _events(spark, sf_dir)
    deletes = ev.filter(F.col("event_type") == "error")
    with _events_scope(spark, sf_dir):
        soft = _table(spark)
        soft.upsert(ev, newer_wins=True)
        soft.soft_delete(deletes)
        hard = _table(spark)
        hard.upsert(ev, newer_wins=True)
        hard.hard_delete(deletes)
    return (
        soft.read()
        .select(F.lit("soft").alias("mode"), *EVENT_COLS, "row_active")
        .unionByName(
            hard.read().select(F.lit("hard").alias("mode"), *EVENT_COLS, "row_active")
        )
    )


# --------------------------------------------------------------------------
# O7-O10 — multi-table routing


def _build_router(spark: SparkSession, ev: DataFrame) -> MultiTableRouter:
    types = sorted(r[0] for r in ev.select("dest_table").distinct().collect())
    return MultiTableRouter(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/multi",
        table_col="dest_table",
        tables=types,
        keys=("user_id",),
        version_col="ts",
        arrival_col="event_id",
        num_buckets=4,
    )


@register(
    "r_multi_table_endstate",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY event_type, user_id ORDER BY ts DESC, event_id ASC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT 'upserted' AS phase, event_type AS dest_table, event_id, ts, user_id, value,
           TRUE AS row_active
    FROM latest
    UNION ALL
    SELECT 'after_delete' AS phase, event_type AS dest_table, event_id, ts, user_id, value,
           NOT (event_type = 'purchase'
                AND user_id IN (SELECT user_id FROM events WHERE event_type = 'error'))
             AS row_active
    FROM latest
    """,
    tags=("reference", "routing", "delete"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_multi_table_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7-O10 (multi_table_upsert.rs:138-198, multi_table_delete.rs:
    323-448): records routed to one destination table per
    ``event_type``, deduped per (table, key) — the same key may live in
    several tables independently (support.rs:8-59).  Two tagged phases:

    - ``upserted`` — end state after routing + upsert (all rows active);
    - ``after_delete`` — after additionally soft-deleting, only in the
      'purchase' table, every user that ever errored: per-table
      isolation, the same key stays active in all other tables.

    Two independent router instances because KeyedTable reads are live
    views of the backing path — the phase-1 snapshot must not observe
    the phase-2 delete.
    """
    ev = _events(spark, sf_dir).withColumnRenamed("event_type", "dest_table")
    upserted = _build_router(spark, ev)
    with _events_scope(spark, sf_dir):
        upserted.upsert_batch(ev, newer_wins=True)

    deleted = _build_router(spark, ev)
    with _events_scope(spark, sf_dir):
        deleted.upsert_batch(ev, newer_wins=True)
    err_users = ev.filter(F.col("dest_table") == "error").select("user_id").distinct()
    deletes = (
        ev.join(err_users, "user_id")
        .filter(F.col("dest_table") == "purchase")
        .select("user_id", "ts", "event_id", F.lit("purchase").alias("dest_table"))
    )
    with _events_scope(spark, sf_dir):
        deleted.soft_delete_batch(deletes)

    cols = ["dest_table", "event_id", "ts", "user_id", "value", "row_active"]
    return (
        upserted.read_union()
        .select(F.lit("upserted").alias("phase"), *cols)
        .unionByName(deleted.read_union().select(F.lit("after_delete").alias("phase"), *cols))
    )


@register(
    "r_schema_evolution",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props,
           CASE WHEN event_id % 2 = 1 THEN round(value * 2, 2) END AS score,
           TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge", "schema-evolution"),
)
def r_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the merge path (the reference's
    ``Option<>`` nullable fields, multi_table_upsert.rs:587-588): batch
    one carries the original schema, batch two adds a ``score`` column.
    The table evolves in place — keys whose winning row came from batch
    one read back NULL for the added column (including rows in buckets
    the evolving batch never touched, which are NULL-filled at read
    time via the sidecar schema instead of a file rewrite)."""
    ev = _events(spark, sf_dir)
    target = _table(spark)
    evolved = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "score", F.round(F.col("value") * 2, 2)
    )
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(evolved, newer_wins=True)
    return target.read().select(*EVENT_COLS, "score", "row_active")


# --------------------------------------------------------------------------
# wide-row parity: the reference's flagship integration fixture is a
# 45-column rail-tracking table (lib.rs:108-178, ``ftp_current``) —
# replay that width through upsert + schema evolution + soft delete.
#
# Every column is derived from the events row by an expression written
# ONCE in the SQL subset both engines share, evaluated by Spark via
# F.expr and spliced verbatim into the DuckDB oracle — the two sides
# cannot drift.  The mix deliberately covers the reference row's type
# surface: bigints, ints, strings, 'Y'/'N' flags, timestamps (+interval
# arithmetic), doubles-derived ints, and five distinct NULL patterns
# (including two always-NULL typed columns, the reference's perpetually
# NULL Option<> fields).
#
# Dialect-shared subset notes: CAST(floor(x) AS INT), never
# CAST(double AS INT) (DuckDB rounds, Spark truncates); INTERVAL n UNIT
# (both accept the unquoted form); STRING type alias (both).

_WIDE_COLS: tuple[tuple[str, str], ...] = (
    ("ftpc_tripplannumber", "user_id * 1000 + event_id % 997"),
    ("ftpc_tripplanversion", "CAST(1 + event_id % 3 AS INT)"),
    ("ftpc_scheduleeventseq", "CAST(event_id % 50 AS INT)"),
    ("ftpc_scheduleeventcode",
     "CASE WHEN event_id % 2 = 0 THEN 'ARV' ELSE 'DEP' END"),
    ("ftpc_scheduleeventtype",
     "CASE WHEN user_id % 5 = 0 THEN NULL ELSE event_type END"),
    ("ftpc_scheduleeventcity", "concat('CITY', CAST(user_id % 100 AS STRING))"),
    ("ftpc_scheduleeventstate",
     "CASE WHEN user_id % 3 = 0 THEN 'MO' WHEN user_id % 3 = 1 THEN 'TX' "
     "ELSE 'IL' END"),
    ("ftpc_schedulerailcarrier",
     "CASE WHEN user_id % 4 = 0 THEN 'KCS' WHEN user_id % 4 = 1 THEN 'UP' "
     "WHEN user_id % 4 = 2 THEN 'BNSF' ELSE 'CN' END"),
    ("ftpc_scheduletrainid",
     "CASE WHEN event_id % 7 = 0 THEN NULL "
     "ELSE concat('T', CAST(event_id % 9000 AS STRING)) END"),
    ("ftpc_scheduledatetime", "ts"),
    ("ftpc_scheduletimemillis", "event_id * 60000"),
    ("ftpc_estimatedetadatetime",
     "CASE WHEN user_id % 9 = 0 THEN NULL ELSE ts + INTERVAL 4 HOUR END"),
    ("ftpc_estimatedetatimemillis",
     "CASE WHEN user_id % 9 = 0 THEN NULL ELSE event_id * 60000 + 240000 END"),
    ("ftpc_eventtimezone",
     "CASE WHEN user_id % 3 = 0 THEN 'EST' WHEN user_id % 3 = 1 THEN 'CST' "
     "ELSE 'MST' END"),
    ("ftpc_actualeventdatetime",
     "CASE WHEN event_id % 2 = 0 THEN NULL ELSE ts + INTERVAL 30 MINUTE END"),
    ("ftpc_actualtimemillis",
     "CASE WHEN event_id % 2 = 0 THEN NULL ELSE event_id * 1800 END"),
    ("ftpc_scheduledaynumber", "CAST(1 + user_id % 7 AS INT)"),
    ("ftpc_schedulecutofftime",
     "CASE WHEN user_id % 2 = 0 THEN NULL ELSE '17:00' END"),
    ("ftpc_schedulecutoffday",
     "CASE WHEN user_id % 2 = 0 THEN NULL ELSE CAST(user_id % 7 AS INT) END"),
    ("ftpc_operationmon", "CASE WHEN user_id % 2 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationtue", "CASE WHEN user_id % 3 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationwed", "CASE WHEN user_id % 4 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationthu", "CASE WHEN user_id % 5 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationfri", "CASE WHEN user_id % 6 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationsat", "CASE WHEN user_id % 7 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_operationsun", "CASE WHEN user_id % 8 = 0 THEN 'Y' ELSE 'N' END"),
    ("ftpc_comments",
     "CASE WHEN event_id % 3 = 0 THEN substring(props, 1, 16) ELSE NULL END"),
    ("ftpc_actualeventcode",
     "CASE WHEN event_id % 2 = 0 THEN NULL ELSE 'ARV' END"),
    ("ftpc_actualtrainid", "CAST(NULL AS STRING)"),
    ("ftpc_optn_prfmnce_ind",
     "CASE WHEN value >= 0 THEN 'ONTIME' ELSE 'LATE' END"),
    ("ftpc_optn_prfmnce_minutes", "CAST(floor(value) AS INT) % 600"),
    ("ftpc_ovrl_prfmnce_ind",
     "CASE WHEN value >= 50 THEN 'ONTIME' ELSE 'LATE' END"),
    ("ftpc_ovrl_prfmnce_minutes", "CAST(floor(value * 2) AS INT) % 600"),
    ("ftpc_consignee_id", "(user_id * 31) % 1000003"),
    ("ftpc_shipper_id", "(user_id * 37) % 999983"),
    ("ftpc_close_ind", "CASE WHEN user_id % 10 = 0 THEN '1' ELSE '0' END"),
    ("ftpc_clm_load_status",
     "CASE WHEN event_id % 4 = 0 THEN 'L' WHEN event_id % 4 = 1 THEN 'E' "
     "ELSE NULL END"),
    ("ftpc_clm_destination", "CAST(NULL AS STRING)"),
    ("id", "user_id"),
    ("modified_date", "ts"),
    ("ev_date_time",
     "CASE WHEN user_id % 11 = 0 THEN NULL ELSE ts - INTERVAL 1 HOUR END"),
    ("trax_created_date_time", "ts - INTERVAL 2 DAY"),
    ("trax_updated_date_time", "CAST(NULL AS TIMESTAMP)"),
    ("created_date", "ts - INTERVAL 3 DAY"),
    ("record_synced_datetime", "ts + INTERVAL 5 MINUTE"),
)

assert len(_WIDE_COLS) == 45, len(_WIDE_COLS)

_WIDE_SELECT_SQL = ",\n".join(f"{sql} AS {name}" for name, sql in _WIDE_COLS)


@register(
    "r_wide_row_endstate",
    oracle=f"""
    SELECT {_WIDE_SELECT_SQL},
           CASE WHEN event_id % 2 = 1 THEN 'cdc-replay' END AS ftpc_sync_source,
           user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
             AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "merge", "wide-row", "schema-evolution", "delete"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_wide_row_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-row parity at the reference's flagship integration width
    (lib.rs:108-178: the 45-column ``ftp_current`` INSERT): a
    ``ftp_current``-shaped record per event — same column names, same
    type mix, five NULL patterns including always-NULL ``Option<>``
    twins — replayed through the full merge surface: two-batch upsert
    (even event_ids, then odd) with the newer-wins guard, schema
    evolution (batch two adds ``ftpc_sync_source``; batch-one winners
    and untouched buckets read NULL back), and a soft delete of every
    key that ever errored.  Pins wide-schema column ordering,
    nullability, and NULL-fill semantics that the narrow fixtures
    cannot.  Keys follow the reference's MockData contract
    (lib.rs:96-106): pkey = ``id``, version = ``modified_date``."""
    ev = _events(spark, sf_dir)
    wide = ev.select(
        "event_id",
        "user_id",
        "event_type",
        *[F.expr(sql).alias(name) for name, sql in _WIDE_COLS],
    )
    target = KeyedTable(
        spark,
        tempfile.mkdtemp(prefix="qss-q-") + "/wide",
        keys=("id",),
        version_col="modified_date",
        arrival_col="event_id",
        num_buckets=8,
    )
    evolved = wide.filter(F.col("event_id") % 2 == 1).withColumn(
        "ftpc_sync_source", F.lit("cdc-replay")
    )
    with _events_scope(spark, sf_dir):
        target.upsert(wide.filter(F.col("event_id") % 2 == 0), newer_wins=True)
        target.upsert(evolved, newer_wins=True)
        target.soft_delete(wide.filter(F.col("event_type") == "error"))
    return target.read().select(
        *[name for name, _ in _WIDE_COLS], "ftpc_sync_source", "row_active"
    )


# --------------------------------------------------------------------------
# O3 — size-class split (logical parity check)


@register(
    "r_split_size_classes",
    oracle="""
    SELECT CAST(COUNT(*) // 100 AS BIGINT) AS hundreds,
           CAST((COUNT(*) % 100) // 10 AS BIGINT) AS tens,
           CAST(COUNT(*) % 10 AS BIGINT) AS singles,
           CAST(COUNT(*) // 100 + (COUNT(*) % 100) // 10
                + CASE WHEN COUNT(*) % 10 > 0 THEN 1 ELSE 0 END AS BIGINT) AS chunks
    FROM events
    """,
    tags=("reference",),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def r_split_size_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (lib.rs:24-58): the 100/10/1 size-class split is physically
    unnecessary on Spark (set-oriented MERGE), so parity is declared
    logically: the chunk arithmetic the reference would produce."""
    n = F.count(F.lit(1))
    return _events(spark, sf_dir).agg(
        (n / 100).cast("long").alias("hundreds"),
        ((n % 100) / 10).cast("long").alias("tens"),
        (n % 10).cast("long").alias("singles"),
        (
            (n / 100).cast("long")
            + ((n % 100) / 10).cast("long")
            + F.when(n % 10 > 0, 1).otherwise(0)
        ).alias("chunks"),
    )


# --------------------------------------------------------------------------
# O4/O15/O17 — streaming replay end-to-end


@register(
    "r_stream_upsert_endstate",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "streaming"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_stream_upsert_endstate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+O5+O15+O17 end-to-end: events split into four delivery files,
    replayed through a real Structured Streaming query (file source,
    availableNow) into the managed table.  Two files per trigger — the
    reference's lag-cycle ACCUMULATION (upsert.rs:158-204): deliveries
    arriving within one cycle are merged as one batch, so four
    deliveries cost two merges, not four.  The newer-wins guard makes
    the end state independent of micro-batch composition and order, so
    it is deterministic and SQL-expressible."""
    ev = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="qss-q-")
    # one job writes all four delivery files; batch order is arbitrary,
    # which the newer-wins guard makes irrelevant
    write_split_as_files(ev, F.col("event_id") % 4, 4, work + "/in")
    target = _table(spark)
    stream = stream_parquet_dir(spark, work + "/in", ev.schema, max_files_per_trigger=2)
    cfg = QuickStreamConfig(name="r-stream-upsert", checkpoint_dir=work + "/ckpt")
    with _events_scope(spark, sf_dir):
        UpsertQuickStream(target, config=cfg, newer_wins=True).run(
            stream, available_now=True
        )
    return target.read().select(*EVENT_COLS, "row_active")


@register(
    "r_stream_upsert_endstate_pointer",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "streaming", "manifest", "bounded"),
)
def r_stream_upsert_endstate_pointer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+O5+O15 composed with the POINTER layout (r13 verdict ask #2):
    the steady-state 100 TB storage configuration — bounded O(commit)
    commits (``manifest_parquet_threshold=0``) under a checkpoint
    cadence — driven by a REAL checkpointed Structured Streaming query,
    not batch replay.  Four delivery files at one file per trigger make
    four merge commits, so the stream CROSSES the cadence boundary
    mid-flight (delta, delta, checkpoint, delta) and the
    ``maybe_compact`` maintenance policy rides the stream cadence
    (``auto_compact_every=2`` — its bounded worst-bucket probe runs
    in-band twice; kill/resume and bounded-commit spies for this
    composition are pinned in tests/test_stream_pointer.py).  The
    newer-wins guard makes the end state independent of micro-batch
    composition, so the oracle is the same global argmax as the inline
    streaming leg's."""
    ev = _events(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="qss-q-")
    write_split_as_files(ev, F.col("event_id") % 4, 4, work + "/in")
    target = _table(
        spark,
        commit_protocol="manifest",
        manifest_checkpoint_interval=3,
        manifest_parquet_threshold=0,
    )
    stream = stream_parquet_dir(
        spark, work + "/in", ev.schema, max_files_per_trigger=1
    )
    cfg = QuickStreamConfig(
        name="r-stream-upsert-pointer", checkpoint_dir=work + "/ckpt"
    )
    with _events_scope(spark, sf_dir):
        UpsertQuickStream(
            target, config=cfg, newer_wins=True, auto_compact_every=2
        ).run(stream, available_now=True)
    return target.read().select(*EVENT_COLS, "row_active")


# --------------------------------------------------------------------------
# CDC — change data feed between the two replay commits


_CDC_S1_SQL = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
      FROM events WHERE event_id % 2 = 0
    ) WHERE rn = 1
"""
_CDC_S2_SQL = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
"""


@register(
    "r_cdc_changes",
    oracle=f"""
    WITH s1 AS ({_CDC_S1_SQL}), s2 AS ({_CDC_S2_SQL})
    SELECT s2.event_id, s2.ts, s2.user_id, s2.event_type, s2.value, s2.props,
           TRUE AS row_active, 'insert' AS _change_type, 2 AS _commit_version
    FROM s2 WHERE s2.user_id NOT IN (SELECT user_id FROM s1)
    UNION ALL
    SELECT s1.event_id, s1.ts, s1.user_id, s1.event_type, s1.value, s1.props,
           TRUE, 'update_preimage', 2
    FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.event_id <> s2.event_id
    UNION ALL
    SELECT s2.event_id, s2.ts, s2.user_id, s2.event_type, s2.value, s2.props,
           TRUE, 'update_postimage', 2
    FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.event_id <> s2.event_id
    """,
    tags=("reference", "merge", "manifest", "cdc"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over the two-commit replay: commit 1 merges the
    even event_ids, commit 2 the odd ones (batch-wins), then
    ``read_changes(v1, v2)`` emits the delta — inserts for users first
    seen in commit 2, update pre/post images where commit 2's batch-wins
    merge replaced the winner (a winner changes iff its event_id
    changed: each key's row IS one source event).  The oracle restates
    both snapshot states in SQL and diffs them; deletes cannot occur in
    an upsert-only replay.  The manifests are diffed file-first, so only
    buckets commit 2 rewrote are scanned (see KeyedTable.read_changes).
    """
    ev = _events(spark, sf_dir)
    target = _table(spark, commit_protocol="manifest")
    with _events_scope(spark, sf_dir):
        target.upsert(ev.filter(F.col("event_id") % 2 == 0))
        v1 = target.snapshot_versions()[-1]
        target.upsert(ev.filter(F.col("event_id") % 2 == 1))
        v2 = target.snapshot_versions()[-1]
        changes = target.read_changes(v1, v2).localCheckpoint(eager=True)
    return changes


@register(
    "r_cdc_replication",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props,
           user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error')
             AS row_active
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id % 7 <> 0
    """,
    tags=("reference", "manifest", "cdc", "replication"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replication end-to-end (operators/replicate.py): a second
    engine-managed table is kept in sync with the source purely by
    consuming the source's change feed — the Delta-CDF consumer pattern,
    and the logical twin of the reference's Postgres sink role
    (upsert.rs:209-269: the reference pushes state downstream; here the
    downstream subscribes to commits).  Four source commits — even
    events, odd events (batch-wins), soft-delete of error users,
    hard-delete of ``user_id % 7 == 0`` — with a mid-history ``sync()``
    after commit 2 and a final one after commit 4, so the replica
    exercises bootstrap (snapshot read of v1), incremental deltas, and
    resume.  The replica uses the DIRECT protocol (cross-protocol
    replication: CDC rows are plain row images).  The oracle states the
    source's end state; returning the REPLICA's rows is the point — the
    feed alone reconstructs the table."""
    from quick_stream_spark.operators.replicate import ChangeReplicator

    ev = _events(spark, sf_dir)
    source = _table(spark, commit_protocol="manifest")
    replicator = ChangeReplicator(source, _table(spark))
    with _events_scope(spark, sf_dir):
        source.upsert(ev.filter(F.col("event_id") % 2 == 0))
        source.upsert(ev.filter(F.col("event_id") % 2 == 1))
        replicator.sync()
        source.soft_delete(ev.filter(F.col("event_type") == "error"))
        source.hard_delete(ev.filter(F.col("user_id") % 7 == 0))
        replicator.sync()
    return replicator.replica.read().select(*EVENT_COLS, "row_active")


@register(
    "r_cdc_matview",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id
          ORDER BY (event_id % 2) DESC, ts DESC, event_id ASC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM latest
    WHERE user_id NOT IN (SELECT user_id FROM events
                          WHERE event_type = 'error' AND user_id % 5 = 0)
    GROUP BY event_type
    """,
    tags=("reference", "manifest", "cdc", "matview", "incremental"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_cdc_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-driven incremental view maintenance
    (streaming/matview.py CdcAggView): a per-event_type (count, sum)
    aggregate maintained purely from the source table's change feed —
    the signed-delta IVM recipe, which handles what the append-stream
    matview cannot: UPDATES move (+post − pre) between groups and
    soft deletes subtract, with per-commit work bounded by change
    volume (read_changes prunes to changed buckets).  Three source
    commits (even events, odd events batch-wins, soft-delete of the
    error users in the ``user_id % 5 == 0`` slice — a subset, so the
    final state stays non-empty at every SF and the equality actually
    constrains the deltas) with a mid-history sync; the oracle is the
    direct aggregate of the final active state — equality IS the IVM
    correctness contract."""
    from quick_stream_spark.streaming.matview import CdcAggView

    ev = _events(spark, sf_dir)
    source = _table(spark, commit_protocol="manifest")
    work = tempfile.mkdtemp(prefix="qss-q-")
    view = CdcAggView(source, work + "/view", ["event_type"], "value")
    with _events_scope(spark, sf_dir):
        source.upsert(ev.filter(F.col("event_id") % 2 == 0))
        view.sync()
        source.upsert(ev.filter(F.col("event_id") % 2 == 1))
        source.soft_delete(
            ev.filter((F.col("event_type") == "error") & (F.col("user_id") % 5 == 0))
        )
        view.sync()
    return view.read()


@register(
    "r_cdc_stream_feed",
    oracle=f"""
    WITH s1 AS ({_CDC_S1_SQL}), s2 AS ({_CDC_S2_SQL})
    SELECT event_id, ts, user_id, event_type, value, props, TRUE AS row_active,
           'insert' AS _change_type, 1 AS _commit_version
    FROM s1
    UNION ALL
    SELECT s2.event_id, s2.ts, s2.user_id, s2.event_type, s2.value, s2.props,
           TRUE, 'insert', 2
    FROM s2 WHERE s2.user_id NOT IN (SELECT user_id FROM s1)
    UNION ALL
    SELECT s1.event_id, s1.ts, s1.user_id, s1.event_type, s1.value, s1.props,
           TRUE, 'update_preimage', 2
    FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.event_id <> s2.event_id
    UNION ALL
    SELECT s2.event_id, s2.ts, s2.user_id, s2.event_type, s2.value, s2.props,
           TRUE, 'update_postimage', 2
    FROM s1 JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.event_id <> s2.event_id
    """,
    tags=("reference", "manifest", "cdc", "streaming", "python-datasource"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def r_cdc_stream_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed consumed as a STRUCTURED STREAM
    (sources/pyds.py CdcStreamDataSource — the Delta-CDF-as-stream
    analog through the Spark 4 Python DataSource API): offsets are
    manifest versions, partition planning is one task per (commit,
    changed bucket), and the oldest retained snapshot arrives as
    inserts (the initial-snapshot convention).  The two-commit replay
    of r_cdc_changes is drained through a real streaming query into a
    memory sink; the oracle restates snapshot 1 as inserts plus the
    snapshot diff — stream == batch CDC is the contract."""
    import time as _time

    from quick_stream_spark.sources.pyds import register_cdc

    ev = _events(spark, sf_dir)
    source = _table(spark, commit_protocol="manifest")
    with _events_scope(spark, sf_dir):
        source.upsert(ev.filter(F.col("event_id") % 2 == 0))
        source.upsert(ev.filter(F.col("event_id") % 2 == 1))
        v1, v2 = source.snapshot_versions()[-2:]
        expected = source.read(version=v1).count() + source.read_changes(v1, v2).count()
    register_cdc(spark)
    work = tempfile.mkdtemp(prefix="qss-q-")
    name = f"cdcf_{abs(hash(work)) % 10**8}"
    q = (
        spark.readStream.format("qss_cdc")
        .option("path", source.path)
        .option("keys", "user_id")
        .load()
        .writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", work + "/ckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _time.time() + 180
    while _time.time() < deadline:
        if spark.table(name).count() >= expected:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    return spark.table(name)
