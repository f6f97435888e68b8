"""WriterFence: two writers sharing one state directory must FAIL
LOUDLY instead of corrupting (r7 verdict ask #4).  A second index
instance over the same ``work_dir`` takes the directory over (fencing
token, epoch bump); the superseded writer's next batch or compaction
raises ``RuntimeError`` instead of racing the newcomer's append/prune
jobs.  Checkpoint-resume (a FRESH instance continuing a drained
predecessor) must keep working — takeover is the resume mechanism."""

import tempfile

import pytest
from pyspark.sql import functions as F

from quick_stream_spark.sources.readers import (
    load_table,
    stream_parquet_dir,
    write_split_as_files,
)
from quick_stream_spark.streaming.distinct_index import StreamingDistinctCounter
from quick_stream_spark.streaming.stream import WriterFence
from tests.conftest import SF_SMOKE


def _counter(spark, work, name):
    c = StreamingDistinctCounter(
        spark, work + "/state", key_col="event_id", p=10
    )
    c.config.checkpoint_dir = work + f"/ckpt-{name}"
    return c


def test_second_writer_fences_out_the_first(spark):
    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    work = tempfile.mkdtemp(prefix="qss-fence-")
    write_split_as_files(ev, F.col("event_id") % 2, 2, work + "/in")

    first = _counter(spark, work, "a")
    second = _counter(spark, work, "b")  # takes the directory over
    assert second._fence.epoch == first._fence.epoch + 1

    # the superseded writer dies loudly at its first batch...
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    with pytest.raises(Exception, match="fenced out"):
        first.run(stream, available_now=True)
    # ...and at a manual maintenance pass
    first._log_exists = True
    with pytest.raises(RuntimeError, match="fenced out"):
        first.compact()

    # the current holder works normally
    stream2 = stream_parquet_dir(spark, work + "/in", ev.schema)
    second.run(stream2, available_now=True)
    assert second.estimate().count() == 1


def test_checkpoint_resume_still_works_via_takeover(spark):
    """The resume pattern (fresh instance, same work_dir, same
    checkpoint) is takeover by design: the predecessor drained and
    never writes again, so nothing is fenced."""
    ev = load_table(spark, SF_SMOKE, "events").limit(200)
    work = tempfile.mkdtemp(prefix="qss-fence-resume-")
    write_split_as_files(ev, F.col("event_id") % 2, 2, work + "/in")

    first = _counter(spark, work, "a")
    first.run(
        stream_parquet_dir(spark, work + "/in", ev.schema),
        available_now=True,
    )
    est_before = first.estimate().collect()[0]

    resumed = _counter(spark, work, "a")  # same checkpoint: true resume
    resumed.run(
        stream_parquet_dir(spark, work + "/in", ev.schema),
        available_now=True,
    )
    est_after = resumed.estimate().collect()[0]
    assert est_after == est_before  # replay is a no-op, state intact


def test_fence_epoch_survives_marker_and_is_claimable_when_absent(spark):
    work = tempfile.mkdtemp(prefix="qss-fence-unit-")
    f1 = WriterFence(spark, work)
    f1.takeover()
    f1.check()  # own claim passes
    f2 = WriterFence(spark, work)
    f2.takeover()
    assert f2.epoch == f1.epoch + 1
    f2.check()
    with pytest.raises(RuntimeError, match="fenced out"):
        f1.check()
