"""Dead-letter quarantine (streaming/quarantine.py): invalid rows are
routed to the DLQ with their failure reasons while valid rows merge —
the stream survives data that would otherwise poison the MERGE."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.sources.readers import stream_parquet_dir
from quick_stream_spark.streaming.quarantine import BadRecordQuarantine, not_null
from quick_stream_spark.streaming.stream import UpsertQuickStream

SCHEMA = "pkey long, modified_date timestamp, arrival long, value double"


def test_invalid_rows_quarantined_valid_rows_merge(spark, tmp_table_dir):
    rows = [
        (1, datetime(2024, 1, 1), 1, 10.0),
        (None, datetime(2024, 1, 1), 2, 11.0),  # NULL key
        (2, None, 3, 12.0),                      # NULL version
        (3, datetime(2024, 1, 1), 4, -5.0),      # negative value
        (4, datetime(2024, 1, 2), 5, 13.0),
    ]
    src_dir = os.path.join(tmp_table_dir, "in")
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.parquet(src_dir)

    target = KeyedTable(
        spark,
        os.path.join(tmp_table_dir, "t"),
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=4,
    )
    dlq = BadRecordQuarantine(
        os.path.join(tmp_table_dir, "dlq"),
        rules=not_null("pkey", "modified_date")
        + [("value_non_negative", F.col("value") >= 0)],
    )
    stream = stream_parquet_dir(
        spark, src_dir, spark.createDataFrame([], SCHEMA).schema
    )
    cfg = QuickStreamConfig(
        name="dlq-test", checkpoint_dir=os.path.join(tmp_table_dir, "ckpt")
    )
    UpsertQuickStream(target, config=cfg, newer_wins=True, quarantine=dlq).run(
        stream, available_now=True
    )

    merged = {r.pkey for r in target.read().collect()}
    assert merged == {1, 4}
    bad = dlq.read_distinct(spark).collect()
    reasons = {r.arrival: sorted(r._dlq_reasons) for r in bad}
    assert reasons == {
        2: ["pkey_not_null"],
        3: ["modified_date_not_null"],
        4: ["value_non_negative"],
    }
    assert all(r._dlq_batch_id == 0 for r in bad)


def test_multi_failure_row_lists_every_reason(spark, tmp_table_dir):
    dlq = BadRecordQuarantine(
        os.path.join(tmp_table_dir, "dlq2"),
        rules=not_null("pkey") + [("value_non_negative", F.col("value") >= 0)],
    )
    batch = spark.createDataFrame([(None, datetime(2024, 1, 1), 1, -1.0)], SCHEMA)
    good, bad = dlq.split(batch)
    assert good.count() == 0
    assert sorted(bad.collect()[0]._dlq_reasons) == [
        "pkey_not_null",
        "value_non_negative",
    ]


def test_requires_rules(spark, tmp_table_dir):
    with pytest.raises(ValueError, match="rule"):
        BadRecordQuarantine(os.path.join(tmp_table_dir, "x"), rules=[])


def test_router_quarantines_unroutable_destinations(spark, tmp_table_dir):
    """Rows with an unknown or NULL destination are dead-lettered with
    the routing reason instead of being silently dropped by the
    fan-out; known destinations merge normally."""
    from quick_stream_spark.operators.router import MultiTableRouter
    from quick_stream_spark.streaming.quarantine import in_set
    from quick_stream_spark.streaming.stream import MultiTableUpsertQuickStream

    schema = "dest string, pkey long, modified_date timestamp, arrival long"
    rows = [
        ("alpha", 1, datetime(2024, 1, 1), 1),
        ("beta", 2, datetime(2024, 1, 1), 2),
        ("gamma", 3, datetime(2024, 1, 1), 3),   # unknown table
        (None, 4, datetime(2024, 1, 1), 4),      # NULL destination
    ]
    src_dir = os.path.join(tmp_table_dir, "rin")
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(src_dir)

    router = MultiTableRouter(
        spark,
        os.path.join(tmp_table_dir, "routed"),
        table_col="dest",
        tables=["alpha", "beta"],
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        num_buckets=2,
    )
    dlq = BadRecordQuarantine(
        os.path.join(tmp_table_dir, "rdlq"), rules=in_set("dest", ["alpha", "beta"])
    )
    stream = stream_parquet_dir(
        spark, src_dir, spark.createDataFrame([], schema).schema
    )
    cfg = QuickStreamConfig(
        name="rdlq-test", checkpoint_dir=os.path.join(tmp_table_dir, "rckpt")
    )
    MultiTableUpsertQuickStream(router, config=cfg, quarantine=dlq).run(
        stream, available_now=True
    )
    routed = {r.dest: r.pkey for r in router.read_union().collect()}
    assert routed == {"alpha": 1, "beta": 2}
    bad = dlq.read_distinct(spark).collect()
    assert {r.pkey for r in bad} == {3, 4}
    assert all(r._dlq_reasons == ["dest_routable"] for r in bad)


def test_healthy_batch_appends_nothing_to_the_dlq(spark, tmp_table_dir):
    """Zero-bad-row batches must not append (empty) files: a healthy
    stream would otherwise grow the DLQ by one file per micro-batch."""
    path = os.path.join(tmp_table_dir, "dlq_empty")
    dlq = BadRecordQuarantine(path, rules=not_null("pkey"))
    batch = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, 1.0)], SCHEMA
    ).persist()
    good, bad = dlq.split(batch)
    dlq.write(bad, 0)
    assert not os.path.exists(path)
    assert good.count() == 1
    batch.unpersist()
