"""Observability parity (reference O18: print_sender_status logs per
cycle, upsert.rs:515-549): the StatusListener must receive progress for
our streaming queries."""

import logging
import time
from datetime import datetime

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.sources.readers import stream_parquet_dir, write_batches_as_files
from quick_stream_spark.streaming.listener import StatusListener
from quick_stream_spark.streaming.stream import UpsertQuickStream


def test_listener_logs_progress(spark, tmp_path, caplog):
    listener = StatusListener(verbose=True)
    spark.streams.addListener(listener)
    try:
        batches = [
            spark.createDataFrame(
                [(1, datetime(2024, 1, 1), 1, "a")],
                "pkey long, modified_date timestamp, arrival long, payload string",
            )
        ]
        src = str(tmp_path / "src")
        write_batches_as_files(batches, src)
        target = KeyedTable(
            spark,
            str(tmp_path / "t"),
            keys=("pkey",),
            version_col="modified_date",
            arrival_col="arrival",
            num_buckets=2,
        )
        cfg = QuickStreamConfig(name="listener-test", checkpoint_dir=str(tmp_path / "ck"))
        with caplog.at_level(logging.INFO, logger="quick_stream_spark"):
            UpsertQuickStream(target, config=cfg).run(
                stream_parquet_dir(spark, src, batches[0].schema), available_now=True
            )
            # listener events are delivered asynchronously
            deadline = time.time() + 30
            while time.time() < deadline and not any(
                "rows=" in r.getMessage() for r in caplog.records
            ):
                time.sleep(0.5)
        messages = [r.getMessage() for r in caplog.records]
        assert any("query started" in m for m in messages)
        assert any("listener-test" in m and "rows=" in m for m in messages)
    finally:
        spark.streams.removeListener(listener)
