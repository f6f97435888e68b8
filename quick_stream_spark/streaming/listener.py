"""Observability (reference O18).

The reference logs per-size-class sender counts and total connection
percentage every cycle (``print_sender_status``, upsert.rs:515-549),
gated by ``print_connection_configuration`` (builder.rs:152-159).  The
Spark-native equivalent is a ``StreamingQueryListener`` over micro-batch
progress events.
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("quick_stream_spark")


class StatusListener(StreamingQueryListener):
    """Logs rows/sec and batch duration per progress event; with
    ``verbose`` (the ``print_connection_configuration`` analog) logs every
    event instead of only changes."""

    def __init__(self, verbose: bool = False) -> None:
        self.verbose = verbose
        self._last = {}

    def onQueryStarted(self, event) -> None:
        log.info("query started: %s (%s)", event.name, event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        key = (p.name or str(p.id), p.numInputRows, round(p.processedRowsPerSecond or 0.0))
        if self.verbose or self._last.get(p.id) != key:
            log.info(
                "query %s batch=%d rows=%d rows/s=%.1f",
                p.name or p.id,
                p.batchId,
                p.numInputRows,
                p.processedRowsPerSecond or 0.0,
            )
        self._last[p.id] = key

    def onQueryTerminated(self, event) -> None:
        log.info("query terminated: %s", event.id)

    def onQueryIdle(self, event) -> None:
        pass
