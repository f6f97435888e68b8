"""Graceful shutdown (reference O17, shutdown_service.rs:1-52).

The reference installs a signal-hook loop (SIGINT/SIGTERM/SIGQUIT) that
cancels a shared token every ``run`` loop selects on.  The Spark-native
equivalent is ``StreamingQuery.stop()`` plus
``spark.sql.streaming.stopGracefullyOnShutdown=true``; this helper wires
OS signals to ``stop()`` for parity.
"""

from __future__ import annotations

import signal
from collections.abc import Sequence

from pyspark.sql.streaming import StreamingQuery

_DEFAULT_SIGNALS = (signal.SIGINT, signal.SIGTERM)


def stop_on_signals(
    queries: Sequence[StreamingQuery],
    signals: Sequence[int] = _DEFAULT_SIGNALS,
) -> None:
    """Install handlers that stop every query on the given signals, then
    chain to the previous handler (so pytest/driver handlers still run)."""
    previous = {}

    def handler(signum, frame):
        for q in queries:
            try:
                if q.isActive:
                    q.stop()
            except Exception:
                pass
        prev = previous.get(signum)
        if callable(prev):
            prev(signum, frame)

    for s in signals:
        previous[s] = signal.getsignal(s)
        signal.signal(s, handler)
