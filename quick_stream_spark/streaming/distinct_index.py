"""Streaming distinct-count state via HyperLogLog registers — the
scale-independent sibling of the matview's linear-counting bitmap
(matview.py ``distinct_col``): the bitmap's state is m bits but its
estimate saturates once cardinality approaches m, whereas HLL registers
keep a bounded relative error (~1.04/sqrt(m)) at ANY cardinality, so
the same 2^p rows per group serve 10^3 and 10^10 distinct keys alike.

Design: an append-only *register log*.  Each micro-batch reduces to its
own (group..., bucket, max-rank) register table — at most groups x m
rows regardless of batch volume — and APPENDS it (one bounded parquet
append per batch, no read-modify-write).  Readers max-merge on scan;
:meth:`compact` (a between-batches maintenance pass) rewrites the log
down to one merged register table so storage stays bounded across many
batches.

Replay safety falls out of the algebra instead of needing a dedup
defense (contrast the near-dup index's reservoir, which must dedup
``(band, id)`` against at-least-once foreachBatch replay): max-merge is
idempotent, commutative and associative, so a replayed batch appends
rows that change nothing — the reason real pipelines store sketches,
not counters, for streaming distinct metrics.

Reference scope note: the reference engine (quick-stream) has no
sketch/streaming-analytics layer; this extends the streaming tier per
SURVEY §2.3.  Arithmetic is shared with the batch query
(functions/hll.py, plans/sketches.py ``sketch_hll_registers``), so the
drained stream state is pinned equal to the one-shot batch sketch.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.functions import hll
from quick_stream_spark.streaming.stream import _StreamBase


class StreamingDistinctCounter(_StreamBase):
    """foreachBatch pipeline maintaining per-group HLL registers in an
    append-only log.

    ``p`` is the precision (m = 2^p registers per group, relative error
    ~1.04/sqrt(m)); ``tag`` salts the hash so independent counters over
    the same key column are uncorrelated."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key_col: str,
        group_cols: tuple[str, ...] = (),
        p: int = 12,
        tag: str = "stream",
        config: QuickStreamConfig | None = None,
        auto_compact_every: int | None = None,
    ) -> None:
        super().__init__(config)
        self.spark = spark
        self.log_path = os.path.join(work_dir, "register_log")
        self.key_col = key_col
        self.group_cols = tuple(group_cols)
        self.p = p
        self.tag = tag
        # maintenance cadence (same contract as UpsertQuickStream's
        # auto_compact_every): run compact() inside foreachBatch after
        # every N committed batches, so "bounded state" is ENFORCED by
        # the stream itself, not a docstring asking callers to remember
        # a manual pass.  foreachBatch callbacks are serial per query,
        # so the between-batches requirement of compact() holds.
        if auto_compact_every is not None and auto_compact_every < 1:
            raise ValueError("auto_compact_every must be >= 1")
        self.auto_compact_every = auto_compact_every
        self._batches_since_compact = 0
        # checkpoint-resumed instances must see their predecessor's log
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, path, _ = _hadoop_fs(spark, self.log_path)
        self._log_exists = bool(fs.exists(path))
        # one-writer fencing (streaming/stream.py WriterFence): the
        # directory is claimed LAZILY at the first mutation
        # (fence.ensure), so a second writer over the same work_dir
        # takes over at ITS first write and this one fails loudly at
        # its next batch instead of corrupting — while a read-only
        # instance (query-only monitoring) never fences out the live
        # writer (ADVICE r8)
        from quick_stream_spark.streaming.stream import WriterFence

        self._fence = WriterFence(spark, work_dir)

    # ------------------------------------------------------------ state

    def _log_schema(self) -> str:
        groups = ", ".join(f"{g} string" for g in self.group_cols)
        return (f"{groups}, " if groups else "") + "bucket long, r int"

    def registers(self) -> DataFrame:
        """The merged (group..., bucket, r) register table."""
        if not self._log_exists:
            return self.spark.createDataFrame([], self._log_schema())
        raw = self.spark.read.parquet(self.log_path)
        return hll.merge_registers(raw, self.group_cols)

    def estimate(self) -> DataFrame:
        """(group..., filled, raw_est, est_distinct) at this moment."""
        return hll.estimate(self.registers(), self.p, self.group_cols)

    def compact(self) -> None:
        """Rewrite the log to its merged form (bounded at groups x m
        rows).  Maintenance pass — runs automatically on the
        ``auto_compact_every`` cadence, or call it manually between
        micro-batches / with the stream stopped.  Skipping it is always
        SAFE for correctness: readers max-merge the raw log; the rewrite
        only bounds storage.  Crash-safe via append-then-prune
        (:func:`~quick_stream_spark.streaming.stream.replace_log_contents`):
        a crash mid-compact leaves redundant register rows that
        max-merge collapses, never a lost register."""
        if not self._log_exists:
            return
        from quick_stream_spark.streaming.stream import replace_log_contents

        self._fence.ensure("compact")
        replace_log_contents(self.spark, self.log_path, self.registers())

    # ------------------------------------------------------------ batch

    def _batch_registers(self, batch: DataFrame) -> DataFrame:
        key: Column = F.col(self.key_col)
        return hll.register_table(batch, self.tag, key, self.p, self.group_cols)

    def _foreach_batch(self):
        def apply(batch: DataFrame, batch_id: int) -> None:
            self._fence.ensure("append a micro-batch to")
            regs = self._batch_registers(batch)
            regs.write.mode("append").parquet(self.log_path)
            self._log_exists = True
            if self.auto_compact_every is not None:
                self._batches_since_compact += 1
                if self._batches_since_compact >= self.auto_compact_every:
                    self._batches_since_compact = 0
                    self.compact()

        return apply
