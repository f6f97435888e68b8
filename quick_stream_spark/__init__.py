"""quick_stream_spark — a PySpark-native engine with the capabilities of
Uratne/quick-stream (high-rate deduplicated upsert / soft-delete ingestion),
re-expressed Spark-first.

Reference (read-only, studied for behavior only): /root/reference
  - dedup semantics: lib.rs:12-22
  - upsert pipeline: upsert.rs:77-207
  - delete pipeline: delete.rs:71-187
  - multi-table routing: upsert/multi_table_upsert/support.rs:8-59

Design stance (SURVEY.md §7): no translation of channels / worker pools /
size-class statements. The reference's whole surface collapses into
Structured Streaming ``foreachBatch`` + a MERGE-semantics keyed table:

  - batching / lag cycles      -> micro-batch trigger interval
  - intra-batch LWW dedup      -> window row_number (operators.dedup)
  - ON CONFLICT DO UPDATE      -> KeyedTable.upsert (operators.merge)
  - soft/hard delete           -> KeyedTable.soft_delete / hard_delete
  - multi-table routing        -> MultiTableRouter (operators.router)
  - elastic worker pool        -> Spark scheduler / dynamic allocation
  - graceful shutdown          -> streaming.shutdown
  - status reporting           -> streaming.listener

Everything is DataFrame-first so Catalyst handles pushdown, pruning and
join planning; Python UDFs are avoided in hot paths.
"""

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.operators.dedup import latest_per_key
from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.operators.router import MultiTableRouter

__version__ = "0.1.0"

__all__ = [
    "QuickStreamConfig",
    "latest_per_key",
    "KeyedTable",
    "MultiTableRouter",
    "__version__",
]
