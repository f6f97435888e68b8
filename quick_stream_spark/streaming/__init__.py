from quick_stream_spark.streaming.stream import (
    DeleteQuickStream,
    MultiTableDeleteQuickStream,
    MultiTableUpsertQuickStream,
    UpsertQuickStream,
)

__all__ = [
    "UpsertQuickStream",
    "DeleteQuickStream",
    "MultiTableUpsertQuickStream",
    "MultiTableDeleteQuickStream",
]
