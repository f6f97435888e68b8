from quick_stream_spark.operators.dedup import latest_per_key
from quick_stream_spark.operators.merge import KeyedTable
from quick_stream_spark.operators.router import MultiTableRouter

__all__ = ["latest_per_key", "KeyedTable", "MultiTableRouter"]
