from quick_stream_spark.sources.readers import (
    TABLES,
    load_table,
    register_views,
    stream_parquet_dir,
    table_path,
    write_batches_as_files,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "stream_parquet_dir",
    "table_path",
    "write_batches_as_files",
]
