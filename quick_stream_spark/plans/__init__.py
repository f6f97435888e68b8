"""Declared query corpus (SURVEY.md §2 contract).

Every implemented operator is declared here as a :class:`QuerySpec`:
a Spark DataFrame program plus (where SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables.  The driver
compares row counts, schemas and order-insensitive value hashes, so
column names and value determinism matter as much as semantics —
see ``plans/_util.py`` for the cross-engine determinism rules.
"""

from quick_stream_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
