"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (two-batch upsert replay —
the heart of the reference's semantics) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose the declared query corpus from
``quick_stream_spark.plans`` (SURVEY.md §2 inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the events table as two upsert batches through
    the managed keyed table (dedup + MERGE), return the final state.

    Resolved from the FULL registry (not the rotating export window):
    the flagship must keep smoking even in rounds where its registry
    entry is rotated to the pytest tier."""
    from quick_stream_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    return REGISTRY["r_upsert_endstate"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from quick_stream_spark.plans.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from quick_stream_spark.plans.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
