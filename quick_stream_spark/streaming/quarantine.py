"""Dead-letter quarantine for the ingestion path: rows that fail
declared validation rules are routed to an append-only quarantine table
instead of poisoning the MERGE or killing the stream — the
bad-records-path pattern every production ingest runs (a NULL key, for
example, would otherwise hash into a bucket and silently collide).

Rules are declarative (name, Column predicate) pairs evaluated
JVM-side in one pass; a failing row carries the names of every rule it
failed plus the batch id.  The quarantine is parquet-append and
therefore AT-LEAST-ONCE under foreachBatch retries (the standard DLQ
contract — the main table stays exactly-once via the idempotent
merge); ``read_distinct`` collapses replayed duplicates on read.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def not_null(*cols: str) -> list[tuple[str, Column]]:
    """Rule builder: one not-null rule per key column."""
    return [(f"{c}_not_null", F.col(c).isNotNull()) for c in cols]


class BadRecordQuarantine:
    """Splits each micro-batch into (valid, quarantined) by the rule
    list and appends the quarantined rows (with failure reasons) to
    ``path``."""

    def __init__(self, path: str, rules: list[tuple[str, Column]]) -> None:
        if not rules:
            raise ValueError("BadRecordQuarantine needs at least one rule")
        self.path = path
        self.rules = list(rules)

    def _reasons(self) -> Column:
        # a row PASSES a rule only when its predicate is definitively
        # TRUE: a NULL predicate (e.g. NULL.isin(...) or NULL >= 0) is
        # a failure, not a pass — three-valued logic must not let bad
        # rows slip through as "unknown"
        return F.filter(
            F.array(
                *[
                    F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                    for name, pred in self.rules
                ]
            ),
            lambda x: x.isNotNull(),
        )

    def split(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        tagged = batch.withColumn("_dlq_reasons", self._reasons())
        good = tagged.filter(F.size("_dlq_reasons") == 0).drop("_dlq_reasons")
        bad = tagged.filter(F.size("_dlq_reasons") > 0)
        return good, bad

    def write(self, bad: DataFrame, batch_id: int) -> None:
        if bad.isEmpty():
            # a healthy stream would otherwise append one empty parquet
            # file per micro-batch — file-count growth plus a write job
            # for nothing
            return
        (
            bad.withColumn("_dlq_batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(self.path)
        )

    def exists(self, spark: SparkSession) -> bool:
        return os.path.isdir(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def read_distinct(self, spark: SparkSession) -> DataFrame:
        """Quarantined rows with retry duplicates collapsed (identical
        row + batch id = a replayed epoch)."""
        return self.read(spark).distinct()


def in_set(col: str, allowed: list[str]) -> list[tuple[str, "Column"]]:
    """Rule builder: the column must hold one of the allowed values —
    the routing guard for multi-table ingestion (an unknown or NULL
    destination would otherwise be silently dropped by the fan-out)."""
    return [(f"{col}_routable", F.col(col).isin(list(allowed)))]
