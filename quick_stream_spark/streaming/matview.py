"""Incremental materialized-view maintenance: a streaming aggregate
table kept current by additive MERGE per micro-batch — the
"materialized view over a stream" pattern (Delta Live Tables /
incremental view maintenance), built on the same KeyedTable machinery
as the ingestion paths.

Per batch: partial-aggregate the batch (map-side combinable), read the
CURRENT values of only the touched groups (KeyedTable prunes to
touched buckets via dynamic partition pruning), add, and upsert the
summed rows.  Work per batch is O(batch + touched groups) — never a
view rebuild — and because SUM/COUNT are additive over exact decimal
sums, the end state is independent of how deliveries were chunked,
which is what makes the drained view equal the one-shot batch
aggregate (the oracle contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.operators.merge import KeyedTable


class IncrementalAggView:
    """SUM/COUNT aggregates per group key, maintained incrementally.

    ``group_cols`` are the view key; ``value_col`` feeds an exact
    decimal SUM (surfaced as ``sum_value``) next to the row COUNT
    (``n``).  Extending to any commutative-monoid aggregate (min, max,
    bitmap OR, sketch merge) is adding a column pair here."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_cols: Sequence[str],
        value_col: str,
        num_buckets: int = 8,
    ) -> None:
        self.spark = spark
        self.group_cols = list(group_cols)
        self.value_col = value_col
        # version = batch id: the additive merge writes each touched
        # group exactly once per batch, so batch-wins LWW is correct
        self.table = KeyedTable(
            spark,
            path,
            keys=self.group_cols,
            version_col="_batch_id",
            num_buckets=num_buckets,
        )

    def _partial(self, batch: DataFrame) -> DataFrame:
        return batch.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(self.value_col).cast("decimal(18,2)")).alias("_sum_dec"),
        )

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        part = self._partial(batch)
        if self.table.exists():
            cur = self.table.read().select(
                *self.group_cols,
                F.col("n").alias("_n_cur"),
                F.col("_sum_dec").alias("_sum_cur"),
            )
            # left join: only groups touched by THIS batch are read,
            # merged and rewritten; untouched groups keep their rows
            part = (
                part.join(cur, self.group_cols, "left")
                .select(
                    *self.group_cols,
                    (F.col("n") + F.coalesce(F.col("_n_cur"), F.lit(0))).alias("n"),
                    (
                        F.col("_sum_dec")
                        + F.coalesce(
                            F.col("_sum_cur"), F.lit(0).cast("decimal(18,2)")
                        )
                    ).cast("decimal(18,2)").alias("_sum_dec"),
                )
            )
        self.table.upsert(part.withColumn("_batch_id", F.lit(int(batch_id))))

    def foreach_batch(self):
        def apply(batch: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch, batch_id)

        return apply

    def read(self) -> DataFrame:
        """The current view: group keys, row count, exact decimal sum
        surfaced as double."""
        return self.table.read().select(
            *self.group_cols,
            "n",
            F.col("_sum_dec").cast("double").alias("sum_value"),
        )
