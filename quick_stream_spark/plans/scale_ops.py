"""Scale-posture operators: catalog-bucketed co-located joins (the
shuffle-elimination pattern big MERGEs and fact-fact joins need at
100 TB) and custom stateful streaming (applyInPandasWithState).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import dsum, pin_session, sql_dsum
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table, stream_parquet_dir, write_batches_as_files

N_BUCKETS = 8


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Save orders and lineitem as catalog tables bucketed by the join
    key.  Bucketing is declared in the catalog, so Catalyst knows both
    sides share a hash-partitioning and plans the join with NO Exchange
    — at 100 TB this turns the biggest fact-fact shuffle into a local
    zip of co-located buckets.  (Path-based parquet cannot carry bucket
    metadata; a real deployment uses the metastore/Delta the same way.)
    """
    pin_session(spark)
    suffix = abs(hash(sf_dir)) % 10**8
    o_name, l_name = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    if not spark.catalog.tableExists(o_name):
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    if not spark.catalog.tableExists(l_name):
        (
            load_table(spark, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(l_name)
        )
    return o_name, l_name


@register(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice", "sum_price")}
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "bucketed", "scale"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join on pre-bucketed catalog tables: both sides are
    bucketed by the join key so the join plans with no shuffle
    (verified by tests/test_plans_explain.py).  Same result contract as
    a plain join — bucketing is purely physical."""
    o_name, l_name = _ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(o_name)
    li = spark.table(l_name)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


@register(
    "stream_stateful_user_counter",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(max(event_id) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_user_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running counter carried in GroupState across micro-batches
    (the reference's per-key accumulated state generalized to arbitrary
    user logic).  The final emitted state after the availableNow drain
    equals the batch aggregate, which is the oracle.

    Scale notes: state is partitioned by key (one shuffle), stored in
    the state store (RocksDB at scale), and the Pandas UDF receives
    Arrow batches per key group — the supported seam for custom logic
    Spark's built-ins can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-state-")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    write_batches_as_files(batches, work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("last_event_id", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("last_id", LongType())]
    )

    def update(key, pdfs, state: GroupState):
        n, last_id = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last_id = max(last_id, int(pdf["event_id"].max()))
        state.update((n, last_id))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "last_event_id": [last_id]}
        )

    counted = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"state_counter_{abs(hash(work)) % 10**8}"
    q = (
        counted.writeStream.queryName(name)
        .format("memory")
        .outputMode("update")
        .option("checkpointLocation", work + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, batch); final state = last emit
    snap = spark.table(name)
    latest = snap.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_event_id").alias("last_event_id"),
    )
    return latest


@register(
    "stream_drop_duplicates_watermark",
    oracle=None,  # "first seen" is arrival-order dependent across partitions
    tags=("streaming", "dedup"),
)
def stream_drop_duplicates_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on the event key: keeps the first
    arrival per event_id within the watermark horizon — the built-in
    streaming dedup (state auto-expires with the watermark, unlike plain
    dropDuplicates whose state grows forever).  Rows-only check: 'first
    seen' depends on partition race, though with unique event_ids the
    kept ROW COUNT is deterministic."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-ddw-")
    # duplicate every event so the dedup has work to do
    doubled = ev.unionByName(ev)
    write_batches_as_files([doubled], work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    name = f"ddw_{abs(hash(work)) % 10**8}"
    q = (
        deduped.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", work + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("event_id", "user_id", "event_type")
