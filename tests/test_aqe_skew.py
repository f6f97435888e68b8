"""AQE skew-join pin: the engine's answer to skewed join keys at scale
is Adaptive Query Execution splitting oversized shuffle partitions at
runtime (plus salting for the aggregation paths — agg_events_by_type).
This test manufactures a pathologically skewed key, forces a shuffle
join, and pins that the FINAL adaptive plan actually applied the skew
split (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead skewed``) — so
the claim "AQE handles skew" is held by an executed plan, not a config
comment."""

from pyspark.sql import functions as F

# thresholds scaled to test-sized data (Spark's own AQE suite does the
# same): the *machinery* is what's pinned — on a cluster the defaults
# (256 MB threshold, 64 MB advisory) trigger it for real partitions
SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "10",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    "spark.sql.shuffle.partitions": "8",
}


def test_aqe_splits_skewed_join_partition(spark):
    prev = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 90% of rows carry key 0; keys 1..50 share the rest
        fact = spark.range(100_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 50 + 1)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(51).select(
            F.col("id").alias("k"),
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("name"),
        )
        joined = fact.join(dim, "k").groupBy("name").count()
        result = {r["name"]: r["count"] for r in joined.collect()}
        assert result["d0"] == 90_000
        assert sum(result.values()) == 100_000

        # the FINAL adaptive plan (post-execution) must mark the skew
        # split on the join and its shuffle reads
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"no skew split in final plan:\n{plan}"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
