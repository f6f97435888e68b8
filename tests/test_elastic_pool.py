"""O11/O12 delegation evidence (reference upsert.rs:382-513): the
reference's elastic connection pool — scale-up on demand, scale-down
reap — maps to (a) the connection budget wired through to write
parallelism and (b) Spark's runtime parallelism management (AQE
partition coalescing; dynamic allocation on a real cluster).  These
tests pin that the mapping is real, not just documented."""

from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.sources.jdbc import JdbcSink


def test_max_con_count_bounds_write_parallelism():
    """O11 scale-up bound: the pool's max size becomes the number of
    writer partitions = concurrent sink connections (Spark opens one
    JDBC connection per partition)."""
    cfg = QuickStreamConfig(max_con_count=7)
    assert cfg.write_partitions == 7
    opts = JdbcSink(url="jdbc:postgresql://db:5432/app", table="t").options(cfg)
    assert opts["numPartitions"] == "7"


def test_aqe_coalesces_small_shuffles(spark):
    """O12 scale-down analog: the reference reaps idle pool connections
    below a utilization threshold (upsert.rs:455-513); on Spark, AQE
    coalesces under-filled shuffle partitions at runtime, shrinking
    task parallelism to match the data — pinned here by observing the
    post-shuffle partition count collapse far below the configured
    shuffle partitions."""
    from quick_stream_spark.plans._util import pin_session

    pin_session(spark)  # enables AQE + coalescing, as every query does
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        agg = (
            spark.range(10_000)
            .groupBy((F.col("id") % 5).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        agg.collect()  # AQE finalizes the plan at execution
        n_parts = agg.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert n_parts < 64, f"AQE did not coalesce: {n_parts} partitions"
