"""Config-plumbing tests for the JDBC sink seam (no DB available)."""

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.sources.jdbc import JdbcSink


def test_options_mirror_reference_tunables():
    sink = JdbcSink(
        url="jdbc:postgresql://db:5432/app", table="trax.ftp_current", user="u", password="p", ssl=True
    )
    opts = sink.options(QuickStreamConfig(max_con_count=7))
    assert opts["numPartitions"] == "7"  # max_con_count -> connections
    assert opts["batchsize"] == "100"  # the 100-row statement class
    assert opts["sslmode"] == "require"
    assert opts["dbtable"] == "trax.ftp_current"


def test_writer_builds_without_database(spark):
    sink = JdbcSink(url="jdbc:postgresql://db:5432/app", table="t")
    df = spark.range(3).withColumnRenamed("id", "pkey")
    writer = sink.writer(df, QuickStreamConfig(max_con_count=2))
    assert writer is not None  # .save() would need a live DB + driver
