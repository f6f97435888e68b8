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


def test_merge_statement_shape_matches_reference():
    """The generated server-side MERGE must have the reference's
    prepared-statement shape (lib.rs:111): INSERT ... ON CONFLICT (pk)
    DO UPDATE SET col = EXCLUDED.col, executed from a staging table the
    JDBC writer fills per micro-batch."""
    sink = JdbcSink(url="jdbc:postgresql://db:5432/app", table="trax.ftp_current")
    cols = ["pkey", "modified_date", "payload", "row_active"]
    create, merge, cleanup = sink.merge_statements(
        cols, keys=["pkey"], version_col="modified_date", newer_wins=False
    )
    assert create == (
        "CREATE TABLE IF NOT EXISTS trax.ftp_current__qss_staging "
        "(LIKE trax.ftp_current INCLUDING DEFAULTS)"
    )
    assert merge == (
        "INSERT INTO trax.ftp_current (pkey, modified_date, payload, row_active) "
        "SELECT pkey, modified_date, payload, row_active "
        "FROM trax.ftp_current__qss_staging "
        "ON CONFLICT (pkey) DO UPDATE SET modified_date = EXCLUDED.modified_date, "
        "payload = EXCLUDED.payload, row_active = EXCLUDED.row_active"
    )
    assert cleanup == "TRUNCATE TABLE trax.ftp_current__qss_staging"


def test_merge_statement_newer_wins_guard():
    sink = JdbcSink(url="jdbc:postgresql://db:5432/app", table="t")
    _, merge, _ = sink.merge_statements(
        ["pkey", "modified_date", "v"],
        keys=["pkey"],
        version_col="modified_date",
        newer_wins=True,
    )
    assert merge.endswith("WHERE t.modified_date < EXCLUDED.modified_date")


def test_soft_delete_statement_shape():
    sink = JdbcSink(url="jdbc:postgresql://db:5432/app", table="t")
    stmt = sink.soft_delete_statement(keys=["pkey"])
    assert stmt == (
        "UPDATE t SET row_active = FALSE FROM t__qss_staging "
        "WHERE t.pkey = t__qss_staging.pkey"
    )


def test_ssl_root_cert_passthrough():
    """Reference parity (builder.rs:107-110): a pinned root-cert path
    emits sslrootcert and upgrades sslmode to server verification."""
    from quick_stream_spark.sources.jdbc import JdbcSink

    sink = JdbcSink(
        url="jdbc:postgresql://db:5432/app",
        table="trax.ftp_current",
        ssl=True,
        ssl_root_cert="/etc/certs/root.pem",
    )
    opts = sink.options()
    assert opts["ssl"] == "true"
    assert opts["sslrootcert"] == "/etc/certs/root.pem"
    assert opts["sslmode"] == "verify-ca"
    # without a cert the round-2 behavior is unchanged
    plain = JdbcSink(url="jdbc:postgresql://db:5432/app", table="t", ssl=True)
    assert plain.options()["sslmode"] == "require"
    assert "sslrootcert" not in plain.options()
