"""JDBC sink (reference O16 — the PostgreSQL connection path,
upsert.rs:209-269).

The primary, offline-testable sink is the parquet-backed
:class:`~quick_stream_spark.operators.merge.KeyedTable`; this module is
the real-Postgres parity path.  No database or JDBC driver jar ships in
this environment, so these helpers build the writer configuration and
fail with a clear error at `.save()` time if no driver is present —
the seam is tested for config plumbing, not for live writes.

Mapping of reference tunables:
  max_con_count  -> numPartitions (per-partition connections; Spark's
                    JDBC writer opens one connection per partition, the
                    exact analog of the reference's connection pool)
  hundred-row prepared statements -> batchsize (multi-row inserts)
  TLS config (builder.rs:107-110)  -> ssl/sslmode options

MERGE-on-JDBC: plain `df.write.jdbc` only appends/overwrites; upsert
needs `INSERT ... ON CONFLICT DO UPDATE`, which Spark's JDBC writer
cannot emit.  The supported pattern (documented for a real deployment)
is foreachBatch -> write to a staging table -> server-side
`INSERT ... SELECT ... ON CONFLICT` statement via the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from quick_stream_spark.config import QuickStreamConfig


@dataclass
class JdbcSink:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    table: str
    user: str | None = None
    password: str | None = None
    driver: str = "org.postgresql.Driver"
    ssl: bool = False

    def options(self, config: QuickStreamConfig | None = None) -> dict[str, str]:
        cfg = (config or QuickStreamConfig()).validate()
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "driver": self.driver,
            "numPartitions": str(cfg.write_partitions),
            "batchsize": "100",  # the reference's largest statement class
            "isolationLevel": "READ_COMMITTED",
        }
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.ssl:
            opts["ssl"] = "true"
            opts["sslmode"] = "require"
        return opts

    def writer(self, df: DataFrame, config: QuickStreamConfig | None = None):
        """A configured DataFrameWriter (append mode).  Call ``.save()``
        against a reachable database; repartitions to the connection
        budget first, like the reference's pool bound."""
        cfg = (config or QuickStreamConfig()).validate()
        return (
            df.repartition(cfg.write_partitions)
            .write.format("jdbc")
            .mode("append")
            .options(**self.options(cfg))
        )
