"""Extension operators beyond the reference surface: as-of join,
alternate dedup strategy, CSV/JSON source connectors, percentiles,
array algebra.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import pin_session
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register(
    "join_asof_last_event_before_order",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events GROUP BY user_id, ts
    )
    SELECT o_orderkey, ev.event_id AS asof_event_id, ev.ts AS asof_ts
    FROM orders ASOF LEFT JOIN ev
      ON orders.o_custkey = ev.user_id AND ev.ts <= orders.o_orderdate
    """,
    tags=("join", "asof"),
)
def join_asof_last_event_before_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the latest event of that user at or
    before the order date.  Implemented with the distributed union+window
    pattern (tag both sides, sort by time within the key, carry the last
    event forward) — one shuffle on the key, no range-join blow-up, the
    standard 100 TB-safe as-of strategy.  Events are pre-deduped per
    (user, ts) so ties are well-defined on both engines."""
    pin_session(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    orders = load_table(spark, sf_dir, "orders")
    e_side = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "event_id",
    )
    o_side = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        F.lit(None).cast("long").alias("event_id"),
    )
    u = e_side.unionByName(o_side)
    w = (
        Window.partitionBy("uid")
        .orderBy(F.col("t").asc(), F.col("is_order").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = u.select(
        "is_order",
        "o_orderkey",
        F.last("event_id", ignorenulls=True).over(w).alias("asof_event_id"),
        F.last(F.when(F.col("is_order") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
    )
    return enriched.filter(F.col("is_order") == 1).select(
        "o_orderkey", "asof_event_id", "asof_ts"
    )


_CONNECTOR_ORACLE = """
    SELECT event_type, COUNT(*) AS n, max(ts) AS max_ts,
           CAST(min(event_id) AS BIGINT) AS min_event_id
    FROM events GROUP BY event_type
"""

_CONNECTOR_ORACLE_BOTH = f"""
    SELECT 'csv' AS fmt, * FROM ({_CONNECTOR_ORACLE})
    UNION ALL
    SELECT 'json' AS fmt, * FROM ({_CONNECTOR_ORACLE})
    UNION ALL
    SELECT 'orc' AS fmt, * FROM ({_CONNECTOR_ORACLE})
"""


def _connector_agg(df: DataFrame, fmt: str) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("ts").alias("max_ts"),
        F.min("event_id").alias("min_event_id"),
    ).select(F.lit(fmt).alias("fmt"), "event_type", "n", "max_ts", "min_event_id")


@register(
    "source_roundtrips", oracle=_CONNECTOR_ORACLE_BOTH, tags=("source", "csv", "json", "orc"),
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
)
def source_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV, JSON-lines and ORC connectors in one tagged result: write
    the events table in each format (explicit µs timestamp format for
    the text ones), read it back with an explicit schema, aggregate.
    Matching the parquet-based oracle proves every round-trip is
    lossless."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-rt-")
    ev.write.mode("overwrite").option("timestampFormat", TS_FMT).json(work + "/json")
    json_back = (
        spark.read.schema(ev.schema).option("timestampFormat", TS_FMT).json(work + "/json")
    )
    (
        ev.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(work + "/csv")
    )
    csv_back = (
        spark.read.schema(ev.schema)
        .option("header", "true")
        .option("timestampFormat", TS_FMT)
        .csv(work + "/csv")
    )
    ev.write.mode("overwrite").orc(work + "/orc")
    orc_back = spark.read.schema(ev.schema).orc(work + "/orc")
    return (
        _connector_agg(csv_back, "csv")
        .unionByName(_connector_agg(json_back, "json"))
        .unionByName(_connector_agg(orc_back, "orc"))
    )


@register(
    "pandas_zscore_per_user",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    WITH stats AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)
                 * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS ss
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT user_id, n,
             CAST(s AS DOUBLE) / (100.0 * n) AS mean,
             (CAST(ss AS DOUBLE) / 10000.0
              - n * (CAST(s AS DOUBLE) / (100.0 * n)) * (CAST(s AS DOUBLE) / (100.0 * n)))
               / (n - 1) AS var
      FROM stats WHERE n > 1
    )
    SELECT e.event_id, e.user_id,
           round((e.value - m.mean) / sqrt(m.var), 6) AS zscore
    FROM events e JOIN m ON e.user_id = m.user_id
    WHERE m.var > 0
    """,
    tags=("pandas", "grouped-map"),
)
def pandas_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-user z-score of event
    values.  The Arrow-batched grouped-map path is the supported seam
    for per-group logic Spark built-ins can't express; here the math is
    deliberately built from exact scaled-integer sums so the Python
    result is bit-identical to the SQL oracle (naive float means would
    differ in final ulps between engines/summation orders)."""
    import pandas as pd

    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        n = len(pdf)
        if n <= 1:
            return pd.DataFrame(columns=["event_id", "user_id", "zscore"])
        scaled = [int(math.floor(v * 100 + 0.5)) for v in pdf["value"]]
        s = sum(scaled)
        ss = sum(x * x for x in scaled)
        mean = float(s) / (100.0 * n)
        var = (float(ss) / 10000.0 - n * mean * mean) / (n - 1)
        if not var > 0:
            return pd.DataFrame(columns=["event_id", "user_id", "zscore"])
        z = [round((v - mean) / math.sqrt(var), 6) for v in pdf["value"]]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, zscore double"
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (both engines use the same
    definition).  The approximate sketch twin at scale is
    ``approx_percentile`` — engine-specific, hence not oracle-checked."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("p75"),
    )




@register(
    "source_partitioned_pruning",
    oracle="""
    SELECT doc_id, n_chars, lang FROM documents WHERE lang IN ('en', 'fr')
    """,
    tags=("source", "partitioned"),  # exported r9 rotation (was pytest-tier while the window was full)
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned export + pruned read-back: documents are written
    ``partitionBy(lang)`` and read back with a partition-column filter.
    Catalyst resolves the filter against the directory layout
    (PartitionFilters — pinned by test_plans_explain), so only the
    matching partition directories are listed and scanned: the layout
    primitive behind per-tenant / per-day datasets at 100 TB, where
    pruning is the difference between scanning 2 dirs and 2000.
    Matching the unpartitioned oracle proves the roundtrip is lossless
    (partition-column values are carried by the directory names)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="qss-part-")
    d.write.mode("overwrite").partitionBy("lang").parquet(work + "/docs")
    back = spark.read.parquet(work + "/docs").filter(
        F.col("lang").isin("en", "fr")
    )
    return back.select("doc_id", "n_chars", "lang")


@register(
    "source_python_datasource",
    oracle=f"""
    WITH gen AS (
      SELECT i AS id,
             (i * 2654435761) % 4294967296 AS h
      FROM (SELECT unnest(range(0, 1000)) AS i)
    )
    SELECT id, CAST(h % 16 AS INT) AS bucket,
           CAST(h AS DOUBLE) / 4294967296.0 AS value
    FROM gen
    """,
    tags=("source", "python-datasource"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source connector (sources/pyds.py): a pure-
    Python DataSource V2 implementation — partition planning via
    InputPartitions, Arrow-batched row delivery — read through the
    normal ``spark.read.format(...)`` path.  The generator derives each
    row from its id with engine-independent integer arithmetic, so the
    DuckDB oracle regenerates the identical rows and the connector
    roundtrip is hash-checked like every other source."""
    pin_session(spark)
    from quick_stream_spark.sources.pyds import register as register_pyds

    register_pyds(spark)
    return (
        spark.read.format("qss_synthetic")
        .option("rows", "1000")
        .option("partitions", "4")
        .load()
    )


@register(
    "source_python_stream_datasource",
    oracle=f"""
    WITH gen AS (
      SELECT i AS id,
             (i * 2654435761) % 4294967296 AS h
      FROM (SELECT unnest(range(0, 1000)) AS i)
    )
    SELECT id, CAST(h % 16 AS INT) AS bucket,
           CAST(h AS DOUBLE) / 4294967296.0 AS value
    FROM gen
    """,
    tags=("source", "python-datasource", "streaming"),
)
def source_python_stream_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the Python Data Source API
    (sources/pyds.py SyntheticRowsStreamReader): initialOffset /
    latestOffset / partitions(start, end) / read / commit — the full
    micro-batch offset protocol of a real connector, drained to a
    memory sink (four 250-row batches) and hash-checked against the
    regenerating oracle.  Offsets are tracked in the streaming
    checkpoint exactly as for a Kafka source, so exactly-once resume
    semantics carry over unchanged."""
    import time

    pin_session(spark)
    from quick_stream_spark.sources.pyds import register_stream

    register_stream(spark)
    stream = (
        spark.readStream.format("qss_synthetic_stream")
        .option("rows", "1000")
        .option("chunk", "250")
        .load()
    )
    work = tempfile.mkdtemp(prefix="qss-pyds-")
    name = f"pyds_{abs(hash(work)) % 10**8}"
    q = (
        stream.writeStream.queryName(name)
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", work + "/ckpt")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table(name).count() >= 1000:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    return spark.table(name)


@register(
    "pandas_scalar_revenue_cents",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT))
             AS revenue_micros
    FROM lineitem
    """,
    tags=("pandas", "scalar-udf"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def pandas_scalar_revenue_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow-batched @pandas_udf) — the
    third declared Python seam beside grouped-map (zscore) and
    mapInPandas (multimodal): discounted revenue in exact integer
    micros computed batch-at-a-time in pandas.  Scaled-integer math
    keeps the Python result bit-identical to the SQL oracle; the seam
    exists for logic built-ins can't express — here the arithmetic is
    deliberately simple so the contract (Arrow in, Arrow out, one
    Python roundtrip per batch, never per row) is what's under test."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem")

    # NOTE: annotations are module-level strings here (future import),
    # which pandas_udf cannot resolve from a closure — so the Series
    # hints are attached explicitly instead of inline
    def _revenue_micros(price, discount):
        cents = (price * 100 + 0.5).floordiv(1).astype("int64")
        dbp = (discount * 10000 + 0.5).floordiv(1).astype("int64")
        return cents * (10000 - dbp)

    _revenue_micros.__annotations__ = {
        "price": pd.Series, "discount": pd.Series, "return": pd.Series
    }
    revenue_micros = pandas_udf(_revenue_micros, "long")

    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue_micros(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "revenue_micros"
        ),
    )


UDTF_CHUNK = 32


@register(
    "udtf_chunk_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
      FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(least({UDTF_CHUNK}, n - i * {UDTF_CHUNK}) AS INT) AS n_tokens
    FROM toks, unnest(range(0, CAST(ceil(n * 1.0 / {UDTF_CHUNK}) AS BIGINT))) AS r(i)
    WHERE n > 0
    """,
    tags=("pandas", "udtf"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 @udtf) invoked as a
    correlated LATERAL table factor: each document expands to one row
    per non-overlapping {UDTF_CHUNK}-token chunk.  UDTFs are the
    row-expanding Python seam (eval yields any number of rows per
    input) — the declarative chunker text_chunking does this with
    built-ins; this twin pins the API surface itself, with the same
    whitespace tokenization so the DuckDB oracle replays it."""
    from pyspark.sql.functions import udtf

    pin_session(spark)

    @udtf(returnType="chunk_idx int, n_tokens int")
    class ChunkCounter:
        def eval(self, text: str):
            toks = text.split() if text and text.strip() else []
            for start in range(0, len(toks), UDTF_CHUNK):
                yield (start // UDTF_CHUNK, min(UDTF_CHUNK, len(toks) - start))

    spark.udtf.register("qss_chunks", ChunkCounter)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens "
        "FROM documents d, LATERAL qss_chunks(d.text) c"
    )


BINFILE_DOCS = 50  # bounded fixture subset written as individual files


@register(
    "source_binaryfile_metadata",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           substr(text, 1, 40) AS head
    FROM documents WHERE doc_id < {BINFILE_DOCS}
    """,
    tags=("source", "binary", "multimodal"),  # exported r9 rotation (was pytest-tier while the window was full)
)
def source_binaryfile_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``binaryFile`` source — the ingestion surface
    for raw multimodal payloads (images/audio/any bytes): the first
    {BINFILE_DOCS} documents are materialized as one file each, read
    back as (path, length, content) binary rows, and mapped to
    (doc_id-from-path, byte length, decoded head).  The oracle
    regenerates the same projection from the source table, so the
    whole write -> binary read -> parse path is value-checked.

    Scale design: binaryFile reads are file-parallel (one task per
    file up to maxPartitionBytes) and columns prune — selecting only
    ``length`` never reads file bodies.  The fixture write is a
    bounded {BINFILE_DOCS}-row driver loop (fixture prep, not the data
    path; production bytes land via distributed writers)."""
    import os
    import tempfile

    pin_session(spark)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < BINFILE_DOCS)
    work = tempfile.mkdtemp(prefix="qss-binfile-")
    for r in d.select("doc_id", "text").collect():  # bounded: BINFILE_DOCS rows
        with open(os.path.join(work, f"doc_{r.doc_id:06d}.txt"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(work)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.substring(F.col("content").cast("string"), 1, 40).alias("head"),
    )


@register(
    "source_xml_roundtrip",
    oracle=f"SELECT 'xml' AS fmt, * FROM ({_CONNECTOR_ORACLE})",
    tags=("source", "xml"),  # exported r9 rotation (was pytest-tier while the window was full)
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's built-in XML connector (the spark-xml package merged
    into core): write events as <row> elements, read back with an
    explicit schema and the same µs timestamp format, aggregate —
    matching the parquet-based oracle proves the XML round-trip is
    lossless including escaping of the JSON ``props`` payload.

    Scale design: identical to the other text connectors — file-parallel
    read, schema projection; XML is the interchange surface for feeds
    that deliver it, not a storage-format recommendation."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-xml-")
    (
        ev.write.mode("overwrite")
        .option("rowTag", "row")
        .option("timestampFormat", TS_FMT)
        .format("xml")
        .save(work + "/xml")
    )
    xml_back = (
        spark.read.schema(ev.schema)
        .option("rowTag", "row")
        .option("timestampFormat", TS_FMT)
        .format("xml")
        .load(work + "/xml")
    )
    return _connector_agg(xml_back, "xml")
