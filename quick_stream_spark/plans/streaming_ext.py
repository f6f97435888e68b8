"""Streaming-semantics queries (SURVEY.md §2.2 streaming row): event-time
tumbling windows, session windows, watermarked late-data handling — each
executed through a REAL Structured Streaming query (file source,
availableNow) whose emitted result is compared to a batch-SQL oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import (
    dsum,
    pin_session,
    rows_sized_parts,
    scoped_shuffle,
    shared_cache,
    sql_dsum,
)
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table, stream_parquet_dir, write_batches_as_files

SESSION_GAP = "30 minutes"

_EVENT_COUNT_CACHE: dict = shared_cache({})


def _stream_parts(spark: SparkSession, sf_dir: str) -> int:
    """Stateful streaming shuffle width from the events row count: each
    shuffle partition owns a state store instance, so an over-wide conf
    pays (partitions x micro-batches x queries) store instantiations —
    the dominant cost on small replays, and state-store count is what
    you size deliberately on a real cluster too."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EVENT_COUNT_CACHE:
        _EVENT_COUNT_CACHE[key] = load_table(spark, sf_dir, "events").count()
    return rows_sized_parts(_EVENT_COUNT_CACHE[key], 100_000)


def _events_stream(spark: SparkSession, sf_dir: str, n_files: int = 2):
    """Events replayed as a file-source stream (n_files micro-batch
    files, split by event_id parity so content is deterministic; one
    Spark job writes every delivery file — valid because all consumers
    here are batch-order independent)."""
    from quick_stream_spark.sources.readers import write_split_as_files

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-stream-")
    write_split_as_files(ev, F.col("event_id") % n_files, n_files, work + "/in")
    return stream_parquet_dir(spark, work + "/in", ev.schema), work


def _run_to_memory(
    spark: SparkSession,
    streaming_df,
    name: str,
    work: str,
    mode: str,
    parts: int | None = None,
) -> DataFrame:
    """Drain the stream into a memory sink.  ``parts`` sizes the
    stateful shuffle width for the drain (the streaming checkpoint pins
    it for the query's lifetime, so it must be chosen at start)."""
    from contextlib import nullcontext

    scope = scoped_shuffle(spark, parts) if parts else nullcontext()
    with scope:
        q = (
            streaming_df.writeStream.queryName(name)
            .format("memory")
            .outputMode(mode)
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "stream_windows",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT 'tumbling' AS kind,
           event_type AS grp,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(*) AS n,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'session' AS kind, grp, window_start, n, sum_value FROM (
      WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL '{SESSION_GAP}'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
      ),
      sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
      )
      SELECT CAST(user_id AS VARCHAR) AS grp, min(ts) AS window_start,
             count(*) AS n, {sql_dsum("value", "sum_value")}
      FROM sess GROUP BY user_id, session_id
    )
    """,
    tags=("streaming", "window", "session"),
)
def stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation through REAL streaming queries,
    both window kinds tagged in one result:

    - ``tumbling`` — 1-hour epoch-aligned windows per event_type with a
      watermark (complete mode so every window is emitted on the
      availableNow drain); Spark's window() aligns to the epoch exactly
      like DuckDB's time_bucket;
    - ``session`` — gap-based session windows ({SESSION_GAP}) per user;
      the oracle rebuilds sessions with the classic gap-and-cumsum
      window SQL.  Session semantics are order-independent, so the
      streaming result is deterministic.
    """
    pin_session(spark)
    stream, work = _events_stream(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )
    out = _run_to_memory(
        spark, windowed, f"win_counts_{abs(hash(work)) % 10**8}", work, "complete",
        parts=_stream_parts(spark, sf_dir),
    )
    tumbling = out.select(
        F.lit("tumbling").alias("kind"),
        F.col("event_type").alias("grp"),
        F.col("window.start").alias("window_start"),
        "n",
        "sum_value",
    )

    stream2, work2 = _events_stream(spark, sf_dir)
    sessions = (
        stream2.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", SESSION_GAP), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )
    out2 = _run_to_memory(
        spark, sessions, f"sessions_{abs(hash(work2)) % 10**8}", work2, "complete",
        parts=_stream_parts(spark, sf_dir),
    )
    session = out2.select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("grp"),
        F.col("session_window.start").alias("window_start"),
        "n",
        "sum_value",
    )
    return tumbling.unionByName(session)


@register(
    "stream_late_data_watermark",
    # Deterministic oracle: availableNow drains the two delivery files
    # in written order (file source sorts by mtime; batch-00000 is
    # written first), so the final append output is a pure function of
    # the two batch contents.  Batch 1 (newest half) sets the final
    # watermark W = max(ts) - 1h and emits every hour window whose end
    # <= W; batch 2 (oldest quarter) arrives entirely below W, is NOT
    # input-filtered on this Spark build, and its windows (all end <=
    # W) emit as late windows within batch 2.  The two batches' time
    # ranges are disjoint, so per-batch window aggregation + the same
    # emission filter restates the drain exactly.  Validated against
    # the live streaming query at sf0.001 and sf0.01.
    # epoch_ms(ts)/1000.0, NOT extract(epoch from ts): the Spark plan
    # splits batches on cast(ts as double) (fractional seconds), and
    # DuckDB's extract(epoch ...) truncates to integer seconds — a
    # subsecond event sitting exactly at the q1/mid quantile boundary
    # would otherwise land in different batches per engine (ADVICE r8)
    oracle="""
    WITH stats AS (
      SELECT quantile_cont(epoch_ms(ts)/1000.0, 0.5) AS mid,
             quantile_cont(epoch_ms(ts)/1000.0, 0.25) AS q1
      FROM events
    ),
    b1 AS (SELECT ts FROM events, stats WHERE epoch_ms(ts)/1000.0 >= mid),
    b2 AS (SELECT ts FROM events, stats WHERE epoch_ms(ts)/1000.0 <= q1),
    wm AS (SELECT max(epoch_ms(ts)/1000.0) - 3600 AS w FROM b1),
    w1 AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                  COUNT(*) AS n
           FROM b1 GROUP BY 1),
    w2 AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                  COUNT(*) AS n
           FROM b2 GROUP BY 1)
    SELECT window_start, n FROM w1, wm
    WHERE epoch_ms(window_start)/1000.0 + 3600 <= w
    UNION ALL
    SELECT window_start, n FROM w2, wm
    WHERE epoch_ms(window_start)/1000.0 + 3600 <= w
    """,
    tags=("streaming", "watermark"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_late_data_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, oracle-pinned: batch 1 carries the newest
    half of events, batch 2 replays the *oldest* quarter.  The watermark
    governs append-mode emission and state eviction: after the drain,
    every emitted window closed at or below the final watermark
    (window.end <= W, Spark's eviction predicate), and the incomplete
    tail windows are withheld.  Note (measured on this Spark build):
    late rows below the watermark are NOT input-filtered
    (numRowsDroppedByWatermark = 0) — they re-emit as late windows.
    The engine's late-data answer is therefore the MERGE idempotency
    guard (newer-wins upsert), not the watermark filter: redelivered
    windows merge idempotently downstream.

    Determinism: the drain order is pinned — write_batches_as_files
    names+writes the deliveries sequentially and the file source orders
    same-dir files by modification time, so batch 1 always precedes
    batch 2 and the emitted set is reproducible (the DuckDB oracle above
    replays the same rule per batch).  Reference anchor: this slot pins
    O4/watermark semantics (upsert.rs:158-204 accumulation windows)."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    cutoffs = ev.select(
        F.expr("percentile(cast(ts as double), 0.5)").alias("mid"),
        F.expr("percentile(cast(ts as double), 0.25)").alias("q1"),
    ).collect()[0]
    work = tempfile.mkdtemp(prefix="qss-late-")
    new_half = ev.filter(F.col("ts").cast("double") >= cutoffs.mid)
    old_quarter = ev.filter(F.col("ts").cast("double") <= cutoffs.q1)
    write_batches_as_files([new_half, old_quarter], work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(
        spark, windowed, f"late_{abs(hash(work)) % 10**8}", work, "append",
        parts=_stream_parts(spark, sf_dir),
    )
    return out.select(F.col("window.start").alias("window_start"), "n")


def _uncapped_lsh_pairs_sql() -> str:
    """Batch-SQL twin of the incremental index's final pair set: the
    MinHash-LSH pairs WITHOUT the bucket-size cap (an online cap would
    make results depend on delivery chunking — see
    streaming/dedup_index.py)."""
    from quick_stream_spark.functions import minhash as mh
    from quick_stream_spark.plans.text import DUP_CORPUS_SQL, JACCARD_THRESHOLD

    jac = (
        "round(len(list_intersect(sh_a, sh_b)) * 1.0 / "
        "greatest(len(list_distinct(list_concat(sh_a, sh_b))), 1), 6)"
    )
    return f"""
    WITH corpus AS ({DUP_CORPUS_SQL}),
    sh AS (SELECT id, {mh.hashed_shingles_sql('text')} AS sh FROM corpus),
    sig AS (SELECT id, sh, {mh.minhash_signature_from_bases_sql('sh')} AS sig FROM sh),
    banded AS (SELECT id, sh, unnest({mh.lsh_bands_sql('sig')}) AS band FROM sig),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      FROM banded a JOIN banded b USING (band)
      WHERE a.id < b.id
    )
    SELECT id_a, id_b, {jac} AS jaccard
    FROM cand WHERE {jac} >= {JACCARD_THRESHOLD}
    """


@register(
    "stream_dedup_minhash_incremental",
    oracle=None,  # set below (generated from the minhash twins)
    tags=("streaming", "dedup", "lsh"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection: the duplicated corpus arrives as
    three deliveries; each micro-batch LSH-bands its documents, queries
    the accumulated band index (band-key equi-join — a new doc only
    meets near-identical prior docs), emits verified pairs, and appends
    its bands to the index (streaming/dedup_index.py).  The final pair
    set is batch-order independent and equals the uncapped batch LSH
    pair set, which is the oracle."""
    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.plans.text import (
        _corpus_parts,
        _dup_corpus,
        _scoped_shuffle,
    )
    from quick_stream_spark.streaming.dedup_index import StreamingNearDupIndex

    pin_session(spark)
    corpus = _dup_corpus(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="qss-ndi-")
    from quick_stream_spark.sources.readers import write_split_as_files

    write_split_as_files(corpus, F.col("id") % 3, 3, work + "/in")
    ndi = StreamingNearDupIndex(
        spark,
        work + "/state",
        config=QuickStreamConfig(
            name="near-dup-index", checkpoint_dir=work + "/ckpt"
        ),
        # mid-feed maintenance (append-then-prune): dedups the band
        # index and the pairs log on disk; pairs() is read-distinct so
        # the exported contract is invariant to it
        auto_compact_every=2,
    )
    stream = stream_parquet_dir(spark, work + "/in", corpus.schema)
    with _scoped_shuffle(spark, _corpus_parts(spark, sf_dir)):
        ndi.run(stream, available_now=True)
    return ndi.pairs()


@register(
    "stream_dedup_clusters_incremental",
    oracle=None,  # set below: recursive CTE over the uncapped pair set
    tags=("streaming", "dedup", "lsh", "iterative"),  # the driver window is full; oracle-checked here
)
def stream_dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER maintenance over the document stream: after
    the three-delivery replay builds the band index and pairs log
    (stream_dedup_minhash_incremental), the cluster labels are
    refreshed from the accumulated pairs — connected components over a
    pair set that is orders smaller than the corpus, so the per-refresh
    cost follows duplicate volume, not corpus size
    (streaming/dedup_index.py clusters()).  End state is delivery-
    chunking independent: labels equal the batch CC over the uncapped
    LSH pairs, which the recursive-CTE oracle states."""
    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.plans.text import (
        _corpus_parts,
        _dup_corpus,
        _scoped_shuffle,
    )
    from quick_stream_spark.streaming.dedup_index import StreamingNearDupIndex

    pin_session(spark)
    corpus = _dup_corpus(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="qss-ndc-")
    from quick_stream_spark.sources.readers import write_split_as_files

    write_split_as_files(corpus, F.col("id") % 3, 3, work + "/in")
    ndi = StreamingNearDupIndex(
        spark,
        work + "/state",
        config=QuickStreamConfig(
            name="near-dup-clusters", checkpoint_dir=work + "/ckpt"
        ),
    )
    stream = stream_parquet_dir(spark, work + "/in", corpus.schema)
    with _scoped_shuffle(spark, _corpus_parts(spark, sf_dir)):
        ndi.run(stream, available_now=True)
        return ndi.clusters().localCheckpoint(eager=True)


def _stream_cc_oracle() -> str:
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({_uncapped_lsh_pairs_sql()}) p),
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
      )
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
    )
    SELECT id, min(r) AS component FROM reach GROUP BY id
    """


from quick_stream_spark.plans.registry import REGISTRY as _SEREG  # noqa: E402

_SEREG["stream_dedup_minhash_incremental"].oracle = " ".join(
    _uncapped_lsh_pairs_sql().split()
)
_SEREG["stream_dedup_clusters_incremental"].oracle = " ".join(
    _stream_cc_oracle().split()
)


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id, p.event_id AS purchase_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL '30 minutes'
    """,
    tags=("streaming", "join"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join — the canonical funnel query: each
    view event joins the SAME user's purchase events within the
    following 30 minutes, as a REAL streaming-to-streaming inner join
    (both sides watermarked; Spark buffers each side's state and
    evicts it past watermark + interval).

    Determinism vs the batch oracle: the input is replayed as two
    time-ordered halves (split at the median ts), and the 2-hour
    watermark delay is far larger than the 30-minute join interval, so
    no row that could still find a partner is ever evicted before its
    partner's half arrives — the drained result is exactly the batch
    join.  At scale the join state is partitioned by user_id and
    bounded by the watermark horizon; eviction is what makes an
    unbounded stream joinable at all."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    mid = ev.select(
        F.expr("percentile(cast(ts as double), 0.5)").alias("mid")
    ).collect()[0].mid  # bounded: one scalar for the deterministic split
    older = ev.filter(F.col("ts").cast("double") <= mid)
    newer = ev.filter(F.col("ts").cast("double") > mid)
    work = tempfile.mkdtemp(prefix="qss-ssj-")
    write_batches_as_files([older, newer], work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = _run_to_memory(
        spark,
        joined,
        f"ssj_{abs(hash(work)) % 10**8}",
        work,
        "append",
        parts=_stream_parts(spark, sf_dir),
    )
    return out.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
    )


@register(
    "stream_static_enrich",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_events,
           {sql_dsum("e.value", "sum_value")}
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("streaming", "join", "enrichment"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the canonical dimension lookup:
    the events stream joins the STATIC customer->nation dimension chain
    (re-read per micro-batch, broadcast to every task: no stream-side
    state, no shuffle of the stream), then aggregates per nation in
    complete mode.

    Determinism: an inner join against a static dim plus a
    whole-input aggregate is delivery-order independent, so the
    availableNow drain equals the batch join.  At 100 TB the stream
    side never shuffles for the join (broadcast hash join per batch);
    the aggregation shuffles on the 25-key nation — trivially small
    state."""
    pin_session(spark)
    stream, work = _events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = F.broadcast(
        cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("nation")
        )
    )
    enriched = stream.join(dim, stream.user_id == dim.c_custkey)
    agg = enriched.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    )
    out = _run_to_memory(
        spark,
        agg,
        f"sse_{abs(hash(work)) % 10**8}",
        work,
        "complete",
        parts=_stream_parts(spark, sf_dir),
    )
    return out.select("nation", "n_events", "sum_value")


@register(
    "stream_matview_hourly",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT event_type,
           time_bucket(INTERVAL '1 hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "matview", "incremental"),
)
def stream_matview_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance
    (streaming/matview.py): an (event_type, hour) aggregate table kept
    current by additive MERGE across a 3-delivery replay — per batch
    the work is partial-aggregate + read of ONLY the touched groups
    (bucket-pruned) + upsert, never a view rebuild.  SUM/COUNT are
    additive over exact decimal sums, so the drained view equals the
    one-shot batch aggregate regardless of delivery chunking — which
    is exactly what the oracle checks.

    At 100 TB this is the pattern that turns a 6-hour nightly rollup
    into a per-micro-batch increment bounded by the batch's group
    count."""
    import tempfile as _tf

    from quick_stream_spark.sources.readers import write_split_as_files
    from quick_stream_spark.streaming.matview import IncrementalAggView

    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = _tf.mkdtemp(prefix="qss-mv-")
    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
    hourly = lambda df: df.select(  # noqa: E731
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
        "event_id",
    )
    view = IncrementalAggView(
        spark, work + "/view", group_cols=["event_type", "hour"], value_col="value"
    )
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        q = (
            hourly(stream)
            .writeStream.queryName(f"mv_{abs(hash(work)) % 10**8}")
            .foreachBatch(view.foreach_batch())
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return view.read()


@register(
    "stream_matview_distinct_users",
    oracle="""
    WITH pos AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 1024 AS p,
             user_id
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(DISTINCT p) AS BIGINT) AS bitmap_bits,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM pos GROUP BY event_type
    )
    SELECT event_type, bitmap_bits,
           CAST(round(-1024 * ln(CAST(1024 - bitmap_bits AS DOUBLE) / 1024)) AS BIGINT)
             AS est_distinct,
           exact_distinct
    FROM agg
    """,
    tags=("streaming", "matview", "distinct"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_matview_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matview's second monoid: mergeable DISTINCT counting per
    group via a linear-counting bitmap whose per-batch merge is set
    union (bitmap OR) — distinct users per event type maintained
    incrementally across a 3-delivery replay and compared against the
    exact distinct count.  Bitmap union is idempotent AND commutative,
    so unlike raw counts it is also correct under replayed deliveries —
    the reason real pipelines store sketches, not counters, for
    distinct metrics.

    State per group is bounded by m=1024 ints regardless of user
    volume; the oracle replays the bitmap arithmetic on the whole
    input at once, which must equal the incrementally-merged state
    (chunking independence of the monoid)."""
    import tempfile as _tf

    from quick_stream_spark.sources.readers import write_split_as_files
    from quick_stream_spark.streaming.matview import IncrementalAggView

    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = _tf.mkdtemp(prefix="qss-mvd-")
    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
    view = IncrementalAggView(
        spark,
        work + "/view",
        group_cols=["event_type"],
        value_col="value",
        distinct_col="user_id",
        bitmap_m=1024,
    )
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        q = (
            stream.select("event_type", "value", "user_id")
            .writeStream.queryName(f"mvd_{abs(hash(work)) % 10**8}")
            .foreachBatch(view.foreach_batch())
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return (
        view.read()
        .join(exact, "event_type")
        .select("event_type", "bitmap_bits", "est_distinct", "exact_distinct")
    )


STREAM_HLL_P = 10  # m=1024 registers per event_type


@register(
    "stream_distinct_hll",
    oracle=None,  # set below: shared HLL CTE stack + exact join
    tags=("streaming", "sketch", "distinct", "hll"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct counting with HyperLogLog register state
    (streaming/distinct_index.py) — the scale-independent sibling of
    ``stream_matview_distinct_users``: the LC bitmap's estimate
    saturates as cardinality approaches m, HLL registers keep ~1.04/
    sqrt(m) relative error at ANY cardinality from the same 2^p rows of
    state per group.  Distinct event_ids per event_type maintained
    across a 3-delivery replay via an append-only register log (each
    batch appends its own bounded (group, bucket, max-rank) table;
    readers max-merge on scan).  Max-merge is idempotent + commutative
    + associative, so the drained state equals the one-shot batch
    sketch regardless of delivery chunking OR at-least-once replays —
    exactly what the oracle states by replaying the register math on
    the whole table at once (functions/hll.py, shared with
    ``sketch_hll_registers``)."""
    import tempfile as _tf

    from quick_stream_spark.streaming.distinct_index import (
        StreamingDistinctCounter,
    )

    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = _tf.mkdtemp(prefix="qss-hll-")
    from quick_stream_spark.sources.readers import write_split_as_files

    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
    counter = StreamingDistinctCounter(
        spark,
        work + "/state",
        key_col="event_id",
        group_cols=("event_type",),
        p=STREAM_HLL_P,
        tag="stream",
        # the production cadence: the stream compacts its own register
        # log mid-feed (append-then-prune, crash-safe), so the exported
        # query exercises bounded-state maintenance, not just the append
        # path; max-merge makes the estimate invariant to it
        auto_compact_every=2,
    )
    counter.config.checkpoint_dir = work + "/ckpt"
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        counter.run(stream, available_now=True)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("event_id").alias("exact_distinct")
    )
    return (
        counter.estimate()
        .join(exact, "event_type")
        .select(
            "event_type",
            "filled",
            "raw_est",
            "est_distinct",
            "exact_distinct",
            (F.col("est_distinct") - F.col("exact_distinct")).alias("err"),
        )
    )


def _stream_hll_oracle() -> str:
    from quick_stream_spark.functions import hll as _hll

    est = _hll.estimate_sql(
        STREAM_HLL_P, "stream", "event_id", "events", ("event_type",)
    )
    return f"""
    SELECT e.event_type, e.filled, e.raw_est, e.est_distinct,
           x.exact_distinct, e.est_distinct - x.exact_distinct AS err
    FROM ({est}) e
    JOIN (SELECT event_type,
                 CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
          FROM events GROUP BY event_type) x
    USING (event_type)
    """


from quick_stream_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["stream_distinct_hll"].oracle = " ".join(_stream_hll_oracle().split())


def _stream_cms_oracle() -> str:
    from quick_stream_spark.plans.sketches import (
        CMS_TOPK,
        _cms_counters_sql,
        _cms_probe_sql,
    )

    return f"""
    WITH counters AS ({_cms_counters_sql()}),
    exact AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n
      FROM lineitem GROUP BY l_partkey
    ),
    top AS (
      SELECT l_partkey, exact_n FROM exact
      ORDER BY exact_n DESC, l_partkey ASC LIMIT {CMS_TOPK}
    ),
    probe AS ({_cms_probe_sql()})
    SELECT p.l_partkey, p.exact_n,
           min(c.c) AS cms_n,
           min(c.c) - p.exact_n AS overestimate
    FROM probe p JOIN counters c ON c.j = p.j AND c.idx = p.idx
    GROUP BY p.l_partkey, p.exact_n
    """


@register(
    "stream_countmin_heavy_hitters",
    oracle=None,  # set below: identical to the batch CMS oracle
    tags=("streaming", "sketch", "countmin", "heavy-hitters"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters maintained over a STREAM — the
    sum-monoid member completing the streaming-sketch family (bitmap
    union in ``stream_matview_distinct_users``, register max in
    ``stream_distinct_hll``): CMS counters are ADDITIVE, so unlike the
    other two monoids a replayed delivery would double-count — which is
    exactly why the counters live in an :class:`IncrementalAggView`
    (its stored ``_batch_id`` transaction id makes retried epochs
    no-ops, the idempotent-foreachBatch recipe pinned by
    test_matview.py).  Each micro-batch explodes its rows into
    {CMS_D}x(row, index) keys and additively merges at most
    {CMS_D}x{CMS_W} touched counters; the drained counter table equals
    the one-shot batch sketch (additivity = chunking independence), so
    the oracle is byte-identical to ``sketch_countmin_heavy_hitters``'s
    and the probe reads min-over-rows for the exact top parts."""
    import tempfile as _tf

    from quick_stream_spark.plans.sketches import CMS_D, CMS_TOPK, _cms_idx
    from quick_stream_spark.sources.readers import write_split_as_files
    from quick_stream_spark.streaming.matview import IncrementalAggView

    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    work = _tf.mkdtemp(prefix="qss-cms-")
    write_split_as_files(li, F.col("l_orderkey") % 3, 3, work + "/in")

    def hashes(key) -> F.Column:
        return F.array(
            *[
                F.struct(F.lit(j).alias("j"), _cms_idx(j, key).alias("idx"))
                for j in range(CMS_D)
            ]
        )

    # value_type="long": the CMS counter is the exact 64-bit SUM of the
    # integer weights (w=1 per occurrence here; weighted increments in
    # general) — the same integer discipline as the batch sketch family
    # (r6 verdict ask #6).  The previous shape routed a 1.0 DOUBLE
    # weight into the decimal value path and read the row count instead.
    view = IncrementalAggView(
        spark,
        work + "/view",
        group_cols=["j", "idx"],
        value_col="w",
        value_type="long",
    )
    stream = stream_parquet_dir(spark, work + "/in", li.schema)
    keyed = (
        stream.select(F.explode(hashes(F.col("l_partkey"))).alias("p"))
        .select("p.j", "p.idx", F.lit(1).cast("long").alias("w"))
    )
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        q = (
            keyed.writeStream.queryName(f"cms_{abs(hash(work)) % 10**8}")
            .foreachBatch(view.foreach_batch())
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    counters = view.read().select("j", "idx", F.col("sum_value").alias("c"))
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("l_partkey")).limit(CMS_TOPK)
    probe = top.select(
        "l_partkey", "exact_n", F.explode(hashes(F.col("l_partkey"))).alias("p")
    ).select("l_partkey", "exact_n", "p.j", "p.idx")
    return (
        probe.join(F.broadcast(counters), ["j", "idx"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("c").alias("cms_n"))
        .select(
            "l_partkey",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
    )


_REG2 = __import__(
    "quick_stream_spark.plans.registry", fromlist=["REGISTRY"]
).REGISTRY
_REG2["stream_countmin_heavy_hitters"].oracle = " ".join(
    _stream_cms_oracle().split()
)


# ------------------------------------------------- streaming ANN index


def _emb_dup_corpus_banded_sql() -> str:
    """Batch-SQL twin of the streaming vector index's final pair set:
    banded sign-LSH near-dup pairs over the doubled embedding corpus."""
    from quick_stream_spark.functions import vectors as vec
    from quick_stream_spark.plans.similarity import (
        DIM,
        DUP_BAND_BITS,
        DUP_BANDS,
        DUP_PLANES,
        EMB_DUP_OFFSET,
        EMB_DUP_THRESHOLD,
    )

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    corpus AS (
      SELECT vec_id, v FROM e
      UNION ALL
      SELECT vec_id + {EMB_DUP_OFFSET} AS vec_id,
             list_transform(v, x -> x * 1.02 + 0.01) AS v
      FROM e
    ),
    {vec.banded_sig_ctes_sql('corpus', DUP_PLANES, DUP_BAND_BITS, DIM)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
      FROM bands a JOIN bands bb ON a.b = bb.b AND a.bits = bb.bits
      WHERE a.vec_id < bb.vec_id
    )
    SELECT id_a, id_b, round({vec.cosine_sql('x.v', 'y.v', DIM)}, 6) AS cos_sim
    FROM cand
    JOIN corpus x ON x.vec_id = id_a
    JOIN corpus y ON y.vec_id = id_b
    WHERE {vec.cosine_sql('x.v', 'y.v', DIM)} >= {EMB_DUP_THRESHOLD}
    """


@register(
    "stream_emb_neardup_incremental",
    oracle=None,  # set below (generated from the similarity constants)
    tags=("streaming", "similarity", "dedup", "lsh"),  # the driver window is full; oracle-checked here
)
def stream_emb_neardup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup detection: the doubled vector
    corpus (originals + deterministic perturbations) arrives as three
    deliveries; each micro-batch signs and bands its vectors, queries
    the accumulated band index ((band, bits) equi-join — a new vector
    only meets candidates sharing a band), emits exact-cosine-verified
    pairs, and appends its entries to the index
    (streaming/ann_index.py) — using the NEAR-DUP band geometry (wide
    12-bit bands over 48 planes, see similarity.DUP_PLANES: dedup
    targets sit at ~0.997 cosine, where wide bands give ~0.98 recall
    AND high selectivity), not the retrieval geometry.  The drained
    pair set is delivery-chunking independent and equals the batch
    banded-LSH near-dup pairs, which is the oracle — the embedding
    twin of stream_dedup_minhash_incremental."""
    import tempfile as _tf

    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.plans.similarity import (
        DUP_BAND_BITS,
        DUP_PLANES,
        EMB_DUP_OFFSET,
        EMB_DUP_THRESHOLD,
        _emb,
    )
    from quick_stream_spark.sources.readers import write_split_as_files
    from quick_stream_spark.streaming.ann_index import StreamingAnnIndex

    pin_session(spark)
    e = _emb(spark, sf_dir).select("vec_id", "v")
    pert = e.select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x * 1.02 + 0.01).alias("v"),
    )
    corpus = e.unionByName(pert)
    work = _tf.mkdtemp(prefix="qss-anni-")
    write_split_as_files(corpus, F.col("vec_id") % 3, 3, work + "/in")
    idx = StreamingAnnIndex(
        spark,
        work + "/state",
        planes=DUP_PLANES,
        band_bits=DUP_BAND_BITS,
        threshold=EMB_DUP_THRESHOLD,  # pin the verify threshold to the
        # same constant the oracle filters on — geometry AND threshold
        # must move together
        config=QuickStreamConfig(name="emb-ann-index", checkpoint_dir=work + "/ckpt"),
    )
    stream = stream_parquet_dir(spark, work + "/in", corpus.schema)
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        idx.run(stream, available_now=True)
    return idx.pairs()


@register(
    "stream_emb_ann_topk",
    oracle=None,  # set below: identical contract to the batch banded LSH
    tags=("streaming", "similarity", "lsh", "ann"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval against the INCREMENTALLY built vector index: the
    embedding corpus arrives as three deliveries appending to the
    banded sign-LSH index (built with the batch RETRIEVAL geometry —
    192 planes, 48 x 4-bit bands, collision-count threshold, no pair
    emission); after the drain, top-k retrieval for the query vectors
    runs against the accumulated index — candidates share >=
    LSH_ANN_MIN_BANDS bands, exact cosine re-ranks.  The result is
    delivery-chunking independent and equals the batch
    ``emb_lsh_ann_topk`` over the same corpus (the oracle is literally
    that query's SQL): the index you build incrementally answers
    exactly like the one you would build in batch."""
    import tempfile as _tf

    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.plans.similarity import (
        LSH_ANN_BAND_BITS,
        LSH_ANN_MIN_BANDS,
        LSH_ANN_PLANES,
        NUM_QUERIES,
        TOP_K,
        _emb,
    )
    from quick_stream_spark.sources.readers import write_split_as_files
    from quick_stream_spark.streaming.ann_index import StreamingAnnIndex

    pin_session(spark)
    corpus = _emb(spark, sf_dir).select("vec_id", "v")
    work = _tf.mkdtemp(prefix="qss-annq-")
    write_split_as_files(corpus, F.col("vec_id") % 3, 3, work + "/in")
    idx = StreamingAnnIndex(
        spark,
        work + "/state",
        planes=LSH_ANN_PLANES,
        band_bits=LSH_ANN_BAND_BITS,
        min_bands=LSH_ANN_MIN_BANDS,
        emit_pairs=False,
        config=QuickStreamConfig(name="emb-ann-topk", checkpoint_dir=work + "/ckpt"),
    )
    stream = stream_parquet_dir(spark, work + "/in", corpus.schema)
    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        idx.run(stream, available_now=True)
    return idx.topk(NUM_QUERIES, TOP_K)


def _wire_ann_stream_oracles() -> None:
    _SEREG["stream_emb_neardup_incremental"].oracle = " ".join(
        _emb_dup_corpus_banded_sql().split()
    )
    _SEREG["stream_emb_ann_topk"].oracle = _SEREG["emb_lsh_ann_topk"].oracle


_wire_ann_stream_oracles()


@register(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS seq
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, seq
    """,
    tags=("streaming", "sessionization", "stateful"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE streaming sessionization: Structured Streaming's
    ``session_window`` (dynamic gap-merged windows with
    watermark-evicted state) over a three-delivery replay of the
    events table — the unbounded-state counterpart of the batch
    ``events_sessionize`` operator.  A session's window is
    [first event, last event + 30 min); the oracle restates that as
    the gap-split interval merge in plain SQL over the whole table,
    which the drained stream must equal regardless of delivery
    chunking.  Complete output mode (no watermark): append mode only
    emits a session once the watermark passes its end, so the corpus's
    trailing sessions would stay in state forever on a drained replay;
    complete mode emits the full merged-session state — the right
    contract for a bounded replay (watermark-driven eviction behavior
    is covered by stream_late_data_watermark)."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    work = tempfile.mkdtemp(prefix="qss-sess-")
    from quick_stream_spark.sources.readers import write_split_as_files

    write_split_as_files(ev, F.xxhash64("user_id", "ts") % 3, 3, work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    sessioned = stream.groupBy(
        F.session_window(F.col("ts"), "30 minutes").alias("sw"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = _run_to_memory(
        spark,
        sessioned,
        f"sess_{abs(hash(work)) % 10**8}",
        work,
        "complete",
        parts=_stream_parts(spark, sf_dir),
    )
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    )


@register(
    "stream_quality_filter",
    oracle=None,  # set below from the classifier's shared CTE stack
    tags=("streaming", "text", "ml", "classifier"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPLOY the trained quality classifier on a document stream —
    the other half of the distillation story: train the Rocchio
    centroids once on the static even-doc_id split
    (text_quality_classifier_train's model), then score every arriving
    document in-stream and keep only the accepted ones.  Scoring is
    ROW-LOCAL literal-array math (the centroids ride the closure), so
    the accepted set is delivery-chunking independent and equals the
    batch scoring of the whole corpus — the oracle restates exactly
    that with the shared train+predict CTE stack.  The emitted rows
    carry the heuristic label too, so the stream's live
    accept-vs-label confusion is auditable downstream."""
    from quick_stream_spark.plans.text import (
        _docs,
        _pct_features,
        _pct_predict,
        _pct_train_centroids,
    )
    from quick_stream_spark.sources.readers import write_split_as_files

    pin_session(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cp, cn = _pct_train_centroids(
        _pct_features(docs).filter(F.col("doc_id") % 2 == 0)
    )
    work = tempfile.mkdtemp(prefix="qss-sqf-")
    write_split_as_files(docs, F.col("doc_id") % 3, 3, work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", docs.schema)
    out_path = work + "/accepted"
    # seed the output path schema-only: if every micro-batch rejects
    # everything (or the stream is empty) the final read must return an
    # empty (doc_id, y) frame, not a path-not-found AnalysisException
    _pct_features(docs.limit(0)).select("doc_id", "y").write.mode(
        "append"
    ).parquet(out_path)

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        scored = _pct_features(batch).select(
            "doc_id", "y", _pct_predict(cp, cn).alias("yhat")
        )
        scored.filter(F.col("yhat") == 1).select("doc_id", "y").write.mode(
            "append"
        ).parquet(out_path)

    with scoped_shuffle(spark, _stream_parts(spark, sf_dir)):
        q = (
            stream.writeStream.queryName(f"sqf_{abs(hash(work)) % 10**8}")
            .foreachBatch(score_batch)
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_path).distinct()


def _wire_quality_filter_oracle() -> None:
    from quick_stream_spark.plans.text import _pct_oracle_ctes

    _SEREG["stream_quality_filter"].oracle = " ".join(
        f"""
        WITH {_pct_oracle_ctes()}
        SELECT doc_id, y FROM pred WHERE yhat = 1
        """.split()
    )


_wire_quality_filter_oracle()
