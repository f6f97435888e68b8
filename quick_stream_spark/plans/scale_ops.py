"""Scale-posture operators: catalog-bucketed co-located joins (the
shuffle-elimination pattern big MERGEs and fact-fact joins need at
100 TB) and custom stateful streaming (applyInPandasWithState).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.functions import text as _tx
from quick_stream_spark.plans._util import dsum, pin_session, rows_sized_parts, scoped_shuffle, sql_dsum
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
    # One SHARED bucketed pair per sf_dir (ADVICE r11): the table data
    # is immutable (derived from the fixed source parquet), so ALL
    # processes can share one on-disk pair — no per-pid rebuild, no
    # dead-pid sweeps (the r11 per-pid names fixed a clobbering flake
    # but forfeit reuse and leaned on /proc liveness).  Safety comes
    # from an ATOMIC PUBLISH instead of liveness: a builder writes the
    # bucketed files under a process-unique staging table, renames the
    # directory into the shared location (atomic on one filesystem —
    # existence == complete data, so readers can never see a partial
    # build and nothing ever deletes a published dir), and every
    # process registers its own catalog entry as an EXTERNAL bucketed
    # table over that location.
    import hashlib
    import shutil

    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]

    def _warehouse(spark):
        return os.path.abspath(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            .removeprefix("file:")
            .rstrip("/")
        )

    names = []
    for base, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"{base}_b_{int(digest, 16)}"
        names.append(name)
        if spark.catalog.tableExists(name):
            continue
        shared = os.path.join(_warehouse(spark), f"qss_bucketed_{digest}", base)
        if not os.path.isdir(shared):
            # stage under a process-unique managed table, then publish
            stage = f"{base}_stage_{int(digest, 16)}_{os.getpid()}"
            stage_dir = os.path.join(_warehouse(spark), stage.lower())
            shutil.rmtree(stage_dir, ignore_errors=True)  # crash leftovers
            (
                load_table(spark, sf_dir, base)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(stage)
            )
            os.makedirs(os.path.dirname(shared), exist_ok=True)
            try:
                os.rename(stage_dir, shared)
            except OSError:
                # another builder published first — use theirs
                pass
            spark.sql(f"DROP TABLE IF EXISTS {stage}")
            shutil.rmtree(stage_dir, ignore_errors=True)
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in load_table(spark, sf_dir, base).schema.fields
        )
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {N_BUCKETS} BUCKETS LOCATION '{shared}'"
        )
    return names[0], names[1]


@register(
    "join_bucketed_colocated",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
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
    a plain join — bucketing is purely physical, so if the catalog
    warehouse isn't writable in the calling environment we fall back to
    the plain (shuffled) join with identical results."""
    try:
        o_name, l_name = _ensure_bucketed_tables(spark, sf_dir)
        o = spark.table(o_name)
        li = spark.table(l_name)
    except Exception:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


_SPLIT_HASH = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"


_FULL_HASH = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "sample_splits",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_SPLIT_HASH} < 90 THEN 'train'
                WHEN {_SPLIT_HASH} < 95 THEN 'val'
                ELSE 'test' END AS split,
           {_SPLIT_HASH} < 10 AS in_10pct_sample,
           lang,
           row_number() OVER (PARTITION BY lang ORDER BY {_FULL_HASH}, doc_id)
             <= CEIL(0.1 * COUNT(*) OVER (PARTITION BY lang))
             AS in_stratified_10pct
    FROM documents
    """,
    tags=("sampling", "pipeline", "stratified"),
)
def sample_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed sampling, three shapes in one pass: the
    train/val/test assignment (90/5/5), a deterministic ~10% sample
    flag — each a pure function of the id's md5, reproducible across
    runs, engines and cluster sizes — and an EXACT-size stratified 10%
    sample per language (rank by hash within each ``lang`` stratum,
    keep the first ceil(10%)), the balanced-sampling shape that keeps
    low-resource languages represented.  Unlike RNG sampling, a
    document never migrates between splits when the corpus grows, and
    the flags are composable because all condition on the same hash.
    The stratified rank is the only shuffle (partitioned by stratum;
    strata are languages, so per-reducer load is bounded by the
    language mix, and a skewed stratum degrades to the plain
    hash-threshold flag which needs no rank at all)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    full_h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = full_h % 100
    w = Window.partitionBy("lang").orderBy(full_h.asc(), F.col("doc_id").asc())
    stratum = Window.partitionBy("lang")
    return d.select(
        "doc_id",
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test").alias("split"),
        (h < 10).alias("in_10pct_sample"),
        "lang",
        (
            F.row_number().over(w)
            <= F.ceil(F.count(F.lit(1)).over(stratum) * 0.1)
        ).alias("in_stratified_10pct"),
    )


_ORDER_HASH_SQL = (
    "(('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
)
ORDER_BUCKET_BITS = 6  # 64 range buckets over the hash's high bits


@register(
    "sample_training_order",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_ORDER_HASH_SQL} AS hv FROM documents
    )
    SELECT doc_id,
           hv // {1 << (60 - ORDER_BUCKET_BITS)} AS bucket,
           CAST(row_number() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
    FROM h
    """,
    tags=("sampling", "pipeline", "ordering"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def sample_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle — every document gets
    a stable position 0..N-1 in hash order (the epoch-shuffle a training
    pipeline materializes so examples stream in a reproducible
    pseudo-random order) — WITHOUT the global sort a naive
    ``row_number() OVER (ORDER BY hash)`` plans (one reducer holding
    the corpus).  The hash's {ORDER_BUCKET_BITS} high bits are
    order-preserving range buckets, so the global position decomposes
    into (sum of earlier buckets' counts) + (rank within the bucket):
    the counts make a {1 << ORDER_BUCKET_BITS}-row offset artifact (the
    only single-partition step — bounded by the bucket count, not the
    data) broadcast back onto a bucket-partitioned window.  The data
    never range-shuffles to one machine; per-bucket load is uniform
    because md5 is.  At 100 TB the bucket count is the parallelism
    dial (high bits, so more buckets still nest inside the same
    order).  Seeded re-shuffles are a tag change ('order:' -> epoch
    tag); ties broken by doc_id in both engines for total order."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    base = d.select("doc_id", hv.alias("hv"), F.shiftright(hv, 60 - ORDER_BUCKET_BITS).alias("bucket"))
    counts = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off")
    )
    in_bucket = Window.partitionBy("bucket").orderBy(F.asc("hv"), F.asc("doc_id"))
    return (
        base.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("off") + F.row_number().over(in_bucket) - 1).alias("pos"),
        )
    )


@register(
    "pipeline_training_data",
    oracle=None,  # set below: assembled from the same function twins
    tags=("text", "pipeline"),
    bench=True,
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM training-data pipeline over the duplicated corpus:
    exact-dedup (fingerprint, keep lowest id) -> near-dup removal (drop
    the higher id of every verified MinHash-LSH pair) -> quality filter
    (score >= 0.5) -> language tag + token count -> per-language corpus
    stats.  Every stage is one of the engine's declared operators; the
    composition is one Catalyst plan per stage boundary with no driver
    loops."""
    from quick_stream_spark.functions import text as tx
    from quick_stream_spark.plans.registry import REGISTRY
    from quick_stream_spark.plans.text import _dup_corpus

    pin_session(spark)
    corpus = _dup_corpus(spark, sf_dir)
    # exact dedup: keep the lowest id per normalized fingerprint
    keep = (
        corpus.select("id", tx.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("id"))
        .select("id")
    )
    survivors = corpus.join(keep, "id")
    # near-dup removal: drop the higher id of each verified pair
    near_pairs = REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir)
    drop = near_pairs.select(F.col("id_b").alias("id")).distinct()
    survivors = survivors.join(drop, "id", "left_anti")
    # quality + language + token count, computed from ONE shared
    # token-array projection (r15, guide §4.1/§2.3): the naive
    # lang_id+quality+token_count select carries ~40 copies of the
    # ``split(trim(text),'\s+')`` subtree; projecting the tokens and
    # the five language scores once makes the regex split and each
    # array filter run once per row (CollapseProject keeps multiply-
    # referenced non-cheap aliases in their own projection).  Same
    # formulas in the same operation order — identical IEEE doubles;
    # oracle re-verified at sf0.001 + sf0.01.
    toks = tx.ws_tokens(F.col("text"))
    pre = survivors.select("id", "text", toks.alias("_toks"))
    scores = tx.lang_scores_from(F.col("_toks"))
    pre = pre.select(
        "id",
        "text",
        "_toks",
        *[scores[lang].alias(f"_s_{lang}") for lang in tx.LANG_ORDER],
    )
    score_cols = {lang: F.col(f"_s_{lang}") for lang in tx.LANG_ORDER}
    enriched = pre.select(
        "id",
        tx.lang_id_from_scores(score_cols).alias("lang_pred"),
        tx.quality_score_from(F.col("text"), F.col("_toks")).alias("quality"),
        tx.token_count_from(F.col("_toks")).alias("n_tokens"),
    ).filter(F.col("quality") >= 0.5)
    out = enriched.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        # round BEFORE the long cast: quality*1e6 sits a float-ulp off an
        # integer and Spark's cast truncates while DuckDB's rounds
        F.round(F.sum(F.round(F.col("quality") * 1_000_000).cast("long")).cast("double")
                / F.count(F.lit(1)) / 1_000_000, 6).alias("avg_quality"),
    )
    # eager run under a corpus-sized shuffle width (fingerprint groupBy
    # + survivor joins are the pipeline's shuffles); the result is a
    # handful of per-language rows
    from quick_stream_spark.plans.text import _corpus_parts, _scoped_shuffle

    with _scoped_shuffle(spark, _corpus_parts(spark, sf_dir)):
        return out.localCheckpoint(eager=True)


def _pipeline_oracle() -> str:
    from quick_stream_spark.functions import minhash as mh
    from quick_stream_spark.functions import text as tx
    from quick_stream_spark.plans.text import DUP_CORPUS_SQL, JACCARD_THRESHOLD

    jac = (
        "round(len(list_intersect(sh_a, sh_b)) * 1.0 / "
        "greatest(len(list_distinct(list_concat(sh_a, sh_b))), 1), 6)"
    )
    return f"""
    WITH corpus AS ({DUP_CORPUS_SQL}),
    keep AS (
      SELECT min(id) AS id FROM (
        SELECT id, md5({tx.normalize_text_sql('text')}) AS fp FROM corpus
      ) GROUP BY fp
    ),
    sh AS (SELECT id, {mh.hashed_shingles_sql('text')} AS sh FROM corpus),
    sig AS (SELECT id, sh, {mh.minhash_signature_from_bases_sql('sh')} AS sig FROM sh),
    banded AS (SELECT id, sh, unnest({mh.lsh_bands_sql('sig')}) AS band FROM sig),
    ok_bands AS ({mh.lsh_bucket_filter_sql('banded')}),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      FROM banded a JOIN banded b USING (band)
      WHERE a.id < b.id AND band IN (SELECT band FROM ok_bands)
    ),
    drop_ids AS (
      SELECT DISTINCT id_b AS id FROM cand WHERE {jac} >= {JACCARD_THRESHOLD}
    ),
    survivors AS (
      SELECT c.id, c.text FROM corpus c
      JOIN keep ON c.id = keep.id
      WHERE c.id NOT IN (SELECT id FROM drop_ids)
    ),
    enriched AS (
      SELECT id,
             {tx.lang_id_sql('text')} AS lang_pred,
             {tx.quality_score_sql('text')} AS quality,
             {tx.token_count_ws_sql('text')} AS n_tokens
      FROM survivors
    )
    SELECT lang_pred, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(round(quality * 1000000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1000000, 6) AS avg_quality
    FROM enriched WHERE quality >= 0.5
    GROUP BY lang_pred
    """


from quick_stream_spark.plans.registry import REGISTRY as _SREG  # noqa: E402

_SREG["pipeline_training_data"].oracle = " ".join(_pipeline_oracle().split())


@register(
    "stream_stateful_user_counter",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(max(event_id) AS BIGINT) AS last_event_id
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
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
    from quick_stream_spark.sources.readers import write_split_as_files

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-state-")
    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
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
    # each shuffle partition owns a state store + an Arrow worker per
    # micro-batch: size the width by input rows, not the static conf
    with scoped_shuffle(spark, rows_sized_parts(ev.count(), 100_000)):
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


def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-user running counter as stream_stateful_user_counter
    but through ``transformWithStateInPandas`` — Spark 4's
    arbitrary-state API (typed value/list/map state handles, timers,
    TTL) that succeeds applyInPandasWithState.  State is a typed
    ValueState; the final emitted state after the availableNow drain
    equals the batch aggregate (the oracle in
    tests/test_transform_with_state.py).

    NOT registered in the query corpus: the API's state protocol needs
    ``google.protobuf``, which this environment does not ship (and
    installs are off-limits), so the implementation is gated behind an
    import check in its test and verified wherever protobuf exists.
    ``stream_stateful_user_counter`` (applyInPandasWithState) holds the
    exported slot for the custom-stateful-streaming contract."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    pin_session(spark)
    from quick_stream_spark.sources.readers import write_split_as_files

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-tws-")
    write_split_as_files(ev, F.col("event_id") % 3, 3, work + "/in")
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

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counter", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, last_id = self._state.get() if self._state.exists() else (0, -1)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    last_id = max(last_id, int(pdf["event_id"].max()))
            self._state.update((n, last_id))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "last_event_id": [last_id]}
            )

        def close(self) -> None:
            pass

    counted = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Counter(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
    name = f"tws_counter_{abs(hash(work)) % 10**8}"
    # transformWithState requires the RocksDB state store provider —
    # the scale-grade store (incremental checkpoints, off-heap state);
    # scope it to this query and restore the session default after
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            counted.writeStream.queryName(name)
            .format("memory")
            .outputMode("update")
            .option("checkpointLocation", work + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(provider_key, prev)
    snap = spark.table(name)
    return snap.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("last_event_id").alias("last_event_id"),
    )


@register(
    "stream_drop_duplicates_watermark",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_drop_duplicates_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on the event key: keeps the first
    arrival per event_id within the watermark horizon — the built-in
    streaming dedup (state auto-expires with the watermark, unlike plain
    dropDuplicates whose state grows forever).  'First seen' is an
    arrival-order race across partitions, but the input doubles each
    event with an IDENTICAL copy, so whichever copy wins, the kept
    content is exactly the distinct event set — which is the oracle."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="qss-ddw-")
    # duplicate every event so the dedup has work to do
    doubled = ev.unionByName(ev)
    write_batches_as_files([doubled], work + "/in")
    stream = stream_parquet_dir(spark, work + "/in", ev.schema)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    name = f"ddw_{abs(hash(work)) % 10**8}"
    with scoped_shuffle(spark, rows_sized_parts(ev.count() * 2, 100_000)):
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


@register(
    "events_cohort_retention",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
    tags=("analytics", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the classic product-analytics matrix: users
    bucketed by first-seen week (cohort), counted in every later week
    they were active, keyed by week offset.  Two aggregations and one
    equi-join on user_id, all shuffles on high-cardinality keys; the
    distinct-activity pre-aggregation keeps the join input at one row
    per (user, week) regardless of event volume — the 100 TB shape."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    week = F.date_trunc("week", F.col("ts"))
    firsts = ev.select("user_id", week.alias("w")).groupBy("user_id").agg(
        F.min("w").alias("cohort_week")
    )
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM stages
    """,
    tags=("analytics", "funnel"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): per user,
    the earliest time of each stage; a user converts a step only if the
    later stage's first occurrence follows the earlier stage's.  One
    conditional-min aggregation per user then a global rollup — the
    whole funnel costs a single shuffle on user_id at any scale.
    NULL-comparison semantics (a missing stage never converts) are
    identical in both engines: NULL > x is NULL, CASE treats it as
    false."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    converted_click = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(converted_click, 1).otherwise(0)).alias("n_view_click"),
        F.sum(
            F.when(converted_click & (F.col("t_purchase") > F.col("t_click")), 1)
            .otherwise(0)
        ).alias("n_full_funnel"),
    )


@register(
    "events_resample_hourly_ffill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                  FROM bounds) s
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT spine.event_type, spine.h AS hour,
           coalesce(hourly.n_events, 0) AS n_events,
           coalesce(hourly.sum_value,
                    last_value(hourly.sum_value IGNORE NULLS) OVER (
                      PARTITION BY spine.event_type ORDER BY spine.h
                      ROWS UNBOUNDED PRECEDING), 0.0) AS sum_value_ffill
    FROM spine LEFT JOIN hourly
      ON spine.event_type = hourly.event_type AND spine.h = hourly.h
    """,
    tags=("analytics", "timeseries"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: events aggregate to an
    hourly grid per event_type; hours with no events appear with
    n_events=0 and the last observed hourly sum carried forward
    (last_value IGNORE NULLS — the standard gauge-style forward fill).

    Scale design: the dense spine is (series x hours) — bounded by the
    time range, never by event volume; the hourly aggregation is one
    shuffle on (type, hour); the fill window partitions by series, the
    natural time-series layout (billions of events collapse to the
    grid before any window runs)."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    joined = spine.join(
        hourly,
        ["event_type", "hour"],
        "left",
    )
    return joined.select(
        "event_type",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(
            F.col("sum_value"),
            F.last("sum_value", ignorenulls=True).over(
                Window.partitionBy("event_type")
                .orderBy("hour")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(0.0),
        ).alias("sum_value_ffill"),
    )


@register(
    "events_rolling_anomaly",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                  FROM bounds) s
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT spine.event_type, spine.h, coalesce(hourly.n, 0) AS n
      FROM spine LEFT JOIN hourly
        ON spine.event_type = hourly.event_type AND spine.h = hourly.h
    ),
    rolled AS (
      SELECT event_type, h, n,
             CAST(COUNT(*) OVER w AS BIGINT) AS w_cnt,
             CAST(SUM(n) OVER w AS BIGINT) AS w_sum,
             CAST(SUM(n * n) OVER w AS BIGINT) AS w_ss
      FROM grid
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS hour, n,
           ROUND((n - CAST(w_sum AS DOUBLE) / w_cnt)
                 / sqrt((CAST(w_ss AS DOUBLE)
                         - CAST(w_sum AS DOUBLE) * w_sum / w_cnt)
                        / (w_cnt - 1)), 6) AS zscore
    FROM rolled
    WHERE w_cnt >= 12
      AND (CAST(w_ss AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_cnt)
          / (w_cnt - 1) > 0
    """,
    tags=("analytics", "timeseries", "anomaly"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: each hour's event count against the
    trailing 24 hours' mean and sample variance (the window excludes
    the current hour, so an anomalous spike cannot mask itself).
    Hours with under 12 trailing observations or zero variance are
    withheld.

    Determinism: counts are integers, so the rolling sums are exact;
    mean and variance are single IEEE expressions over identical
    operands, and the z-score is rounded — no engine can disagree.
    Scale: events collapse to the dense (series x hour) grid before
    the window, and the window partitions by series — the standard
    streaming-metrics layout."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = ev.groupBy("event_type", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    grid = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce(F.col("n_raw"), F.lit(0)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    rolled = grid.select(
        "event_type",
        "hour",
        "n",
        F.count(F.lit(1)).over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("w_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("w_ss"),
    )
    mean = F.col("w_sum").cast("double") / F.col("w_cnt")
    var = (
        F.col("w_ss").cast("double")
        - F.col("w_sum").cast("double") * F.col("w_sum") / F.col("w_cnt")
    ) / (F.col("w_cnt") - 1)
    return (
        rolled.filter((F.col("w_cnt") >= 12) & (var > 0))
        .select(
            "event_type",
            "hour",
            "n",
            F.round((F.col("n") - mean) / F.sqrt(var), 6).alias("zscore"),
        )
    )


_MIX_FULL_HASH = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             (1 + CAST(substr(source, 4) AS INT) % 4) / 4.0 AS rate
      FROM documents
    )
    SELECT doc_id, source, rate,
           row_number() OVER (PARTITION BY source
                              ORDER BY {_MIX_FULL_HASH}, doc_id)
             <= CEIL(rate * COUNT(*) OVER (PARTITION BY source))
             AS in_mixture
    FROM rated
    """,
    tags=("sampling", "pipeline", "mixture"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixing — the training-mix step that samples each
    source at its own target rate (here a deterministic function of the
    source id standing in for a mixture config: rates 0.25/0.5/0.75/1).
    Exact sizes per source: rank by content hash within the source and
    keep the first ceil(rate x count) — reproducible across runs,
    engines and cluster sizes, and documents never migrate in or out
    when OTHER sources grow.  One rank shuffle partitioned by source;
    per-reducer load is bounded by the largest source (same posture as
    the stratified language sample)."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    rate = (1 + F.substring("source", 4, 10).cast("int") % 4) / F.lit(4.0)
    full_h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("source").orderBy(full_h.asc(), F.col("doc_id").asc())
    stratum = Window.partitionBy("source")
    return d.select(
        "doc_id",
        "source",
        rate.alias("rate"),
        (
            F.row_number().over(w)
            <= F.ceil(rate * F.count(F.lit(1)).over(stratum))
        ).alias("in_mixture"),
    )


_MIX_HASH_SQL = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)"
_MIX_RATE_SQL = (
    "CAST(1 + (CAST(substr(source, 4, 10) AS INT) % 4) * 0.5 AS DOUBLE)"
)


@register(
    "sample_mixture_upsample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, {_MIX_RATE_SQL} AS rate,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_MIX_HASH_SQL}, doc_id) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    rep AS (
      SELECT doc_id, source, rate,
             CAST(floor(rate) + CASE WHEN rk <= ceil((rate - floor(rate)) * n)
                                     THEN 1 ELSE 0 END AS INT) AS repeats
      FROM ranked
    )
    SELECT doc_id, source, rate, repeats, CAST(u.c AS INT) AS copy
    FROM rep, UNNEST(range(repeats)) AS u(c)
    """,
    tags=("sampling", "pipeline", "mixture"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def sample_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture UPSAMPLING materializer — the other half of the training
    mix: ``sample_domain_mixture`` downsamples over-represented sources
    (rate <= 1, keep flag), this repeats under-represented ones (rate >
    1, e.g. a curated source run for 2.5 epochs) by materializing one
    row per (doc, epoch copy).  Exact per-source totals: every doc gets
    floor(rate) copies, and the fractional remainder goes to the first
    ceil(frac x n) docs by content-hash rank within the source — so the
    output size is exactly floor(rate)*n + ceil(frac*n) per source,
    reproducible across runs/engines/cluster sizes, and a doc's repeat
    count never changes when OTHER sources grow.  Rates here derive
    from the source id (1.0/1.5/2.0/2.5) standing in for a mixture
    config; fractional parts are exact binary halves, so floor/ceil are
    engine-stable.

    Scale design: ONE rank shuffle partitioned by source (per-reducer
    load bounded by the largest source), then a row-local
    explode(sequence(...)) — the repeat materialization never
    shuffles.  At 100 TB you'd keep (doc_id, repeats) as the artifact
    and explode lazily at read time; both shapes are this plan."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    rate = 1 + (F.substring("source", 4, 10).cast("int") % 4) * F.lit(0.5)
    full_h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("source").orderBy(full_h.asc(), F.col("doc_id").asc())
    stratum = Window.partitionBy("source")
    ranked = d.select(
        "doc_id",
        "source",
        rate.alias("rate"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(stratum).alias("n"),
    )
    repeats = (
        F.floor("rate")
        + F.when(
            F.col("rk") <= F.ceil((F.col("rate") - F.floor("rate")) * F.col("n")), 1
        ).otherwise(0)
    ).cast("int")
    return ranked.select(
        "doc_id",
        "source",
        "rate",
        repeats.alias("repeats"),
        F.explode(F.sequence(F.lit(0), repeats - 1)).alias("copy"),
    )


# --------------------------------------------- quality-stratified sampling

# keep-rates per quality tier: all of the best, half of the middle
# band, a thin slice of the worst — the quality-weighted mixing step of
# corpus curation
_TIER_RATES = {"high": 100, "mid": 50, "low": 10}


@register(
    "sample_quality_stratified",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, {_tx.quality_score_sql('text')} AS quality_score
      FROM documents
    ),
    cuts AS (
      SELECT quantile_cont(quality_score, 0.25) AS q25,
             quantile_cont(quality_score, 0.75) AS q75
      FROM scored
    ),
    tiered AS (
      SELECT s.doc_id, s.quality_score,
             CASE WHEN s.quality_score >= c.q75 THEN 'high'
                  WHEN s.quality_score >= c.q25 THEN 'mid'
                  ELSE 'low' END AS tier
      FROM scored s, cuts c
    )
    SELECT doc_id, quality_score, tier,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
             < CASE tier WHEN 'high' THEN {_TIER_RATES['high']}
                         WHEN 'mid' THEN {_TIER_RATES['mid']}
                         ELSE {_TIER_RATES['low']} END AS kept
    FROM tiered
    """,
    tags=("sampling", "quality", "curation"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def sample_quality_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified corpus curation: documents tier into
    high/mid/low by exact quality-score quartiles and each tier keeps a
    different deterministic hash-sample rate ({_TIER_RATES}) — the
    quality-weighted mixing step every LLM corpus build runs after
    scoring.

    Scale design: the tier boundaries are TWO SCALARS computed by a
    percentile aggregate (at 100 TB: approx_percentile — the swap is
    one line and changes only the cut values, not the shape), NOT a
    global rank window over the data; tiering and the content-hash keep
    flag are then map-only, so membership is reproducible under
    resharding and corpus growth, and a document's fate never depends
    on which executor saw it.  One aggregate pass + one map pass."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", _tx.quality_score(F.col("text")).alias("quality_score")
    )
    cuts = scored.agg(
        F.percentile("quality_score", F.lit(0.25)).alias("q25"),
        F.percentile("quality_score", F.lit(0.75)).alias("q75"),
    )
    tier = (
        F.when(F.col("quality_score") >= F.col("q75"), "high")
        .when(F.col("quality_score") >= F.col("q25"), "mid")
        .otherwise("low")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long") % 100
    rate = (
        F.when(F.col("tier") == "high", _TIER_RATES["high"])
        .when(F.col("tier") == "mid", _TIER_RATES["mid"])
        .otherwise(_TIER_RATES["low"])
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("doc_id", "quality_score", tier.alias("tier"))
        .select("doc_id", "quality_score", "tier", (h < rate).alias("kept"))
    )


# ---------------------------------------------- DSIR importance resampling

DSIR_B = 1024  # hashed feature buckets (the model is B-bounded by design)

_DSIR_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)
_DSIR_BUCKETS = (
    f"list_transform({_DSIR_TOKS}, "
    f"t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 1000000007 % {DSIR_B})"
)


@register(
    "sample_importance_dsir",
    oracle=f"""
    WITH db AS (
      SELECT doc_id, lang, unnest({_DSIR_BUCKETS}) AS b FROM documents
    ),
    doc_counts AS (
      SELECT doc_id, lang, b, count(*) AS c FROM db GROUP BY doc_id, lang, b
    ),
    raw AS (SELECT b, SUM(c) AS nr FROM doc_counts GROUP BY b),
    tgt AS (SELECT b, SUM(c) AS nt FROM doc_counts WHERE lang = 'en' GROUP BY b),
    tot AS (
      SELECT SUM(c) AS tr, SUM(c) FILTER (WHERE lang = 'en') AS tt
      FROM doc_counts
    ),
    llr AS (
      SELECT raw.b,
             CAST(round(ln((((coalesce(tgt.nt, 0) + 0.5) / (tot.tt + {0.5 * DSIR_B}))
                            * (tot.tr + {0.5 * DSIR_B})) / (raw.nr + 0.5)) * 1000000)
                  AS BIGINT) AS w
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot
    ),
    scores AS (
      SELECT dc.doc_id, CAST(SUM(dc.c * llr.w) AS BIGINT) AS score_micro
      FROM doc_counts dc JOIN llr ON dc.b = llr.b GROUP BY dc.doc_id
    ),
    scored AS (
      SELECT d.doc_id, d.lang, coalesce(s.score_micro, 0) AS score_micro
      FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id
    ),
    thr AS (SELECT quantile_cont(CAST(score_micro AS DOUBLE), 0.75) AS t FROM scored)
    SELECT doc_id, lang, score_micro,
           CAST(score_micro AS DOUBLE) >= thr.t AS selected
    FROM scored, thr
    """,
    tags=("sampling", "pipeline", "dsir", "ml"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    rank raw documents by how much their hashed n-gram profile looks
    like a target distribution, then keep the top slice — the
    importance-resampling step LLM corpus builds use to tilt a web
    crawl toward a curated target.  Here the target is the ``lang='en'``
    subset of ``documents`` (train-on-subset, score-everything); the
    feature space is whitespace tokens hashed into {DSIR_B} buckets
    (one md5 per token, the minhash hash family).

    Per-bucket importance is the add-half-smoothed log-likelihood ratio
    ln(p_target(b) / p_raw(b)) scaled to an INTEGER (micro-nats), so a
    document's score — sum(count_b * llr_b) — is an exact, order-
    independent integer aggregation; the one transcendental runs once
    per BUCKET ({DSIR_B} values), never per token.  Selection keeps
    score >= the exact 75th percentile, a ONE-SCALAR threshold
    broadcast into a map-only flag (swap percentile for
    approx_percentile at 100 TB — shape unchanged); deterministic
    rate-threshold selection stands in for the paper's Gumbel top-k
    (add a content-hash Gumbel term to taste — the ranking machinery is
    identical).

    Scale design: ONE shuffle of the token stream (to per-doc bucket
    counts, map-side combinable); the two LMs and their ratio table
    derive from those counts and are {DSIR_B}-row bounded artifacts
    broadcast into the scoring join; everything after is map-only."""
    from quick_stream_spark.functions import minhash as _mh

    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    buckets = F.transform(
        _mh.token_hash_array(F.col("text")), lambda h: h % DSIR_B
    )
    # one shuffle: token stream -> per-(doc, bucket) counts; materialized
    # once, every model aggregate below derives from this far smaller frame
    doc_counts = (
        d.select("doc_id", "lang", F.explode(buckets).alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    raw = doc_counts.groupBy("b").agg(F.sum("c").alias("nr"))
    tgt = (
        doc_counts.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("c").alias("nt"))
    )
    tot = doc_counts.agg(
        F.sum("c").alias("tr"),
        F.sum(F.when(F.col("lang") == "en", F.col("c"))).alias("tt"),
    )
    half_b = F.lit(0.5 * DSIR_B)
    ratio = (
        ((F.coalesce(F.col("nt"), F.lit(0)) + 0.5) / (F.col("tt") + half_b))
        * (F.col("tr") + half_b)
    ) / (F.col("nr") + 0.5)
    llr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select("b", F.round(F.log(ratio) * 1_000_000).cast("long").alias("w"))
    )
    scores = (
        doc_counts.join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("w")).alias("score_micro"))
    )
    scored = (
        d.select("doc_id", "lang")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("score_micro"), F.lit(0).cast("long")).alias("score_micro"),
        )
    )
    thr = scored.agg(F.percentile("score_micro", F.lit(0.75)).alias("t"))
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "lang",
        "score_micro",
        (F.col("score_micro").cast("double") >= F.col("t")).alias("selected"),
    )


# pipeline_curation_report composes oracles from BOTH text.py and this
# module, so its oracle is assembled here (after all members registered)
from quick_stream_spark.plans.registry import REGISTRY as _SO_REG  # noqa: E402
from quick_stream_spark.plans.text import _curation_report_oracle  # noqa: E402

_SO_REG["pipeline_curation_report"].oracle = " ".join(
    _curation_report_oracle().split()
)


# -------------------------------------------------- distribution drift (PSI)

PSI_BINS = 16
_PSI_SPLIT_H = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100)"


@register(
    "monitor_split_drift_psi",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CASE WHEN {_PSI_SPLIT_H} < 90 THEN 'train' ELSE 'holdout' END AS grp,
             least(CAST(floor({_tx.quality_score_sql('text')} * {PSI_BINS}) AS INT),
                   {PSI_BINS - 1}) AS bin
      FROM documents
    ),
    counts AS (
      SELECT grp, bin, CAST(count(*) AS BIGINT) AS c
      FROM scored GROUP BY grp, bin
    ),
    tot AS (SELECT grp, SUM(c) AS t FROM counts GROUP BY grp),
    bins AS (SELECT unnest(range(0, {PSI_BINS})) AS bin),
    p AS (
      SELECT b.bin,
             (coalesce(tr.c, 0) + 0.5) / (tt.t + {0.5 * PSI_BINS}) AS p_train,
             (coalesce(ho.c, 0) + 0.5) / (ht.t + {0.5 * PSI_BINS}) AS p_hold
      FROM bins b
      LEFT JOIN (SELECT * FROM counts WHERE grp = 'train') tr ON tr.bin = b.bin
      LEFT JOIN (SELECT * FROM counts WHERE grp = 'holdout') ho ON ho.bin = b.bin,
      (SELECT t FROM tot WHERE grp = 'train') tt,
      (SELECT t FROM tot WHERE grp = 'holdout') ht
    ),
    terms AS (
      SELECT bin,
             CAST(round((p_train - p_hold) * ln(p_train / p_hold) * 1000000000)
                  AS BIGINT) AS term_nano
      FROM p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bins,
           CAST(SUM(term_nano) AS BIGINT) AS psi_nano,
           round(CAST(SUM(term_nano) AS DOUBLE) / 1000000000, 6) AS psi
    FROM terms
    """,
    tags=("monitoring", "drift", "sampling"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def monitor_split_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check between the train split
    and its holdout — the standing monitor production ML pipelines run
    on every refresh (PSI < 0.1 = stable; > 0.25 = investigate): the
    quality-score distribution bins into {PSI_BINS} buckets per split
    and PSI = sum (p_i - q_i) ln(p_i / q_i) with add-half smoothing
    (empty bins cannot blow up the log).  For a content-hash split the
    two distributions are exchangeable draws, so true drift is zero and
    the measured PSI is pure small-sample noise — E[PSI] ~ bins/n_hold,
    measured 0.23 at sf0.01's ~50-doc holdout and shrinking as n grows
    — which is exactly why production monitors threshold PSI rather
    than compare it to zero.  The oracle pins the exact value, not
    just the conclusion.

    Determinism: one transcendental per BIN ({PSI_BINS} of them, never
    per row), each term scaled to an integer nano-unit so the final
    sum is order-independent.  Plan: one map-combinable (split, bin)
    count, a {PSI_BINS}-row dense spine, map-only term math."""
    pin_session(spark)
    d = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    scored = d.select(
        F.when(h < 90, "train").otherwise("holdout").alias("grp"),
        F.least(
            F.floor(_tx.quality_score(F.col("text")) * PSI_BINS).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    counts = scored.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("grp").agg(F.sum("c").alias("t"))
    bins = spark.range(PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    tr = counts.filter(F.col("grp") == "train").select("bin", F.col("c").alias("c_tr"))
    ho = counts.filter(F.col("grp") == "holdout").select("bin", F.col("c").alias("c_ho"))
    tt = tot.filter(F.col("grp") == "train").select(F.col("t").alias("t_tr"))
    ht = tot.filter(F.col("grp") == "holdout").select(F.col("t").alias("t_ho"))
    half = F.lit(0.5 * PSI_BINS)
    p = (
        bins.join(F.broadcast(tr), "bin", "left")
        .join(F.broadcast(ho), "bin", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(ht))
        .select(
            "bin",
            ((F.coalesce(F.col("c_tr"), F.lit(0)) + 0.5) / (F.col("t_tr") + half)).alias(
                "p_train"
            ),
            ((F.coalesce(F.col("c_ho"), F.lit(0)) + 0.5) / (F.col("t_ho") + half)).alias(
                "p_hold"
            ),
        )
    )
    terms = p.select(
        F.round(
            (F.col("p_train") - F.col("p_hold"))
            * F.log(F.col("p_train") / F.col("p_hold"))
            * 1_000_000_000
        )
        .cast("long")
        .alias("term_nano")
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("term_nano").alias("psi_nano"),
        F.round(F.sum("term_nano").cast("double") / 1_000_000_000, 6).alias("psi"),
    )


SESSION_GAP_MIN = 30


@register(
    "events_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
      FROM ordered
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_seq
    """,
    tags=("analytics", "sessionization"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — the canonical event-analytics
    operator: a user's events split into sessions wherever the gap to
    the previous event exceeds {SESSION_GAP_MIN} minutes, then one row
    per session with event count, duration and exact decimal value sum.
    ONE shuffle on user_id serves both window passes (lag + cumulative
    session counter share the same partitioning, so Catalyst plans a
    single Exchange) and the session aggregation arrives pre-partitioned.
    Deterministic same-ts order via the event_id tie-break.  The batch
    twin of Structured Streaming's ``session_window`` (which handles
    the unbounded case with watermark-evicted state)."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(
        gap_s.isNull() | (gap_s > SESSION_GAP_MIN * 60), 1
    ).otherwise(0)
    sess = ev.select(
        "user_id", "ts", "event_id", "value", new_session.alias("new_session")
    ).withColumn("session_seq", F.sum("new_session").over(w))
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
            .alias("duration_s"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            "duration_s",
            "sum_value",
        )
    )


EWMA_LAGS = 16  # truncated horizon; weight of lag k is 2^(15-k)


@register(
    "events_ewma_smooth",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             {", ".join(
                 f"lag(CAST(round(value * 100) AS BIGINT), {k}) OVER w AS l{k}"
                 for k in range(EWMA_LAGS)
             )}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    acc AS (
      SELECT user_id, event_id, ts,
             {" + ".join(
                 f"coalesce(l{k} * {1 << (EWMA_LAGS - 1 - k)}, 0)"
                 for k in range(EWMA_LAGS)
             )} AS num,
             {" + ".join(
                 f"CASE WHEN l{k} IS NOT NULL THEN {1 << (EWMA_LAGS - 1 - k)} ELSE 0 END"
                 for k in range(EWMA_LAGS)
             )} AS den
      FROM lagged
    )
    SELECT user_id, event_id, ts,
           CASE WHEN den > 0 THEN CAST(num * 10000 // den AS BIGINT) END
             AS smoothed_microcents
    FROM acc
    """,
    tags=("analytics", "timeseries", "smoothing"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted smoothing per series — the classic
    monitoring/forecasting primitive — in an EXACTLY replayable form:
    a {EWMA_LAGS}-lag truncated EWMA with alpha=1/2, so every weight
    is a power of two and the weighted sum over integer cents stays
    in exact int64 arithmetic (the recursive float EWMA is
    order-sensitive in its rounding and could never hash-match across
    engines; truncation at 16 lags discards weight < 2^-16 — below
    cent resolution anyway).  Early rows renormalize over the lags
    that exist (den sums the present weights).  ONE window pass
    computes all 16 lags on a single user_id shuffle; the weighted
    fold is row-local integer math, and the final ratio is integer
    floor division — bit-identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    pin_session(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    lags = [F.lag(cents, k).over(w) for k in range(EWMA_LAGS)]
    num = None
    den = None
    for k, lk in enumerate(lags):
        wt = 1 << (EWMA_LAGS - 1 - k)
        term = F.coalesce(lk * wt, F.lit(0).cast("long"))
        dterm = F.when(lk.isNotNull(), F.lit(wt).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    # a row whose lags are ALL NULL (nullable value column) has den=0:
    # emit NULL like the oracle's // does, instead of an ANSI
    # divide-by-zero killing the query
    safe_den = F.greatest(den, F.lit(1).cast("long"))
    smoothed = F.when(
        den > 0, ((num * 10_000) - F.pmod(num * 10_000, safe_den)) / safe_den
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        smoothed.cast("long").alias("smoothed_microcents"),
    )
