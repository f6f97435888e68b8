"""Incremental near-duplicate detection over a document stream: the
streaming twin of the batch MinHash-LSH query (plans/text.py).

Each micro-batch of documents is shingled and banded ROW-LOCALLY (the
same md5-derived signatures as the batch path), then

1. **queries** the accumulated band index — an equi-join on the band
   key, so a new doc only meets near-identical prior docs, never the
   corpus;
2. emits the **verified** (exact-Jaccard) pairs among (new x indexed)
   and (new x new) candidates to an append-only pairs log;
3. **appends** its own band entries to the index.

Pair emission is batch-order independent: a pair sharing a band is
found exactly when its later member arrives (or within one batch), so
the final pair set equals the batch LSH pair set over the full corpus
regardless of how deliveries were chunked — which is what the oracle
states.  Duplicate discoveries (several shared bands, several batches)
collapse on read because every emission carries identical values.

Scale posture: the index holds (band, id, shingles) — one row per
(doc, band), the same order of storage as the corpus's shingle column —
partitioned append-only parquet; the per-batch join shuffles only the
batch's band keys against the index (band-key equi-join, AQE-sized).
The batch path's viral-bucket cap has no arrival-order-free EXACT
online equivalent, so the default indexes uncapped (the deterministic,
delivery-chunking-independent contract the oracle checks); at 100 TB
set ``max_band_entries`` for the seed-deterministic per-band reservoir
— bounded hot bands, recall traded only inside them — see the class
docstring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.functions import minhash as mh
from quick_stream_spark.streaming.stream import _StreamBase


class StreamingNearDupIndex(_StreamBase):
    """foreachBatch pipeline maintaining an LSH band index and an
    append-only verified-pairs log.

    Viral buckets: unlike the batch query (which drops band buckets over
    ``minhash.MAX_BUCKET_SIZE`` — deterministic because final sizes are
    known), an online cap must decide per arrival.  ``max_band_entries``
    bounds hot bands with a DETERMINISTIC-BY-SEED reservoir: each index
    entry carries ``rank = xxhash64(id, seed)``, and a band admits a new
    entry only while it holds fewer than R entries or the newcomer's
    rank beats the band's current R-th smallest.  The CONVERGED
    reservoir per band is therefore exactly {R smallest rank-hashes ever
    seen} — a uniform, seed-reproducible sample independent of arrival
    order — while the stored superset grows only O(R log(N/R)) under an
    N-fold viral band (each admission must beat the current top-R);
    :meth:`compact_reservoir` rewrites it down to exactly R.  Arriving
    docs always QUERY everything stored, so recall degrades only for
    pairs whose EARLIER member was refused by a full band — i.e. only
    inside viral bands, the trade the batch docstring describes.  Leave
    ``None`` for the uncapped, delivery-chunking-independent contract
    the oracle checks.
    """

    RESERVOIR_SEED = 0x5EED

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        id_col: str = "id",
        text_col: str = "text",
        jaccard_threshold: float = 0.35,
        max_band_entries: int | None = None,
        config: QuickStreamConfig | None = None,
        auto_compact_every: int | None = None,
    ) -> None:
        super().__init__(config)
        self.spark = spark
        self.index_path = os.path.join(work_dir, "band_index")
        self.pairs_path = os.path.join(work_dir, "pairs")
        self.id_col = id_col
        self.text_col = text_col
        self.jaccard_threshold = jaccard_threshold
        self.max_band_entries = max_band_entries
        # maintenance cadence (same contract as UpsertQuickStream's
        # auto_compact_every): run compact() inside foreachBatch after
        # every N committed batches — the reservoir's O(R log N/R)
        # admission superset and the pairs log's duplicate emissions are
        # then bounded by the stream itself instead of a manual pass.
        if auto_compact_every is not None and auto_compact_every < 1:
            raise ValueError("auto_compact_every must be >= 1")
        self.auto_compact_every = auto_compact_every
        self._batches_since_compact = 0
        # a restarted process (streaming checkpoint resume) must see the
        # index its predecessor built — probe the filesystem once
        # instead of assuming a fresh instance means an empty index
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, p, _ = _hadoop_fs(spark, self.index_path)
        self._index_exists = bool(fs.exists(p))
        # one-writer fencing (streaming/stream.py WriterFence): the
        # directory is claimed LAZILY at the first mutation
        # (fence.ensure), so a second writer over the same work_dir
        # takes over at ITS first write and this one fails loudly at
        # its next batch instead of corrupting — while a read-only
        # instance (query-only monitoring) never fences out the live
        # writer (ADVICE r8)
        from quick_stream_spark.streaming.stream import WriterFence

        self._fence = WriterFence(spark, work_dir)

    # ------------------------------------------------------------ state

    def _read_index(self) -> DataFrame | None:
        if not self._index_exists:
            return None
        return self.spark.read.parquet(self.index_path)

    def pairs(self) -> DataFrame:
        """All verified pairs discovered so far (distinct — a pair found
        via several bands/batches carries identical values)."""
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, p, _ = _hadoop_fs(self.spark, self.pairs_path)
        if not fs.exists(p):
            # no batch has run yet: typed empty frame, not an opaque
            # path-not-found (same guard as StreamingAnnIndex.pairs)
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, jaccard double"
            )
        return self.spark.read.parquet(self.pairs_path).distinct()

    # ------------------------------------------------------------ batch

    def _banded(self, docs: DataFrame) -> DataFrame:
        sh = mh.hashed_shingles(mh.token_hash_array(F.col(self.text_col)))
        with_sh = docs.select(F.col(self.id_col).alias("id"), sh.alias("sh"))
        bands = mh.lsh_bands(mh.minhash_signature_from_bases(F.col("sh")))
        return with_sh.select(
            "id",
            "sh",
            F.explode(bands).alias("band"),
            # reservoir rank: seed-deterministic, arrival-order free
            F.xxhash64(F.col("id"), F.lit(self.RESERVOIR_SEED)).alias("rank"),
        )

    def _foreach_batch(self):
        def apply(batch: DataFrame, batch_id: int) -> None:
            self._fence.ensure("append a micro-batch to")
            banded = self._banded(batch).persist()
            try:
                new_side = banded.select(
                    "band", F.col("id").alias("nid"), F.col("sh").alias("nsh")
                )
                # within-batch candidates
                cand = (
                    new_side.join(
                        banded.select(
                            "band", F.col("id").alias("oid"), F.col("sh").alias("osh")
                        ),
                        "band",
                    )
                    .filter(F.col("oid") < F.col("nid"))
                )
                # cross-batch candidates: new docs vs the accumulated index
                idx = self._read_index()
                if idx is not None:
                    # oid != nid: a redelivered batch (checkpoint replay
                    # after a crash) meets its own index entries; a doc
                    # never pairs with itself
                    cross = new_side.join(
                        idx.select(
                            "band", F.col("id").alias("oid"), F.col("sh").alias("osh")
                        ),
                        "band",
                    ).filter(F.col("oid") != F.col("nid"))
                    cand = cand.unionByName(cross)
                pairs = (
                    cand.select(
                        F.least("oid", "nid").alias("id_a"),
                        F.greatest("oid", "nid").alias("id_b"),
                        F.col("osh").alias("sh_a"),
                        F.col("nsh").alias("sh_b"),
                    )
                    .distinct()
                    .withColumn("jaccard", mh.jaccard(F.col("sh_a"), F.col("sh_b")))
                    .filter(F.col("jaccard") >= self.jaccard_threshold)
                    .select("id_a", "id_b", "jaccard")
                )
                pairs.write.mode("append").parquet(self.pairs_path)
                to_index = banded
                if self.max_band_entries is not None:
                    # deterministic-by-seed reservoir admission, two
                    # stages:
                    #
                    # 1. cross-batch: a band already holding >= R
                    #    entries admits a newcomer only if its rank
                    #    beats the band's current R-th smallest — this
                    #    cutoff computation shuffles only (band, rank,
                    #    id) scalars, never shingle arrays;
                    # 2. within-batch: keep at most the R smallest-rank
                    #    admitted rows per band from THIS batch (a
                    #    viral batch would otherwise flood an empty
                    #    band wholesale).  NOTE: this window
                    #    repartitions the batch's full to_index rows
                    #    (shingle arrays included) by band — one
                    #    batch-local shuffle, bounded by the micro-batch
                    #    size, not by the corpus.
                    #
                    # Convergence-safe: any element of the global
                    # top-R per band beats every interim cutoff (stage
                    # 1) and is within its own batch's top-R (global
                    # top-R ∩ batch ⊆ batch top-R), so the converged
                    # reservoir is exactly the R smallest rank-hashes
                    # ever seen — arrival-order independent.  Stored
                    # rows are bounded by R per band per batch before
                    # compact_reservoir()'s hard bound.
                    from pyspark.sql import Window

                    R = self.max_band_entries
                    if idx is not None:
                        w = Window.partitionBy("band").orderBy("rank", "id")
                        cutoff = (
                            idx.select("band", "rank", "id")
                            # at-least-once foreachBatch replay appends
                            # duplicate (band, id) rows to the index;
                            # counting them toward R would tighten the
                            # cutoff and displace distinct ids from the
                            # converged top-R (rank is a pure function
                            # of id, so duplicates are exact copies)
                            .dropDuplicates(["band", "id"])
                            .withColumn("__rn", F.row_number().over(w))
                            .filter(F.col("__rn") <= R)
                            .groupBy("band")
                            .agg(
                                F.max("rank").alias("__cut"),
                                F.count(F.lit(1)).alias("__n"),
                            )
                        )
                        to_index = (
                            to_index.join(cutoff, "band", "left")
                            .filter(
                                F.col("__cut").isNull()
                                | (F.col("__n") < R)
                                | (F.col("rank") < F.col("__cut"))
                            )
                            .drop("__cut", "__n")
                        )
                    wb = Window.partitionBy("band").orderBy("rank", "id")
                    to_index = (
                        to_index.withColumn("__bn", F.row_number().over(wb))
                        .filter(F.col("__bn") <= R)
                        .drop("__bn")
                    )
                to_index.write.mode("append").parquet(self.index_path)
                self._index_exists = True
                if self.auto_compact_every is not None:
                    self._batches_since_compact += 1
                    if self._batches_since_compact >= self.auto_compact_every:
                        self._batches_since_compact = 0
                        self.compact()
            finally:
                banded.unpersist()

        return apply

    def compact(self) -> None:
        """Full maintenance pass — runs automatically on the
        ``auto_compact_every`` cadence, or call it manually between
        micro-batches / with the stream stopped:

        1. band index: drop replay-duplicate ``(band, id)`` rows, and
           when capped keep only the ``max_band_entries`` smallest
           rank-hashes per band (the reservoir's hard bound);
        2. pairs log: rewrite to its distinct form (a pair found via
           several bands/batches appends identical rows every time —
           correctness is untouched because ``pairs()`` reads distinct,
           but a long-lived stream's pairs log would otherwise grow with
           discovery count, not pair count).

        Both rewrites are crash-safe via append-then-prune
        (:func:`~quick_stream_spark.streaming.stream.replace_log_contents`):
        a crash mid-compact leaves duplicate rows the read paths already
        collapse, never lost state."""
        from quick_stream_spark.streaming.stream import replace_log_contents

        self._fence.ensure("compact")
        if self._index_exists:
            idx = self._read_index().dropDuplicates(["band", "id"])
            if self.max_band_entries is not None:
                from pyspark.sql import Window

                w = Window.partitionBy("band").orderBy("rank", "id")
                idx = (
                    idx.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") <= self.max_band_entries)
                    .drop("__rn")
                )
            replace_log_contents(self.spark, self.index_path, idx)
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, p, _ = _hadoop_fs(self.spark, self.pairs_path)
        if fs.exists(p):
            replace_log_contents(self.spark, self.pairs_path, self.pairs())

    def compact_reservoir(self) -> None:
        """Rewrite the band index down to exactly ``max_band_entries``
        per band (the R smallest rank-hashes) — the maintenance pass
        that turns the O(R log N/R) admission superset into the hard
        bound.  No-op when uncapped.  Subsumed by :meth:`compact` (which
        also dedups the uncapped index and the pairs log); kept as the
        narrow reservoir-only entry point."""
        if self.max_band_entries is None or not self._index_exists:
            return
        from pyspark.sql import Window

        from quick_stream_spark.streaming.stream import replace_log_contents

        idx = self._read_index()
        w = Window.partitionBy("band").orderBy("rank", "id")
        kept = (
            # replayed batches append exact-duplicate (band, id) rows;
            # dedup first so duplicates can't consume reservoir slots
            # and shrink the distinct top-R below R
            idx.dropDuplicates(["band", "id"])
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.max_band_entries)
            .drop("__rn")
        )
        replace_log_contents(self.spark, self.index_path, kept)

    # ---------------------------------------------------------- clusters

    def clusters(self) -> DataFrame:
        """Duplicate-cluster labels over everything discovered so far:
        min-label connected components on the accumulated pairs log.
        The pairs log holds three scalars per near-dup — orders of
        magnitude smaller than the corpus — so refreshing the labels
        after a delivery recomputes over PAIRS, never documents: cost
        follows duplicate volume, not corpus size, which is why no
        incremental union-find state is needed to keep this cheap at
        scale."""
        from quick_stream_spark.functions.graph import min_label_components

        return min_label_components(self.spark, self.pairs())
