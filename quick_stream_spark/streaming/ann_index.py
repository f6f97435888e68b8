"""Incremental ANN indexing over an embedding stream: the streaming
twin of the banded sign-LSH retrieval in plans/similarity.py.

Each micro-batch of vectors is signed and banded ROW-LOCALLY (default:
the 24-plane / 6x4-bit confusable-pair geometry; the retrieval
use-case passes the batch retrieval geometry — 192 planes, 48 bands,
collision-count threshold — plus ``emit_pairs=False``), then

1. **queries** the accumulated band index for near-duplicate vectors —
   an equi-join on (band, bits), so a new vector only meets candidates
   sharing a band, never the corpus;
2. emits the **verified** (exact cosine >= threshold) near-dup pairs
   among (new x indexed) and (new x new) candidates to an append-only
   pairs log;
3. **appends** its own (vector, band) entries to the index.

Pair emission is delivery-chunking independent (a pair sharing a band
is found exactly when its later member arrives, or within one batch),
so the drained pair set equals the batch banded-LSH near-dup pairs
over the full corpus — the oracle contract.  The accumulated index
also serves RETRIEVAL: :meth:`topk` answers banded-LSH top-k against
everything indexed so far — equal to the batch ``emb_lsh_ann_topk``
over the delivered corpus when built with the retrieval geometry.

Scale posture: the index holds (band, bits, vec_id, v) — ``ANN_BANDS``
rows per vector — as partitioned append-only parquet; each batch join
shuffles only the batch's band keys against the index.  Hot buckets
(a viral duplicated vector) are bounded the same way as the near-dup
text index: a per-band reservoir at ingest if needed (arrival-order
dependent, so off for the deterministic contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.functions import vectors as vec
from quick_stream_spark.streaming.stream import _StreamBase


class StreamingAnnIndex(_StreamBase):
    """foreachBatch pipeline maintaining a banded sign-LSH vector index
    plus an append-only verified near-dup pairs log."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "v",
        threshold: float = 0.99,
        planes: int | None = None,
        band_bits: int | None = None,
        min_bands: int = 1,
        emit_pairs: bool = True,
        config: QuickStreamConfig | None = None,
        auto_compact_every: int | None = None,
    ) -> None:
        """``min_bands``: collision-count threshold for :meth:`topk`
        candidates (1 = classic OR-amplification, the near-dup
        geometry; the retrieval tier passes LSH_ANN_MIN_BANDS to match
        the batch index's selectivity).  ``emit_pairs=False`` skips the
        per-batch near-dup pair emission entirely — the retrieval
        use-case maintains only the band index (a retrieval index at
        48 bands would otherwise verify a near-all-pairs candidate set
        per batch at the 0.99 threshold for nothing)."""
        from quick_stream_spark.plans.similarity import ANN_BAND_BITS, ANN_PLANES

        super().__init__(config)
        self.spark = spark
        self.index_path = os.path.join(work_dir, "vec_index")
        self.pairs_path = os.path.join(work_dir, "pairs")
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold
        self.planes = planes or ANN_PLANES
        self.band_bits = band_bits or ANN_BAND_BITS
        self.min_bands = min_bands
        self.emit_pairs = emit_pairs
        self.n_bands = self.planes // self.band_bits
        # maintenance cadence (same contract as the near-dup index):
        # replay-duplicate index rows and duplicate pair emissions are
        # pruned by the stream itself every N batches.  Unlike the HLL
        # counter, the index's first-order size is O(corpus x bands) by
        # design — compaction bounds the REDUNDANCY, not the index.
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
        fs2, p2, _ = _hadoop_fs(spark, self.pairs_path)
        self._pairs_exists = bool(fs2.exists(p2))

    # ------------------------------------------------------------ state

    def _banded(self, vecs: DataFrame) -> DataFrame:
        # Arrow-batched signature (bit-identical to the fold form —
        # see hyperplane_signature_fast); at the 192-plane retrieval
        # geometry the interpreted expression would dominate the batch
        sig = vec.hyperplane_signature_fast(F.col(self.vec_col), self.planes)
        return vecs.select(
            F.col(self.id_col).alias("id"),
            F.col(self.vec_col).alias("v"),
            sig.alias("sig"),
        ).select(
            "id",
            "v",
            F.posexplode(
                F.array(
                    *[
                        F.substring("sig", b * self.band_bits + 1, self.band_bits)
                        for b in range(self.n_bands)
                    ]
                )
            ).alias("band", "bits"),
        )

    def _read_index(self) -> DataFrame | None:
        if not self._index_exists:
            return None
        return self.spark.read.parquet(self.index_path)

    def pairs(self) -> DataFrame:
        """All verified near-dup pairs discovered so far (distinct —
        a pair found via several bands/batches carries identical
        values)."""
        if not self.emit_pairs:
            # retrieval-geometry indexes never seed the pairs directory;
            # reading it would raise an opaque path-not-found
            raise ValueError(
                "this index was built with emit_pairs=False (retrieval "
                "geometry) — no pairs log exists; use topk() instead"
            )
        if not self._pairs_exists:
            # emit_pairs=True but no batch has run yet: typed empty frame
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, cos_sim double"
            )
        return self.spark.read.parquet(self.pairs_path).distinct()

    # ------------------------------------------------------------ batch

    def _maybe_auto_compact(self) -> None:
        if self.auto_compact_every is None:
            return
        self._batches_since_compact += 1
        if self._batches_since_compact >= self.auto_compact_every:
            self._batches_since_compact = 0
            self.compact()

    def compact(self) -> None:
        """Prune replay-duplicate ``(band, id)`` index rows and rewrite
        the pairs log to its distinct form.  Crash-safe via
        append-then-prune
        (:func:`~quick_stream_spark.streaming.stream.replace_log_contents`)
        — a crash mid-compact leaves duplicates the read paths already
        collapse (``topk`` counts collisions at distinct band grain,
        ``pairs()`` reads distinct), never lost state."""
        from quick_stream_spark.operators.merge import _hadoop_fs
        from quick_stream_spark.streaming.stream import replace_log_contents

        self._fence.ensure("compact")
        if self._index_exists:
            idx = self._read_index().dropDuplicates(["band", "id"])
            replace_log_contents(self.spark, self.index_path, idx)
        if self.emit_pairs:
            fs, p, _ = _hadoop_fs(self.spark, self.pairs_path)
            if fs.exists(p):
                replace_log_contents(self.spark, self.pairs_path, self.pairs())

    def _foreach_batch(self):
        def apply(batch: DataFrame, batch_id: int) -> None:
            self._fence.ensure("append a micro-batch to")
            banded = self._banded(batch).persist()
            try:
                if not self.emit_pairs:
                    banded.write.mode("append").parquet(self.index_path)
                    self._index_exists = True
                    self._maybe_auto_compact()
                    return
                new_side = banded.select(
                    "band", "bits", F.col("id").alias("nid"), F.col("v").alias("nv")
                )
                cand = new_side.join(
                    banded.select(
                        "band", "bits", F.col("id").alias("oid"), F.col("v").alias("ov")
                    ),
                    ["band", "bits"],
                ).filter(F.col("oid") < F.col("nid"))
                idx = self._read_index()
                if idx is not None:
                    # oid != nid: a checkpoint-replayed batch meets its
                    # own index entries; a vector never pairs with itself
                    cross = new_side.join(
                        idx.select(
                            "band",
                            "bits",
                            F.col("id").alias("oid"),
                            F.col("v").alias("ov"),
                        ),
                        ["band", "bits"],
                    ).filter(F.col("oid") != F.col("nid"))
                    cand = cand.unionByName(cross)
                pairs = (
                    cand.select(
                        F.least("oid", "nid").alias("id_a"),
                        F.greatest("oid", "nid").alias("id_b"),
                        F.col("ov").alias("va"),
                        F.col("nv").alias("vb"),
                    )
                    .distinct()
                    .withColumn("cos_sim", vec.cosine(F.col("va"), F.col("vb")))
                    .filter(F.col("cos_sim") >= self.threshold)
                    .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
                )
                # a batch with zero verified pairs must not leave an
                # empty file behind (one-file-per-batch growth — same
                # guard as the DLQ's bad.isEmpty()); the pairs dir is
                # still created once, schema-only, so pairs() can read
                pairs = pairs.persist()
                try:
                    if not self._pairs_exists:
                        pairs.limit(0).write.mode("append").parquet(
                            self.pairs_path
                        )
                        self._pairs_exists = True
                    if not pairs.isEmpty():
                        pairs.write.mode("append").parquet(self.pairs_path)
                finally:
                    pairs.unpersist()
                banded.write.mode("append").parquet(self.index_path)
                self._index_exists = True
                self._maybe_auto_compact()
            finally:
                banded.unpersist()

        return apply

    # -------------------------------------------------------- retrieval

    def topk(self, query_ids_below: int, k: int) -> DataFrame:
        """Banded-LSH top-k retrieval against everything indexed so
        far, for the query vectors with id < ``query_ids_below``:
        candidates share at least ``min_bands`` bands (ids-only
        equi-join + per-pair count; vectors fetched only for
        survivors), exact cosine re-ranks.  With the retrieval
        geometry (LSH_ANN_PLANES / LSH_ANN_BAND_BITS /
        LSH_ANN_MIN_BANDS) this equals the batch ``emb_lsh_ann_topk``
        over the delivered corpus."""
        idx = self._read_index()
        if idx is None:
            raise ValueError("nothing indexed yet")
        qb = idx.filter(F.col("id") < query_ids_below).select(
            F.col("id").alias("query_id"), "band", "bits"
        )
        cb = idx.select(F.col("id").alias("neighbor_id"), "band", "bits")
        cand = (
            qb.join(cb, ["band", "bits"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            # defensive distinct at band grain: the count must see each
            # (pair, band) collision once even if an at-least-once
            # replay double-appended an index row
            .select("query_id", "neighbor_id", "band")
            .distinct()
            .groupBy("query_id", "neighbor_id")
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
            .filter(F.col("n_shared_bands") >= self.min_bands)
            .select("query_id", "neighbor_id")
        )
        vecs = idx.select("id", "v").distinct()
        q = F.broadcast(
            vecs.filter(F.col("id") < query_ids_below).select(
                F.col("id").alias("query_id"), F.col("v").alias("qv")
            )
        )
        c = vecs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("cv"))
        scored = (
            cand.join(c, "neighbor_id")
            .join(q, "query_id")
            .select(
                "query_id",
                "neighbor_id",
                vec.cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim")
            )
        )
