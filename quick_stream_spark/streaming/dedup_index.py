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
The batch path's viral-bucket cap has no deterministic online
equivalent (an arrival-order cap would make results depend on delivery
chunking), so this operator indexes uncapped and a production
deployment bounds hot bands with a per-band reservoir instead — see
the class docstring.
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
    known), an online cap would depend on arrival order, so this index
    is uncapped and deterministic.  At 100 TB bound hot bands with a
    per-band reservoir (index only the first R entries per band,
    querying still sees all R) and accept the recall trade the batch
    docstring describes.
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        id_col: str = "id",
        text_col: str = "text",
        jaccard_threshold: float = 0.35,
        max_band_entries: int | None = None,
        config: QuickStreamConfig | None = None,
    ) -> None:
        super().__init__(config)
        self.spark = spark
        self.index_path = os.path.join(work_dir, "band_index")
        self.pairs_path = os.path.join(work_dir, "pairs")
        self.id_col = id_col
        self.text_col = text_col
        self.jaccard_threshold = jaccard_threshold
        # per-band reservoir: bands already holding this many index
        # entries accept no more (arriving docs still QUERY the full
        # reservoir, so recall degrades only for pairs whose EARLIER
        # member overflowed).  Arrival-order dependent by nature —
        # leave None for the deterministic, delivery-chunking-
        # independent contract the oracle checks.
        self.max_band_entries = max_band_entries
        # a restarted process (streaming checkpoint resume) must see the
        # index its predecessor built — probe the filesystem once
        # instead of assuming a fresh instance means an empty index
        from quick_stream_spark.operators.merge import _hadoop_fs

        fs, p, _ = _hadoop_fs(spark, self.index_path)
        self._index_exists = bool(fs.exists(p))

    # ------------------------------------------------------------ state

    def _read_index(self) -> DataFrame | None:
        if not self._index_exists:
            return None
        return self.spark.read.parquet(self.index_path)

    def pairs(self) -> DataFrame:
        """All verified pairs discovered so far (distinct — a pair found
        via several bands/batches carries identical values)."""
        return self.spark.read.parquet(self.pairs_path).distinct()

    # ------------------------------------------------------------ batch

    def _banded(self, docs: DataFrame) -> DataFrame:
        sh = mh.hashed_shingles(mh.token_hash_array(F.col(self.text_col)))
        with_sh = docs.select(F.col(self.id_col).alias("id"), sh.alias("sh"))
        bands = mh.lsh_bands(mh.minhash_signature_from_bases(F.col("sh")))
        return with_sh.select("id", "sh", F.explode(bands).alias("band"))

    def _foreach_batch(self):
        def apply(batch: DataFrame, batch_id: int) -> None:
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
                if self.max_band_entries is not None and idx is not None:
                    # reservoir: drop entries for bands already at
                    # capacity (an anti-join against the full-band set —
                    # band counts, never documents, cross the shuffle)
                    full = (
                        idx.groupBy("band")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .filter(F.col("n") >= self.max_band_entries)
                        .select("band")
                    )
                    to_index = banded.join(full, "band", "left_anti")
                to_index.write.mode("append").parquet(self.index_path)
                self._index_exists = True
            finally:
                banded.unpersist()

        return apply

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
