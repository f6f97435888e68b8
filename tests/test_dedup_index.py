"""StreamingNearDupIndex unit behavior (streaming/dedup_index.py):
pair discovery within and across batches, and redelivery idempotency
(the checkpoint replays an interrupted batch; emissions collapse on
read because every discovery carries identical values)."""

import os

from pyspark.sql import functions as F

from quick_stream_spark.streaming.dedup_index import StreamingNearDupIndex

DOC = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long song about distributed systems and late data"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a long song about distributed systems and late arrivals"
)
OTHER = "completely different content with no overlap whatsoever at all here"


def docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_pairs_within_and_across_batches(spark, tmp_path):
    ndi = StreamingNearDupIndex(spark, str(tmp_path / "state"))
    apply = ndi._foreach_batch()
    apply(docs(spark, [(1, DOC), (2, NEAR), (3, OTHER)]), 0)  # within-batch pair
    apply(docs(spark, [(4, DOC)]), 1)  # across: 4 pairs with 1 and 2
    got = {(r.id_a, r.id_b) for r in ndi.pairs().collect()}
    assert (1, 2) in got
    assert (1, 4) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_redelivered_batch_changes_nothing(spark, tmp_path):
    ndi = StreamingNearDupIndex(spark, str(tmp_path / "state"))
    apply = ndi._foreach_batch()
    apply(docs(spark, [(1, DOC), (2, NEAR)]), 0)
    before = sorted(map(tuple, ndi.pairs().collect()))
    # crash-replay: the same delivery applies again (new epoch id)
    apply(docs(spark, [(1, DOC), (2, NEAR)]), 1)
    after = sorted(map(tuple, ndi.pairs().collect()))
    assert after == before


def test_band_reservoir_bounds_hot_bands(spark, tmp_path):
    """With max_band_entries set, a viral duplicate cluster stops
    growing the index: later copies still query (and pair with) the
    reservoir but are not indexed themselves."""
    ndi = StreamingNearDupIndex(
        spark, str(tmp_path / "state"), max_band_entries=2
    )
    apply = ndi._foreach_batch()
    apply(docs(spark, [(1, DOC), (2, DOC)]), 0)  # reservoir fills to 2
    apply(docs(spark, [(3, DOC)]), 1)  # hot band full -> 3 not indexed
    apply(docs(spark, [(4, DOC)]), 2)
    got = {(r.id_a, r.id_b) for r in ndi.pairs().collect()}
    # every later copy pairs with the reservoir members...
    assert {(1, 3), (2, 3), (1, 4), (2, 4)} <= got
    # ...but (3, 4) is lost: 3 overflowed, so 4 never meets it
    assert (3, 4) not in got
    idx = spark.read.parquet(ndi.index_path)
    per_band = idx.groupBy("band").count().agg(F.max("count")).collect()[0][0]
    assert per_band <= 2
