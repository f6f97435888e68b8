"""StreamingNearDupIndex unit behavior (streaming/dedup_index.py):
pair discovery within and across batches, and redelivery idempotency
(the checkpoint replays an interrupted batch; emissions collapse on
read because every discovery carries identical values)."""

import os

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
