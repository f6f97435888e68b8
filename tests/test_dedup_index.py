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


def test_band_reservoir_bounds_hot_bands_under_viral_feed(spark, tmp_path):
    """The seed-deterministic reservoir (r3 verdict ask #8): a 1000x
    viral duplicate must not grow the index linearly — admissions are
    bounded O(R log N/R) and compact_reservoir() enforces the hard
    R-per-band bound — while pairs OUTSIDE the viral bands are
    unaffected, and the converged reservoir is independent of delivery
    order (it is exactly the R smallest xxhash64(id, seed) per band)."""
    import math

    R, N = 4, 1000
    viral = [(i, DOC) for i in range(N)]
    quiet = [(2000, NEAR + " zebra"), (2001, NEAR + " zebra!"), (3000, OTHER)]
    chunks = [
        docs(spark, viral[i : i + N // 5] + (quiet if i == 0 else []))
        for i in range(0, N, N // 5)
    ]

    ndi = StreamingNearDupIndex(spark, str(tmp_path / "s1"), max_band_entries=R)
    apply = ndi._foreach_batch()
    for b, chunk in enumerate(chunks):
        apply(chunk, b)

    idx = spark.read.parquet(ndi.index_path)
    hottest = idx.groupBy("band").count().agg(F.max("count")).collect()[0][0]
    bound = int(R * (1 + math.log(N / R)) * 3)  # generous slack on E[admissions]
    assert hottest <= bound, f"viral band stored {hottest} rows (bound {bound})"
    assert hottest < N / 5, "reservoir admission is not actually bounding"

    ndi.compact_reservoir()
    idx = spark.read.parquet(ndi.index_path)
    assert idx.groupBy("band").count().agg(F.max("count")).collect()[0][0] <= R

    got = {(r.id_a, r.id_b) for r in ndi.pairs().collect()}
    assert (2000, 2001) in got  # non-viral band pair unaffected
    assert not any(3000 in p for p in got)
    # viral copies pair with the reservoir members visible at arrival
    assert sum(1 for a, b in got if a < N and b < N) >= N - R

    # delivery-order independence of the CONVERGED reservoir
    ndi2 = StreamingNearDupIndex(spark, str(tmp_path / "s2"), max_band_entries=R)
    apply2 = ndi2._foreach_batch()
    for b, chunk in enumerate(reversed(chunks)):
        apply2(chunk, b)
    ndi2.compact_reservoir()
    res1 = {(r.band, r.id) for r in spark.read.parquet(ndi.index_path).collect()}
    res2 = {(r.band, r.id) for r in spark.read.parquet(ndi2.index_path).collect()}
    assert res1 == res2, "converged reservoir depends on delivery order"


def test_auto_compact_prunes_index_and_pairs_log(spark, tmp_path):
    """r6 verdict ask #1: the cadence knob must bound BOTH state logs
    with no manual call — after a feed containing a replayed delivery
    (at-least-once duplicates) ending on a cadence hit, the on-disk
    band index holds no duplicate (band, id) rows, the on-disk pairs
    log holds no duplicate rows, and the discovered pair set is exactly
    the batch contract."""
    ndi = StreamingNearDupIndex(
        spark, str(tmp_path / "state"), auto_compact_every=2
    )
    apply = ndi._foreach_batch()
    apply(docs(spark, [(1, DOC), (2, NEAR)]), 0)
    apply(docs(spark, [(3, DOC)]), 1)  # cadence hit
    apply(docs(spark, [(1, DOC), (2, NEAR)]), 2)  # checkpoint replay
    apply(docs(spark, [(4, NEAR), (5, OTHER)]), 3)  # cadence hit

    raw_idx = spark.read.parquet(ndi.index_path)
    assert raw_idx.count() == raw_idx.dropDuplicates(["band", "id"]).count()
    raw_pairs = spark.read.parquet(ndi.pairs_path)
    assert raw_pairs.count() == raw_pairs.distinct().count()

    got = {(r.id_a, r.id_b) for r in ndi.pairs().collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}


def test_auto_compact_with_reservoir_enforces_hard_bound(spark, tmp_path):
    """Capped + auto cadence: a viral feed ending on a cadence hit
    leaves every band at <= R stored entries with no manual
    compact_reservoir() call."""
    R = 4
    viral = [(i, DOC) for i in range(200)]
    ndi = StreamingNearDupIndex(
        spark,
        str(tmp_path / "state"),
        max_band_entries=R,
        auto_compact_every=2,
    )
    apply = ndi._foreach_batch()
    for b in range(4):
        apply(docs(spark, viral[b * 50 : (b + 1) * 50]), b)
    idx = spark.read.parquet(ndi.index_path)
    hottest = idx.groupBy("band").count().agg(F.max("count")).collect()[0][0]
    assert hottest <= R


def test_restarted_near_dup_index_sees_prior_entries(spark, tmp_table_dir):
    """A NEW StreamingNearDupIndex over an existing work_dir must see
    the band index its predecessor built: pairs spanning the restart
    boundary must still be found (the fixed filesystem-probed
    _index_exists; before the fix a restarted process silently skipped
    every cross-boundary candidate)."""
    import os as _os

    from pyspark.sql import functions as F

    from quick_stream_spark.config import QuickStreamConfig
    from quick_stream_spark.plans.text import _dup_corpus
    from quick_stream_spark.sources.readers import (
        stream_parquet_dir,
        write_split_as_files,
    )
    from quick_stream_spark.streaming.dedup_index import StreamingNearDupIndex
    from tests.conftest import SF_SMOKE

    corpus = _dup_corpus(spark, SF_SMOKE)
    work = _os.path.join(tmp_table_dir, "ndi-restart")
    evens = corpus.filter(F.col("id") % 2 == 0)
    odds = corpus.filter(F.col("id") % 2 == 1)
    write_split_as_files(evens, F.col("id") % 1, 1, work + "/in1")
    idx = StreamingNearDupIndex(
        spark, work + "/state",
        config=QuickStreamConfig(name="ndi-r1", checkpoint_dir=work + "/ck1"),
    )
    idx.run(stream_parquet_dir(spark, work + "/in1", corpus.schema),
            available_now=True)
    idx2 = StreamingNearDupIndex(
        spark, work + "/state",
        config=QuickStreamConfig(name="ndi-r2", checkpoint_dir=work + "/ck2"),
    )
    assert idx2._index_exists
    write_split_as_files(odds, F.col("id") % 1, 1, work + "/in2")
    idx2.run(stream_parquet_dir(spark, work + "/in2", corpus.schema),
             available_now=True)
    # one-shot reference over the full corpus
    ref_work = _os.path.join(tmp_table_dir, "ndi-ref")
    write_split_as_files(corpus, F.col("id") % 2, 2, ref_work + "/in")
    ref = StreamingNearDupIndex(
        spark, ref_work + "/state",
        config=QuickStreamConfig(name="ndi-ref", checkpoint_dir=ref_work + "/ck"),
    )
    ref.run(stream_parquet_dir(spark, ref_work + "/in", corpus.schema),
            available_now=True)
    assert ({tuple(r) for r in idx2.pairs().collect()}
            == {tuple(r) for r in ref.pairs().collect()})


def test_replayed_batches_cannot_shrink_the_distinct_reservoir(spark, tmp_path):
    """At-least-once foreachBatch replay appends duplicate (band, id)
    rows to the index; the admission cutoff and compact_reservoir()
    must dedup at (band, id) grain so duplicates never consume
    reservoir slots — the converged reservoir still holds R DISTINCT
    ids per band (the R smallest rank-hashes), not R physical rows."""
    R, N = 4, 40
    viral = [(i, DOC) for i in range(N)]
    ndi = StreamingNearDupIndex(
        spark, str(tmp_path / "state"), max_band_entries=R
    )
    apply = ndi._foreach_batch()
    apply(docs(spark, viral), 0)
    # crash-replay of the SAME delivery, twice — every admitted row now
    # has rank below any interim cutoff, so without the dedup each
    # replay re-admits copies that row_number would count toward R
    apply(docs(spark, viral), 1)
    apply(docs(spark, viral), 2)
    ndi.compact_reservoir()
    idx = ndi._read_index().select("band", "id")
    per_band = (
        idx.distinct()
        .groupBy("band")
        .count()
        .agg(F.min("count").alias("lo"), F.max("count").alias("hi"))
        .collect()[0]
    )
    # hard bound holds AND every band keeps R distinct ids (N >> R)
    assert per_band.hi <= R
    assert per_band.lo == R, "duplicates displaced distinct ids from the top-R"
    # physical rows equal distinct rows after compaction (no copies kept)
    assert idx.count() == idx.distinct().count()


def test_pairs_before_first_batch_returns_typed_empty(spark, tmp_path):
    ndi = StreamingNearDupIndex(spark, str(tmp_path / "state"))
    empty = ndi.pairs()
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id_a", "id_b", "jaccard"]
