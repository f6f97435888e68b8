"""Streaming ANN index (streaming/ann_index.py): the incrementally
built banded-LSH vector index must be delivery-chunking independent —
any way of splitting the corpus into micro-batches yields the same
pairs log and the same retrieval results."""

import os

from pyspark.sql import functions as F

from quick_stream_spark.config import QuickStreamConfig
from quick_stream_spark.sources.readers import (
    stream_parquet_dir,
    write_split_as_files,
)
from quick_stream_spark.streaming.ann_index import StreamingAnnIndex
from tests.conftest import SF_SMOKE


def _corpus(spark):
    from quick_stream_spark.plans.similarity import EMB_DUP_OFFSET, _emb

    e = _emb(spark, SF_SMOKE).select("vec_id", "v")
    pert = e.select(
        (F.col("vec_id") + EMB_DUP_OFFSET).alias("vec_id"),
        F.transform(F.col("v"), lambda x: x * 1.02 + 0.01).alias("v"),
    )
    return e.unionByName(pert)


def _drain(spark, corpus, root, n_chunks):
    work = os.path.join(root, f"chunks{n_chunks}")
    write_split_as_files(corpus, F.col("vec_id") % n_chunks, n_chunks, work + "/in")
    idx = StreamingAnnIndex(
        spark,
        work + "/state",
        config=QuickStreamConfig(
            name=f"anni-{n_chunks}", checkpoint_dir=work + "/ckpt"
        ),
    )
    idx.run(
        stream_parquet_dir(spark, work + "/in", corpus.schema), available_now=True
    )
    return idx


def test_chunking_independence_of_pairs_and_retrieval(spark, tmp_table_dir):
    corpus = _corpus(spark).persist()
    try:
        one = _drain(spark, corpus, tmp_table_dir, 2)
        other = _drain(spark, corpus, tmp_table_dir, 4)
        p1 = {tuple(r) for r in one.pairs().collect()}
        p2 = {tuple(r) for r in other.pairs().collect()}
        assert p1 == p2 and p1, "pair log depends on delivery chunking"
        t1 = {tuple(r) for r in one.topk(8, 5).collect()}
        t2 = {tuple(r) for r in other.topk(8, 5).collect()}
        assert t1 == t2 and t1, "retrieval depends on delivery chunking"
    finally:
        corpus.unpersist()


def test_pairless_batches_do_not_grow_the_pairs_log(spark, tmp_table_dir):
    """Regression (r3 ADVICE): a micro-batch that verifies ZERO pairs
    must not append an empty parquet file — the pairs dir would grow
    one file per batch forever on a duplicate-free stream.  The dir is
    still created (schema-only) so pairs() always reads."""
    from quick_stream_spark.plans.similarity import _emb

    # base embeddings only, no perturbed twins -> no pair clears 0.99
    corpus = _emb(spark, SF_SMOKE).select("vec_id", "v").limit(24)
    work = os.path.join(tmp_table_dir, "pairless")
    write_split_as_files(corpus, F.col("vec_id") % 4, 4, work + "/in")
    idx = StreamingAnnIndex(
        spark,
        work + "/state",
        config=QuickStreamConfig(name="anni-p0", checkpoint_dir=work + "/ckpt"),
    )
    idx.run(
        stream_parquet_dir(spark, work + "/in", corpus.schema),
        available_now=True,
    )
    assert idx.pairs().count() == 0  # readable, empty
    part_files = [
        f
        for f in os.listdir(idx.pairs_path)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    assert len(part_files) <= 1, (
        f"{len(part_files)} pair files after 4 pairless batches "
        "(expected only the schema seed)"
    )


def test_restarted_index_sees_prior_entries(spark, tmp_table_dir):
    """A NEW StreamingAnnIndex over an existing work_dir (process
    restart / checkpoint resume) must see the index its predecessor
    built: cross-batch pairs with pre-restart vectors must still be
    found, and topk() must answer."""
    corpus = _corpus(spark).persist()
    try:
        first_half = corpus.filter(F.col("vec_id") % 2 == 0)
        second_half = corpus.filter(F.col("vec_id") % 2 == 1)
        work = os.path.join(tmp_table_dir, "restart")
        write_split_as_files(first_half, F.col("vec_id") % 1, 1, work + "/in1")
        idx = StreamingAnnIndex(
            spark, work + "/state",
            config=QuickStreamConfig(name="anni-r1", checkpoint_dir=work + "/ck1"),
        )
        idx.run(stream_parquet_dir(spark, work + "/in1", corpus.schema),
                available_now=True)
        # restart: fresh instance over the same state dir
        idx2 = StreamingAnnIndex(
            spark, work + "/state",
            config=QuickStreamConfig(name="anni-r2", checkpoint_dir=work + "/ck2"),
        )
        assert idx2._index_exists, "restarted index forgot its on-disk state"
        write_split_as_files(second_half, F.col("vec_id") % 1, 1, work + "/in2")
        idx2.run(stream_parquet_dir(spark, work + "/in2", corpus.schema),
                 available_now=True)
        # the batch reference: one-shot drain over everything
        ref = _drain(spark, corpus, tmp_table_dir, 3)
        assert ({tuple(r) for r in idx2.pairs().collect()}
                == {tuple(r) for r in ref.pairs().collect()})
    finally:
        corpus.unpersist()


def test_pairs_guard_for_retrieval_geometry_and_empty_index(spark, tmp_table_dir):
    """pairs() on an emit_pairs=False (retrieval-geometry) index must
    raise a clear contract error, not an opaque path-not-found; on an
    emit_pairs=True index before any batch it returns a typed empty
    frame."""
    import pytest

    from quick_stream_spark.plans.similarity import (
        LSH_ANN_BAND_BITS,
        LSH_ANN_MIN_BANDS,
        LSH_ANN_PLANES,
    )

    retrieval = StreamingAnnIndex(
        spark,
        os.path.join(tmp_table_dir, "ret"),
        planes=LSH_ANN_PLANES,
        band_bits=LSH_ANN_BAND_BITS,
        min_bands=LSH_ANN_MIN_BANDS,
        emit_pairs=False,
    )
    with pytest.raises(ValueError, match="emit_pairs=False"):
        retrieval.pairs()

    fresh = StreamingAnnIndex(spark, os.path.join(tmp_table_dir, "fresh"))
    empty = fresh.pairs()
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id_a", "id_b", "cos_sim"]
