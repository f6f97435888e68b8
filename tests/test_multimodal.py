"""Plumbing tests for the multimodal decode pipeline (stubbed codecs)."""

import pytest
from pyspark.sql import functions as F

from quick_stream_spark.functions.multimodal import (
    DECODED_SCHEMA,
    decode_media,
    documents_as_media,
    sample_frames,
)
from quick_stream_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SF_SMOKE, "documents"))


def test_decode_schema_and_determinism(spark, media):
    out = decode_media(media, decoder="fake")
    assert out.schema == DECODED_SCHEMA
    a = {r.media_id: (r.sha256, r.width, r.height, r.n_frames) for r in out.collect()}
    b = {r.media_id: (r.sha256, r.width, r.height, r.n_frames) for r in out.collect()}
    assert a == b  # deterministic fake decode
    assert len(a) == media.count()
    assert all(64 <= v[1] < 256 for v in a.values())


def test_decode_byte_counts_match_payload(spark, media):
    out = decode_media(media, decoder="fake")
    joined = out.join(media, "media_id").select(
        "media_id", "n_bytes", F.octet_length("payload").alias("expected")
    )
    assert joined.filter(F.col("n_bytes") != F.col("expected")).count() == 0


def test_real_decoder_raises_at_the_seam(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media.limit(2), decoder="real").collect()


def test_frame_sampling(spark, media):
    decoded = decode_media(media.limit(50), decoder="fake")
    frames = sample_frames(decoded, every_nth=2)
    got = frames.groupBy("media_id").count().join(decoded, "media_id")
    expected = F.floor((F.col("n_frames") - 1) / 2) + 1  # ceil(n/2)
    bad = got.filter(F.col("count") != expected).count()
    assert bad == 0
