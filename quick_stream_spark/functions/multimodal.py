"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The image/audio/video codec libraries are NOT in this environment, so
the decode kernels are stubbed: ``decoder="fake"`` produces a
deterministic fake decode (dimensions derived from the payload hash) so
the Spark-side plumbing — schema, batching, partitioning, UDF signature
— is real and tested; ``decoder="real"`` raises ``NotImplementedError``
at the exact seam where PIL/ffmpeg would slot in.

Scale notes:
  - mapInPandas streams Arrow batches, so one task never materializes
    its whole partition; tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
    down for large payloads (10k rows of 1 MB images per batch is 10 GB).
  - decode is CPU-heavy, embarrassingly parallel: repartition by count
    (not key) before the decode stage so every core gets equal work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# payload + typed metadata: the convention for any multimodal table
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("format_hint", StringType()),  # e.g. jpeg, wav, mp4
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as opaque payloads —
    the offline stand-in for a real binary media table."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format_hint"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: pretend dimensions from the hash."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 8
    return width, height, n_frames


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode stage: Arrow-batched mapInPandas over the payload column.

    ``decoder='real'`` is the seam for PIL/torchaudio/ffmpeg — not
    available in this container, so it raises.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder: {decoder!r}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg, not present in this "
                    "environment; use decoder='fake' for plumbing tests"
                )
            payloads = pdf["payload"]
            dims = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plan stage: one row per kept frame index.  Pure
    built-ins (sequence + explode) — the heavy per-frame decode would
    chain another mapInPandas stage after this fan-out."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
