"""Durable applied-version sidecar for CDC consumers.

``ChangeReplicator`` and ``CdcAggView`` track which source snapshot
version they last applied.  Keeping that watermark only in memory makes
"resumable" a lie across process restarts: a fresh instance re-runs the
bootstrap, and for SIGNED-delta consumers (CdcAggView) the replayed
bootstrap + deltas double-count groups whose stored ``_src_version``
has since advanced.  The sidecar persists the watermark next to the
consumer's own table (one tiny JSON file, written AFTER the apply
completes) so a restart resumes exactly where the previous process
stopped; a crash between apply and sidecar write re-applies one
version, which the consumers' per-group ``_src_version`` guard absorbs
as a no-op.

Publish is write-temp + rename (same recipe as
:mod:`~quick_stream_spark.operators.commitlog`), so a crash mid-write
leaves either the previous watermark or none — never a truncated file.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

APPLIED_SIDECAR = "_qss_applied.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def read_applied(spark: SparkSession, table_path: str) -> int | None:
    """The persisted applied-version watermark, or ``None`` if absent
    (fresh consumer, or pre-sidecar state)."""
    fs, _, jvm = _fs(spark, table_path)
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(table_path, APPLIED_SIDECAR))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    try:
        return int(json.loads(data.decode("utf-8"))["applied_version"])
    except (ValueError, KeyError, json.JSONDecodeError):
        return None


def write_applied(spark: SparkSession, table_path: str, version: int) -> None:
    fs, _, jvm = _fs(spark, table_path)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(table_path))
    body = json.dumps({"applied_version": int(version)}).encode("utf-8")
    tmp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(table_path, f".tmp-applied-{uuid.uuid4().hex}.json")
    )
    out = fs.create(tmp, True)
    out.write(bytearray(body))
    out.close()
    final = jvm.org.apache.hadoop.fs.Path(os.path.join(table_path, APPLIED_SIDECAR))
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise RuntimeError(f"could not publish applied-version sidecar at {final}")
