"""Last-writer-wins key dedup (reference O1/O2: lib.rs:12-22).

The reference sorts a batch descending by ``modified_date`` with a *stable*
sort and keeps the first occurrence per ``pkey`` — so the newest version
wins, and among records with an *equal* version the one that arrived
**earliest** in the batch wins (stable sort preserves arrival order among
equals; ``retain`` keeps the first).

Spark has no implicit arrival order, so the tie-break must be an explicit
column.  ``latest_per_key`` is a single ``row_number`` window — one shuffle
on the key columns, fully JVM-side, no Python UDF.

Scale notes (100 TB posture):
  - exactly one shuffle, on the dedup keys; AQE skew-join/partition
    coalescing applies.  For heavily skewed keys pre-aggregate with
    ``max_by`` semantics per partition first (Spark already does partial
    aggregation for the ``max_by`` variant below).
  - ``latest_per_key_agg`` is the shuffle-light variant: a ``max_by``
    aggregation gets map-side partial aggregation (a window function does
    not), at the cost of only keeping struct-packed columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__qss_rn"


def _order_cols(
    version_col: str, arrival_col: str | None, tie_break: str
) -> list[Column]:
    order: list[Column] = [F.col(version_col).desc_nulls_last()]
    if arrival_col is not None:
        if tie_break == "first_arrival":
            # faithful to the reference's stable sort + retain-first
            order.append(F.col(arrival_col).asc_nulls_last())
        elif tie_break == "last_arrival":
            order.append(F.col(arrival_col).desc_nulls_last())
        else:
            raise ValueError(f"unknown tie_break: {tie_break!r}")
    return order


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str] = ("pkey",),
    version_col: str = "modified_date",
    arrival_col: str | None = None,
    tie_break: str = "first_arrival",
) -> DataFrame:
    """Keep exactly one row per key: the one with the greatest
    ``version_col`` (reference ``remove_upsert_duplicates``, lib.rs:12-16).

    ``arrival_col``: explicit arrival-order column (e.g. an event id or a
    source offset) used to break equal-version ties deterministically.
    ``tie_break='first_arrival'`` reproduces the reference exactly.
    Without an ``arrival_col``, ties are broken arbitrarily (documented
    divergence — the reference's arrival order does not exist in a
    distributed DataFrame).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *_order_cols(version_col, arrival_col, tie_break)
    )
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)


def latest_per_key_agg(
    df: DataFrame,
    keys: Sequence[str] = ("pkey",),
    version_col: str = "modified_date",
    arrival_col: str | None = None,
    tie_break: str = "first_arrival",
) -> DataFrame:
    """Aggregation-based LWW dedup: ``max_by(struct(all cols), order key)``.

    Same result as :func:`latest_per_key` but uses a groupBy aggregation,
    which Catalyst executes with map-side partial aggregation — at 100 TB
    this roughly halves shuffle volume versus the window variant when keys
    repeat often within partitions.
    """
    other = [c for c in df.columns if c not in keys]
    # Build a totally-ordered sort key so max_by is deterministic.
    parts: list[Column] = [F.col(version_col)]
    if arrival_col is not None:
        arr = F.col(arrival_col)
        if tie_break == "first_arrival":
            arr = -arr  # earliest arrival wins among equal versions
        parts.append(arr)
    order_key = F.struct(*parts)
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(F.struct(*[F.col(c) for c in other]), order_key).alias("__best")
    )
    return agg.select(*keys, *[F.col(f"__best.{c}").alias(c) for c in other])
