"""Cross-engine determinism helpers for the oracle-matched query corpus.

Rules that make a Spark result hash-match the DuckDB oracle:

1. **Money math in decimals.**  Floating-point SUM is order-dependent and
   Spark's partial aggregation order differs from DuckDB's, so sums of
   doubles can differ in final ulps.  Casting each operand to
   ``DECIMAL(18,2)`` first makes every product/sum exact and associative
   — identical in any engine and any partitioning.  The final value is
   cast back to DOUBLE (exact: our magnitudes stay far below 2^53).
2. **Averages** = exact decimal SUM cast to double, divided by COUNT —
   a single IEEE division of identical operands, then ``round(.., 6)``.
3. **Alias everything** — the driver sorts columns by name before
   hashing (task brief), so both sides must agree on names.
4. **Timestamps** — the session timezone is pinned to UTC so Spark's
   timestamp rendering matches DuckDB's naive timestamps.
5. **No nondeterministic tie-breaks** — every row_number/top-k order
   ends with a unique key column.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


@contextmanager
def scoped_shuffle(spark: SparkSession, parts: int):
    """Temporarily size ``spark.sql.shuffle.partitions``.  Only
    effective around eager execution (checkpoint / streaming drain /
    persist-count) — the conf is read at execution time, so lazily
    returned plans would run after the restore.  Sizing shuffle width
    to the DATA instead of a static conf matters in both directions:
    a fixed 2x-cores width costs ~3x pure task-scheduling overhead on
    small inputs, and a fixed small width under-parallelizes at 100 TB
    (see rows_sized_parts)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def rows_sized_parts(
    n_rows: int, rows_per_reducer: int, floor: int = 8, cap: int = 4096
) -> int:
    """Shuffle width from input size: ``n_rows / rows_per_reducer``
    clamped to [floor, cap].  Pick ``rows_per_reducer`` so a reduce
    partition stays well under executor memory for the row width at
    hand."""
    return max(floor, min(cap, n_rows // max(rows_per_reducer, 1)))


def pin_session(spark: SparkSession) -> SparkSession:
    """Pin the session settings the oracle comparison relies on, plus
    AQE — the calling session's config is unknown (the grading driver
    builds its own), and without adaptive partition coalescing a default
    200-partition shuffle makes the small iterative queries crawl."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum(col: str | Column, alias: str) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(money(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, rounded."""
    return F.round(F.sum(money(col)).cast("double") / F.count(F.lit(1)), 6).alias(alias)


# SQL-side twins (DuckDB)
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS {alias}"


def revenue_col(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Exact decimal revenue: price * (1 - discount)."""
    return money(price) * (F.lit(1).cast("decimal(18,2)") - money(disc))


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# Every per-(session, sf) artifact cache in the plans package registers
# itself here, so the bench harness can clear ALL shared state between
# timed queries: each bench entry then computes its own shared stages
# and per-query timings are independent of execution order (r3's
# minhash/CC lines swung 10x across rounds purely from cache order).
_SESSION_CACHES: list[dict] = []


def shared_cache(cache: dict) -> dict:
    """Declare a per-(session, scale-factor) artifact cache.  Returns
    the dict so declarations read ``_X_CACHE = shared_cache({})``."""
    _SESSION_CACHES.append(cache)
    return cache


def _release(value) -> None:
    """Best-effort release of cached Spark resources (persisted /
    localCheckpointed frames hold storage blocks beyond their Python
    reference)."""
    if hasattr(value, "unpersist"):
        try:
            value.unpersist()
        except Exception:
            pass
    elif isinstance(value, (tuple, list)):
        for v in value:
            _release(v)


def clear_session_caches() -> None:
    """Drop every registered shared artifact (and unpersist any cached
    frames).  Correctness never depends on these caches — they only
    save recomputation — so clearing at any point is safe."""
    for cache in _SESSION_CACHES:
        for v in cache.values():
            _release(v)
        cache.clear()


def session_cached(cache: dict, spark: SparkSession, sf_dir: str, build):
    """Get-or-fill for per-(session, scale-factor) artifacts — the one
    idiom behind the pairs/corpus/codebook caches: deterministic session
    artifacts (checkpointed frames, driver-side models) keyed by
    (applicationId, sf_dir) so a new session or a different scale
    factor never reads a stale entry."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in cache:
        cache[key] = build()
    return cache[key]
