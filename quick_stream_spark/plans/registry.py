"""Query registry: the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each entry pairs a Spark DataFrame program with the DuckDB-runnable SQL
stating the same contract.  Entries without SQL (genuinely
non-SQL-expressible ops) get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    # pytest_only queries are verified by the local oracle gate
    # (tests/test_queries_oracle.py) but NOT exported through
    # __spark_entry__.queries(): the driver's CORRECTNESS harness
    # evaluates a bounded window of entries, so the exported corpus is
    # kept to the distinct-operator set and variants/subsumed shapes
    # stay here (e.g. the DataFrame-API rollup/cube twins of the
    # grouping-sets query, the label-cell IVF subsumed by the trained
    # one).  ORTHOGONAL to ``bench``: bench.py selects on spec.bench
    # regardless of pytest_only, so a query can be excluded from the
    # driver's export window yet still run in the headline bench set.
    pytest_only: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    pytest_only: bool = False,
):
    """Decorator: add a query to the corpus."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=" ".join(oracle.split()) if oracle else None,
            tags=tuple(tags),
            bench=bench,
            pytest_only=pytest_only,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every plans module so decorators populate REGISTRY.

    Import order == registration order == the order the driver's
    CORRECTNESS harness sees (it evaluates a bounded prefix), so the
    reference-parity operators come first and the exported corpus is
    kept ≤ 50 entries total (enforced by tests/test_registry.py).
    """
    import quick_stream_spark.plans.reference_ops  # noqa: F401
    import quick_stream_spark.plans.relational  # noqa: F401
    import quick_stream_spark.plans.extensions  # noqa: F401
    import quick_stream_spark.plans.text  # noqa: F401
    import quick_stream_spark.plans.similarity  # noqa: F401
    import quick_stream_spark.plans.scale_ops  # noqa: F401
    import quick_stream_spark.plans.streaming_ext  # noqa: F401
    import quick_stream_spark.plans.tpch  # noqa: F401  (pytest-gated TPC-H breadth)
    import quick_stream_spark.plans.sketches  # noqa: F401  (pytest-gated sketch ops)
    import quick_stream_spark.plans.warehouse  # noqa: F401  (pytest-gated warehouse ops)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {
        name: spec.fn for name, spec in REGISTRY.items() if not spec.pytest_only
    }


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle and not spec.pytest_only
    }


def bench_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
