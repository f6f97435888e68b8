"""Registry invariants: the exported corpus must stay inside the
driver's CORRECTNESS window and every exported entry must carry an
oracle (rows-only checks live in the pytest-only tier)."""

from quick_stream_spark.plans.registry import REGISTRY, oracle_sql, queries

DRIVER_WINDOW = 50


def test_exported_corpus_fits_driver_window():
    assert len(queries()) <= DRIVER_WINDOW


def test_every_exported_query_has_an_oracle():
    """UNCONDITIONAL: the driver has NO rows-only fallback for
    oracle-less exports (proven r7: an exported ``oracle=None`` entry
    recorded ``err: "no_oracle"``, ``rows_match: null`` — zero
    verification signal).  Rows-only checks live in the pytest-only
    tier; every exported entry must carry DuckDB oracle SQL."""
    exported = set(queries())
    with_oracle = set(oracle_sql())
    assert exported - with_oracle == set(), exported - with_oracle


def test_pytest_only_tier_is_nonempty_and_disjoint():
    queries()  # populate
    pytest_only = {n for n, s in REGISTRY.items() if s.pytest_only}
    assert pytest_only  # the tier exists
    assert pytest_only.isdisjoint(set(queries()))
