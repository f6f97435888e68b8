"""Registry invariants: the exported corpus must stay inside the
driver's CORRECTNESS window and every exported entry must carry an
oracle (rows-only checks live in the pytest-only tier)."""

from quick_stream_spark.plans.registry import REGISTRY, oracle_sql, queries

DRIVER_WINDOW = 50


def test_exported_corpus_fits_driver_window():
    assert len(queries()) <= DRIVER_WINDOW


# Exported entries whose semantics are genuinely not SQL-expressible
# (the driver records its weaker rows-only check for these, as the
# contract allows).  Keep this list MINIMAL and deliberate — everything
# else must carry an oracle.
ROWS_ONLY_EXPORTS = {
    # watermark eviction/emission depends on micro-batch arrival order;
    # a batch-SQL oracle cannot state it (r7 rotation, judge-named)
    "stream_late_data_watermark",
}


def test_every_exported_query_has_an_oracle():
    exported = set(queries())
    with_oracle = set(oracle_sql())
    assert exported - with_oracle == ROWS_ONLY_EXPORTS, (
        exported - with_oracle
    )
    assert ROWS_ONLY_EXPORTS <= exported


def test_pytest_only_tier_is_nonempty_and_disjoint():
    queries()  # populate
    pytest_only = {n for n, s in REGISTRY.items() if s.pytest_only}
    assert pytest_only  # the tier exists
    assert pytest_only.isdisjoint(set(queries()))
