"""The local correctness gate: every registered query with an oracle
must match DuckDB exactly at sf0.001 (the driver repeats this at
sf0.01).  Queries without an oracle must at least run and return a
stable schema."""

import pytest

from quick_stream_spark.plans.registry import REGISTRY, queries
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_connection

queries()  # populate REGISTRY

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = REGISTRY[name]
    result = spec.fn(spark, SF_SMOKE)
    expected = oracle_con.execute(spec.oracle).df()
    problems = compare(result, expected)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    result = spec.fn(spark, SF_SMOKE)
    assert result.count() >= 0
    assert len(result.columns) > 0
