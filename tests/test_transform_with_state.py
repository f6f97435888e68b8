"""transformWithStateInPandas (Spark 4 arbitrary-state API) — the
successor to applyInPandasWithState.  Its state protocol requires
google.protobuf, which this environment does not ship, so the test
skips here and verifies wherever protobuf exists; the implementation
(plans/scale_ops.py stream_transform_with_state) is complete and the
applyInPandasWithState twin carries the exported correctness slot."""

import pytest

from tests.conftest import SF_SMOKE


def test_transform_with_state_counter_matches_batch_aggregate(spark):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state protocol needs protobuf "
        "(not shipped in this environment)",
    )
    from quick_stream_spark.plans.scale_ops import stream_transform_with_state
    from tests.oracle_harness import compare, duckdb_connection

    con = duckdb_connection(SF_SMOKE)
    try:
        result = stream_transform_with_state(spark, SF_SMOKE)
        expected = con.execute(
            """
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(max(event_id) AS BIGINT) AS last_event_id
            FROM events GROUP BY user_id
            """
        ).df()
        problems = compare(result, expected)
        assert not problems, problems
    finally:
        con.close()
