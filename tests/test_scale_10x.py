"""10x scaling measurements for the r6-driver-verified ops (r6 verdict
ask #7): `sample_training_order`, `sample_mixture_upsample`,
`sketch_hll_registers` and the `stream_distinct_hll` drain+compact must
grow wall-clock SUB-linearly from sf0.01 to sf0.1 (10x the rows), and
their physical plans at the larger SF must stay free of
rangepartitioning — the one-reducer global sort that would turn any of
them into a scale killer.  Measured medians are recorded in COVERAGE.md
per round.

Methodology matches bench.py: an untimed cold pass per (query, SF)
absorbs page-cache/footer/codegen one-time costs, then the timed run
measures the data path.  The bound is deliberately loose (wall ratio
< 6x for 10x data on the fixed-size local session) — it pins
"sub-linear", not a specific constant; the plan gate is the sharp
assertion.
"""

import time

import pytest

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

OPS = [
    "sample_training_order",
    "sample_mixture_upsample",
    "sketch_hll_registers",
    "stream_distinct_hll",
]


def _timed(spark, name, sf_dir) -> float:
    from quick_stream_spark.plans._util import clear_session_caches
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()  # populate
    fn = REGISTRY[name].fn
    clear_session_caches()
    fn(spark, sf_dir).count()  # cold pass (untimed)
    clear_session_caches()
    start = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - start


@pytest.mark.slow
@pytest.mark.parametrize("name", OPS)
def test_wall_clock_grows_sublinearly_on_10x_rows(spark, name):
    small = _timed(spark, name, SF_SMALL)
    big = _timed(spark, name, SF_BIG)
    ratio = big / max(small, 1e-9)
    print(f"\n# 10x-scaling {name}: sf0.01 {small:.2f}s -> sf0.1 {big:.2f}s "
          f"(ratio {ratio:.2f}x)")
    assert ratio < 6.0, (
        f"{name}: {small:.2f}s -> {big:.2f}s is {ratio:.1f}x wall for 10x "
        f"rows — super-linear-ish; check the plan for a scale killer"
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["sample_training_order", "sample_mixture_upsample", "sketch_hll_registers"]
)
def test_plans_stay_rangepartitioning_free_at_sf01(spark, name):
    """The sf0.001 plan gates (test_plans_explain) could in principle be
    cheated by an AQE/stats-driven plan change at larger data — re-read
    the physical plan at sf0.1.  (stream_distinct_hll is excluded: its
    result materializes through a streaming drain, so the batch plan
    string is not the execution shape; its scale posture is pinned by
    test_distinct_index.test_state_is_scale_independent_on_10x_feed.)"""
    from quick_stream_spark.plans.registry import REGISTRY, queries

    queries()
    import contextlib
    import io

    df = REGISTRY[name].fn(spark, SF_BIG)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" not in plan.lower(), plan
