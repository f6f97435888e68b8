"""Config parity tests (reference O14: QuickStreamBuilder, builder.rs
14-222 — happy path test + 11 should_panic missing-field tests;
our config has defaults, so validation errors replace panics)."""

import pytest

from quick_stream_spark.config import QuickStreamConfig


def test_defaults_are_valid():
    cfg = QuickStreamConfig().validate()
    assert cfg.max_con_count == 10
    assert cfg.trigger_interval_ms == 1_000
    assert "-" in cfg.name  # random two-word default, like builder.rs:35-58


def test_trigger_maps_lag_cycles():
    """introduced_lag_cycles x introduced_lag_in_millies -> trigger
    interval (the accumulation loop, upsert.rs:158-204)."""
    cfg = QuickStreamConfig(introduced_lag_cycles=3, introduced_lag_in_millies=200)
    assert cfg.trigger_interval_ms == 600
    assert cfg.trigger_kwargs() == {"processingTime": "600 milliseconds"}
    assert cfg.trigger_kwargs(available_now=True) == {"availableNow": True}


def test_zero_lag_runs_continuous_microbatches():
    """Zero introduced lag = no delay between cycles in the reference,
    NOT drain-and-stop: it maps to a 0-interval processingTime trigger.
    availableNow is reserved for the explicit replay flag."""
    cfg = QuickStreamConfig(introduced_lag_cycles=0)
    assert cfg.trigger_kwargs() == {"processingTime": "0 milliseconds"}
    assert cfg.trigger_kwargs(available_now=True) == {"availableNow": True}


def test_source_options_rate_limit():
    cfg = QuickStreamConfig(buffer_size=7)
    assert cfg.source_options() == {"maxFilesPerTrigger": "7"}


@pytest.mark.parametrize(
    "field,value",
    [
        ("max_con_count", 0),
        ("buffer_size", 0),
        ("introduced_lag_in_millies", -1),
        ("introduced_lag_cycles", -5),
    ],
)
def test_invalid_config_raises(field, value):
    with pytest.raises(ValueError):
        QuickStreamConfig(**{field: value}).validate()


def test_write_partitions_floor():
    assert QuickStreamConfig(max_con_count=5).write_partitions == 5
