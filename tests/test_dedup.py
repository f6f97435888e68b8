"""Mirrors the reference's dedup unit tests (upsert.rs:589-601:
ids {1@t0, 1@t0+1s, 2@t0+2s} -> one row per id, newest wins) plus the
tie-break rule pinned from lib.rs:12-16 (stable desc sort + retain-first
=> equal-version ties go to the EARLIEST arrival)."""

from datetime import datetime

import pytest

from quick_stream_spark.operators.dedup import latest_per_key, latest_per_key_agg

SCHEMA = "pkey long, modified_date timestamp, arrival long, payload string"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture()
def batch(spark):
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (1, t0, 1, "v1"),
            (1, datetime(2024, 1, 1, 0, 0, 1), 2, "v2"),
            (2, datetime(2024, 1, 1, 0, 0, 2), 3, "v3"),
        ],
        SCHEMA,
    )


@pytest.mark.parametrize("fn", [latest_per_key, latest_per_key_agg])
def test_newest_per_key_wins(spark, batch, fn):
    out = fn(batch, keys=("pkey",), version_col="modified_date", arrival_col="arrival")
    got = {(r.pkey, r.payload) for r in out.collect()}
    assert got == {(1, "v2"), (2, "v3")}


@pytest.mark.parametrize("fn", [latest_per_key, latest_per_key_agg])
def test_equal_version_tie_earliest_arrival_wins(spark, fn):
    t = datetime(2024, 1, 1)
    df = spark.createDataFrame([(7, t, 1, "first"), (7, t, 2, "second")], SCHEMA)
    out = fn(df, keys=("pkey",), version_col="modified_date", arrival_col="arrival")
    assert [(r.pkey, r.payload) for r in out.collect()] == [(7, "first")]


@pytest.mark.parametrize("fn", [latest_per_key, latest_per_key_agg])
def test_last_arrival_tie_break_option(spark, fn):
    t = datetime(2024, 1, 1)
    df = spark.createDataFrame([(7, t, 1, "first"), (7, t, 2, "second")], SCHEMA)
    out = fn(
        df,
        keys=("pkey",),
        version_col="modified_date",
        arrival_col="arrival",
        tie_break="last_arrival",
    )
    assert [(r.pkey, r.payload) for r in out.collect()] == [(7, "second")]


def test_idempotent(spark, batch):
    once = latest_per_key(batch, arrival_col="arrival")
    twice = latest_per_key(once, arrival_col="arrival")
    assert rows_of(once) == rows_of(twice)


def test_empty_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert latest_per_key(df, arrival_col="arrival").count() == 0


def test_window_and_agg_variants_agree(spark, batch):
    a = latest_per_key(batch, arrival_col="arrival")
    b = latest_per_key_agg(batch, arrival_col="arrival")
    assert rows_of(a.select(*sorted(a.columns))) == rows_of(b.select(*sorted(b.columns)))
