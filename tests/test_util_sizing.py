"""Shuffle-width sizing helpers (plans/_util.py)."""

import pytest

from quick_stream_spark.plans._util import rows_sized_parts, scoped_shuffle


def test_rows_sized_parts_bounds():
    assert rows_sized_parts(0, 100_000) == 8  # floor
    assert rows_sized_parts(10_000, 100_000) == 8
    assert rows_sized_parts(3_200_000, 100_000) == 32  # proportional
    assert rows_sized_parts(10**12, 100_000) == 4096  # cap
    assert rows_sized_parts(100, 0) == 100  # degenerate divisor -> per-row clamp


def test_scoped_shuffle_restores(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_shuffle(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_scoped_shuffle_restores_on_error(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with scoped_shuffle(spark, 5):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
