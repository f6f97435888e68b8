"""Quantitative data-skipping check for the Z-order layout: zone maps
from the Morton-code layout must prune files on BOTH dimensions, while
a linear single-column sort prunes only its sort column."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from quick_stream_spark.plans.registry import REGISTRY, queries
from quick_stream_spark.plans.warehouse import Z_FILES, _Z_EPOCH
from quick_stream_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

queries()  # populate REGISTRY


def _overlapping(stats, lo_col, hi_col, lo, hi):
    """Files a range predicate [lo, hi] cannot skip, per zone maps."""
    return sum(1 for r in stats if not (r[hi_col] < lo or r[lo_col] > hi))


def test_zorder_zone_maps_prune_both_dimensions(spark):
    zstats = REGISTRY["maintenance_zorder_stats"].fn(spark, SF_SMOKE).collect()
    assert len(zstats) == Z_FILES

    # linear layout clustered by custkey only, same file count
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH).cast("date")).alias("d"),
    )
    linear = (
        o.select(
            "o_custkey",
            "d",
            F.ntile(Z_FILES)
            .over(Window.orderBy("o_custkey", "o_orderkey"))
            .alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("d").alias("min_day"),
            F.max("d").alias("max_day"),
        )
        .collect()
    )

    bounds = o.agg(
        F.min("d").alias("dlo"),
        F.max("d").alias("dhi"),
        F.min("o_custkey").alias("clo"),
        F.max("o_custkey").alias("chi"),
    ).collect()[0]

    # a ~10%-wide range predicate on each dimension
    d_span = (bounds.dhi - bounds.dlo) // 10
    d_lo = bounds.dlo + 4 * d_span
    c_span = max((bounds.chi - bounds.clo) // 10, 1)
    c_lo = bounds.clo + 4 * c_span

    z_day = _overlapping(zstats, "min_day", "max_day", d_lo, d_lo + d_span)
    lin_day = _overlapping(linear, "min_day", "max_day", d_lo, d_lo + d_span)
    z_cust = _overlapping(zstats, "min_custkey", "max_custkey", c_lo, c_lo + c_span)
    lin_cust = _overlapping(linear, "min_custkey", "max_custkey", c_lo, c_lo + c_span)

    # the linear layout cannot skip anything on its non-sort column
    assert lin_day == Z_FILES
    # Z-order skips real file counts on BOTH dimensions
    assert z_day < Z_FILES
    assert z_cust < Z_FILES
    assert z_day < lin_day
    # and the linear layout's own sort column stays prunable under Z too
    assert z_cust <= Z_FILES - 4
