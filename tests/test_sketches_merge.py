"""Merge laws of the distinct-count sketches — the property that makes
them 100 TB-viable: partial sketches built on disjoint data slices must
combine into exactly the sketch of the whole, so daily/stream/partition
state unions without rescanning history.

- HLL registers merge by register-wise MAX (sketch_hll_registers);
- linear-counting bitmaps merge by OR = set union of positions
  (sketch_set_ops_distinct), and the intersection leg is pinned against
  a materialized intersection via inclusion-exclusion.
"""

from pyspark.sql import functions as F

from quick_stream_spark.plans.sketches import (
    HLL_M,
    HLL_P,
    HLL_RMAX,
    SO_M,
    SO_PIVOT,
    _hll_h,
)
from quick_stream_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _hll_regs(df, col):
    """(bucket, r) register table for one key column."""
    h = _hll_h(col, F.col(col))
    rho = (
        F.when(F.shiftright(h, HLL_P) == 0, F.lit(HLL_RMAX))
        .otherwise(F.lit(HLL_RMAX) - F.length(F.bin(F.shiftright(h, HLL_P))))
    )
    return (
        df.select((h % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def test_hll_registers_merge_by_max(spark):
    """Registers over two disjoint halves, merged by per-bucket MAX,
    must equal the whole-table registers exactly (the HLL merge law —
    not just an equal estimate: identical register state)."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = (
        _hll_regs(half_a, "l_orderkey")
        .unionByName(_hll_regs(half_b, "l_orderkey"))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    whole = _hll_regs(li, "l_orderkey")
    diff = merged.join(whole, "bucket", "full_outer").filter(
        ~(merged["r"].eqNullSafe(whole["r"]))
    )
    assert diff.count() == 0


def test_set_ops_intersection_matches_materialized_join(spark):
    """The exact inclusion-exclusion leg of sketch_set_ops_distinct
    (x1 + x2 - xu) must equal the distinct count of a materialized
    segment intersection, and the bitmap-union leg must equal the
    positions of the OR'd per-segment bitmaps."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_shipdate")
    in_h1 = F.col("l_shipdate") < F.lit(SO_PIVOT).cast("date")
    a_keys = li.filter(in_h1).select("l_orderkey").distinct()
    b_keys = li.filter(~in_h1).select("l_orderkey").distinct()
    x1, x2 = a_keys.count(), b_keys.count()
    xu = a_keys.unionByName(b_keys).distinct().count()
    materialized = a_keys.join(b_keys, "l_orderkey", "left_semi").count()
    assert x1 + x2 - xu == materialized
    assert materialized > 0, "segments must genuinely overlap"
    assert x1 > materialized and x2 > materialized, (
        "each segment must also hold exclusive keys (non-degenerate split)"
    )

    # bitmap OR: positions of the unioned bitmaps == positions over all rows
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("so:"), F.col("l_orderkey").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % SO_M
    )
    bits_a = li.filter(in_h1).select(pos.alias("p")).distinct()
    bits_b = li.filter(~in_h1).select(pos.alias("p")).distinct()
    or_filled = bits_a.unionByName(bits_b).distinct().count()
    direct_filled = li.select(pos.alias("p")).distinct().count()
    assert or_filled == direct_filled
