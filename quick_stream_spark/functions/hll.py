"""HyperLogLog register arithmetic shared by the batch sketch query
(plans/sketches.py ``sketch_hll_registers``) and the streaming counter
(streaming/distinct_index.py) — md5-derived integer math both Spark and
DuckDB replay bit-exactly (no engine-internal sketch bytes anywhere).

Layout for precision ``p`` (m = 2^p registers, 128 <= m, p <= 14):

- 48-bit positive hash ``h`` from 12 md5 hex chars;
- bucket = low p bits, remainder w = high (48 - p) bits;
- rank rho(w) = leading zeros of w within its (48 - p)-bit width + 1,
  computed as ``(48 - p + 1) - bit_length(w)`` with bit_length taken as
  the STRING length of the binary rendering (``length(bin(w))``) — no
  float log2, so both engines agree exactly;
- the harmonic sum is kept on INTEGERS by scaling each 2^-r term by
  2^rmax (rmax = 48 - p + 1): registers contribute ``1 << (rmax - r)``,
  empty registers ``1 << rmax``, total <= m * 2^rmax = 2^49 < 2^63;
- the only float ops are the closing alpha * m^2 * 2^rmax / sum
  estimate and the small-range linear-counting ln, each a single
  expression over exactly-representable operands, rounded straight to
  an integer.

Registers merge by per-bucket MAX — idempotent, commutative,
associative — which is what makes the sketch safe under at-least-once
streaming replay and shardable across days/partitions/executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48  # 12 md5 hex chars; positive in a 64-bit long


def alpha(p: int) -> float:
    """Flajolet et al. 2007 bias constant (the m >= 128 branch)."""
    m = 1 << p
    if m < 128:
        raise ValueError(f"precision too low: m={m} < 128")
    return 0.7213 / (1 + 1.079 / m)


def rmax(p: int) -> int:
    return HASH_BITS - p + 1


def scale_c(p: int) -> int:
    """m^2 * 2^rmax = 2^(p + 49) — an exact power of two, hence exactly
    representable as a double in both engines."""
    return 1 << (p + 49)


def hash48(tag: str, key: Column) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"hll:{tag}:"), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def hash48_sql(tag: str, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('hll:{tag}:' || CAST({key_expr} AS VARCHAR)), 1, 12))"
        f"::BIGINT)"
    )


def bucket(h: Column, p: int) -> Column:
    return h % (1 << p)


def rho(h: Column, p: int) -> Column:
    w = F.shiftright(h, p)
    return (
        F.when(w == 0, F.lit(rmax(p)))
        .otherwise(F.lit(rmax(p)) - F.length(F.bin(w)))
    )


def rho_sql(p: int, h_expr: str = "h") -> str:
    m, r = 1 << p, rmax(p)
    return (
        f"CASE WHEN {h_expr} // {m} = 0 THEN {r} "
        f"ELSE {r} - length(bin({h_expr} // {m})) END"
    )


def register_table(
    df: DataFrame, tag: str, key: Column, p: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(group..., bucket, r) register table: per-bucket max rank.
    Map-side partial max bounds reduce input at (tasks x m) rows per
    group regardless of data volume."""
    h = hash48(tag, key)
    return (
        df.select(*group_cols, bucket(h, p).alias("bucket"), rho(h, p).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def merge_registers(regs: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Union-of-register-tables -> one register table (the HLL merge
    law: per-bucket max)."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("r").alias("r"))


def estimate(regs: DataFrame, p: int, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(group..., filled, raw_est, est_distinct) from a register table:
    integer-scaled harmonic estimate with the small-range
    linear-counting correction (engaged when filled < m and the raw
    estimate is under 2.5m)."""
    m, r_max = 1 << p, rmax(p)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("filled"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {r_max} - r)")).alias("s_part"),
    )
    s_full = F.col("s_part") + (F.lit(m) - F.col("filled")) * F.lit(1 << r_max)
    raw = F.round(
        F.lit(alpha(p)) * F.lit(scale_c(p)).cast("double") / s_full.cast("double")
    ).cast("long")
    lc = F.round(
        -F.lit(m) * F.log((F.lit(m) - F.col("filled")).cast("double") / m)
    ).cast("long")
    with_raw = agg.withColumn("raw_est", raw)
    corrected = F.when(
        (F.col("filled") < m) & (F.col("raw_est") * 2 < 5 * m), lc
    ).otherwise(F.col("raw_est"))
    return with_raw.select(
        *group_cols, "filled", "raw_est", corrected.alias("est_distinct")
    )


def estimate_sql(
    p: int,
    tag: str,
    key_expr: str,
    table: str,
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB CTE stack computing the same (group..., filled, raw_est,
    est_distinct) — the oracle-side twin of
    ``register_table`` + ``estimate``."""
    m, r_max = 1 << p, rmax(p)
    g = ", ".join(group_cols)
    g_pfx = f"{g}, " if g else ""
    g_grp = f"GROUP BY {g}" if g else ""
    return f"""
    WITH hll_base AS (
      SELECT {g_pfx}{hash48_sql(tag, key_expr)} AS h FROM {table}
    ),
    hll_regs AS (
      SELECT {g_pfx}h % {m} AS bucket, MAX({rho_sql(p)}) AS r
      FROM hll_base GROUP BY {g_pfx}h % {m}
    ),
    hll_agg AS (
      SELECT {g_pfx}CAST(count(*) AS BIGINT) AS filled,
             CAST(SUM(1::BIGINT << ({r_max} - r)) AS BIGINT) AS s_part
      FROM hll_regs {g_grp}
    ),
    hll_est AS (
      SELECT {g_pfx}filled,
             CAST(round({alpha(p)!r} * CAST({scale_c(p)} AS DOUBLE)
                        / CAST(s_part + ({m} - filled) * (1::BIGINT << {r_max})
                               AS DOUBLE)) AS BIGINT) AS raw_est
      FROM hll_agg
    )
    SELECT {g_pfx}filled, raw_est,
           CASE WHEN filled < {m} AND raw_est * 2 < 5 * {m}
                THEN CAST(round(-{m} * ln(CAST({m} - filled AS DOUBLE) / {m}))
                     AS BIGINT)
                ELSE raw_est END AS est_distinct
    FROM hll_est
    """
