"""Mergeable one-pass sketch operators — the approximate-analytics
layer a 100 TB pipeline runs when exact per-key state is too big:

- ``sketch_countmin_heavy_hitters`` — a Count-Min sketch (Cormode &
  Muthukrishnan 2005) built as a bounded counter table, probed for the
  exact top-k keys so the overestimate is visible and oracle-checkable;
- ``agg_histogram_quantiles`` — fixed-bin histogram quantile estimation
  (the mergeable alternative to exact percentiles: partial bin counts
  combine associatively across executors/days/streams).

Unlike engine-internal sketches (HLL, KLL) whose binary state is not
portable, these are built from md5-derived arithmetic both engines can
replay, so the DuckDB oracle checks the full sketch pipeline, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.functions import hll as _hll
from quick_stream_spark.plans._util import pin_session
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table

# ------------------------------------------------------------- count-min

CMS_D = 4  # hash rows
CMS_W = 256  # counters per row; d*w = 1024 counters total (~8 KB state)
CMS_TOPK = 20


def _cms_idx(j: int, key) -> F.Column:
    """Row-j counter index for a key: md5 of ``"j:key"`` reduced mod W
    (independent hash per row via the j prefix)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def _cms_idx_sql(j: int, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{j}:' || CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {CMS_W})"
    )


def _cms_counters_sql() -> str:
    scans = " UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_idx_sql(j, 'l_partkey')} AS idx FROM lineitem"
        for j in range(CMS_D)
    )
    return f"SELECT j, idx, CAST(count(*) AS BIGINT) AS c FROM ({scans}) GROUP BY j, idx"


def _cms_probe_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT l_partkey, exact_n, {j} AS j, {_cms_idx_sql(j, 'l_partkey')} AS idx FROM top"
        for j in range(CMS_D)
    )


@register(
    "sketch_countmin_heavy_hitters",
    oracle=f"""
    WITH counters AS ({_cms_counters_sql()}),
    exact AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_n
      FROM lineitem GROUP BY l_partkey
    ),
    top AS (
      SELECT l_partkey, exact_n FROM exact
      ORDER BY exact_n DESC, l_partkey ASC LIMIT {CMS_TOPK}
    ),
    probe AS ({_cms_probe_sql()})
    SELECT p.l_partkey, p.exact_n,
           min(c.c) AS cms_n,
           min(c.c) - p.exact_n AS overestimate
    FROM probe p JOIN counters c ON c.j = p.j AND c.idx = p.idx
    GROUP BY p.l_partkey, p.exact_n
    """,
    tags=("sketch", "countmin", "heavy-hitters"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over lineitem part frequencies, probed for the
    exact top-{CMS_TOPK} parts: for each heavy hitter, the exact count,
    the sketch estimate (min over {CMS_D} hash rows), and the
    overestimate (always >= 0 — CMS errors are one-sided).

    Scale design: the sketch build is ONE map-side-combinable shuffle —
    each input row emits {CMS_D} (row, index) keys that partial-aggregate
    to at most {CMS_D}x{CMS_W} = {CMS_D * CMS_W} counters per map task
    before shuffling, so the reduce input is bounded by (tasks x
    {CMS_D * CMS_W}), independent of data volume; the finished sketch is
    a ~8 KB artifact that merges across days/streams by addition.  The
    probe side joins {CMS_D} keys per candidate against the broadcast
    counter table.  The exact side exists to make the error observable
    and is the piece you'd drop at 100 TB.  (Exact top-k with
    deterministic ties keeps the candidate set itself oracle-stable.)"""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")

    def hashes(key) -> F.Column:
        return F.array(
            *[
                F.struct(F.lit(j).alias("j"), _cms_idx(j, key).alias("idx"))
                for j in range(CMS_D)
            ]
        )

    counters = (
        li.select(F.explode(hashes(F.col("l_partkey"))).alias("p"))
        .select("p.j", "p.idx")
        .groupBy("j", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc("l_partkey")).limit(CMS_TOPK)
    probe = top.select(
        "l_partkey", "exact_n", F.explode(hashes(F.col("l_partkey"))).alias("p")
    ).select("l_partkey", "exact_n", "p.j", "p.idx")
    return (
        probe.join(F.broadcast(counters), ["j", "idx"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("c").alias("cms_n"))
        .select(
            "l_partkey",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
    )


# ------------------------------------------------- histogram quantiles

HIST_LO = 0
HIST_HI = 512_000  # o_totalprice observed < 500k; overflow clamps to last bin
HIST_BINS = 64
_W = (HIST_HI - HIST_LO) // HIST_BINS  # 8000
_QS = (0.5, 0.9, 0.99)


def _exact_q_case_sql(q_expr: str) -> str:
    whens = " ".join(
        f"WHEN {q} THEN (SELECT round(quantile_cont(o_totalprice, {q}), 6) FROM orders)"
        for q in _QS
    )
    return f"CASE {q_expr} {whens} END"


@register(
    "agg_histogram_quantiles",
    oracle=f"""
    WITH hist AS (
      SELECT least(CAST(floor(o_totalprice / {_W}) AS BIGINT), {HIST_BINS - 1}) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT b, c,
             SUM(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS n_total
      FROM hist
    ),
    qs AS (SELECT unnest([{", ".join(str(q) for q in _QS)}]) AS q),
    chosen AS (
      SELECT q, min(b) AS b FROM cum, qs
      WHERE cum >= ceil(q * n_total) GROUP BY q
    )
    SELECT ch.q,
           CAST(c2.n_total AS BIGINT) AS n_total,
           c2.b AS bin,
           round(c2.b * {_W} + {_W}.0 * (ceil(ch.q * c2.n_total) - (c2.cum - c2.c)) / c2.c, 6)
             AS est_value,
           {_exact_q_case_sql('ch.q')} AS exact_value,
           round(round(c2.b * {_W} + {_W}.0 * (ceil(ch.q * c2.n_total) - (c2.cum - c2.c)) / c2.c, 6)
                 - {_exact_q_case_sql('ch.q')}, 6) AS err
    FROM chosen ch JOIN cum c2 USING (b)
    """,
    tags=("sketch", "histogram", "quantile"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed-bin histogram — the mergeable
    single-pass alternative to exact percentiles: {HIST_BINS} bins of
    width {_W} over o_totalprice, cumulative counts, then linear
    interpolation inside the bin that crosses each target rank, compared
    against the exact percentile.

    Scale design: the histogram is ONE map-side-combinable groupBy that
    reduces any input volume to <= {HIST_BINS} rows (partial counts
    merge by addition — across partitions, across days, across streams);
    everything after operates on that bounded artifact, including the
    single-partition cumulative window (64 rows by construction, noted
    here because an unpartitioned window over DATA would be a
    scale-killer).  The exact-percentile column is the verification
    piece you'd drop at 100 TB.  Estimation error is bounded by bin
    width; all arithmetic is integer until one final division, so both
    engines agree bit-for-bit."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    b = F.least(
        F.floor(F.col("o_totalprice") / _W).cast("long"), F.lit(HIST_BINS - 1)
    )
    hist = o.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n_total"),
    )
    qs = (
        load_table(spark, sf_dir, "region")
        .limit(1)
        .select(F.explode(F.array(*[F.lit(q) for q in _QS])).alias("q"))
    )
    target = F.ceil(F.col("q") * F.col("n_total"))
    chosen = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= target)
        .groupBy("q")
        .agg(F.min("b").alias("b"))
    )
    est = F.round(
        F.col("b") * _W
        + F.lit(float(_W)) * (target - (F.col("cum") - F.col("c"))) / F.col("c"),
        6,
    )
    exact_arr = o.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in _QS])).alias("p")
    )
    exact = exact_arr.select(F.posexplode("p").alias("i", "ev")).select(
        F.element_at(F.array(*[F.lit(q) for q in _QS]), F.col("i") + 1).alias("q"),
        F.round(F.col("ev"), 6).alias("exact_value"),
    )
    return (
        chosen.join(cum, "b")
        .select(
            "q",
            F.col("n_total").cast("long").alias("n_total"),
            F.col("b").alias("bin"),
            est.alias("est_value"),
        )
        .join(F.broadcast(exact), "q")
        .select(
            "q",
            "n_total",
            "bin",
            "est_value",
            "exact_value",
            F.round(F.col("est_value") - F.col("exact_value"), 6).alias("err"),
        )
    )


# ------------------------------------------------- moment sketches

@register(
    "agg_moments_by_type",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(vc) AS s1, sum(vc * vc) AS s2, sum(vc * vc * vc) AS s3
      FROM cents GROUP BY event_type
    )
    SELECT event_type, n,
           round(CAST(s1 AS DOUBLE) / n / 100, 6) AS mean_value,
           round((CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / 10000, 6)
             AS var_value,
           CASE WHEN CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) > 0
                THEN round(
                  (CAST(s3 AS DOUBLE) / n
                   - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                   + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                       * (CAST(s1 AS DOUBLE) / n))
                  / ((CAST(s2 AS DOUBLE) / n
                      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                     * sqrt(CAST(s2 AS DOUBLE) / n
                            - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))),
                  6)
           END AS skewness
    FROM sums
    """,
    tags=("sketch", "moments", "agg"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def agg_moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution moments (mean / population variance / skewness) per
    event type from EXACT integer power sums — the mergeable
    moment-sketch pattern: (n, Σv, Σv², Σv³) combine by addition across
    partitions, days and streams, unlike a percentile which needs the
    data.  Values are scaled to integer cents first, so every sum is
    exact (decimal-128 accumulators; Σv³ overflows int64 at ~5e4 rows
    of max value, and would silently wrap in a naive long sum) and the
    final moments are single identical float expressions in both
    engines — sqrt(var)*var replaces pow(var, 1.5) because pow is not
    correctly-rounded-guaranteed across math libraries while sqrt is.

    Scale design: one map-side-combinable groupBy; the per-group state
    is four numbers regardless of volume."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    vc = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    sums = ev.select("event_type", vc.alias("vc")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vc").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("vc") * F.col("vc")).cast("decimal(38,0)")).alias("s2"),
        F.sum((F.col("vc") * F.col("vc") * F.col("vc")).cast("decimal(38,0)")).alias(
            "s3"
        ),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    var_c = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (var_c * F.sqrt(var_c))
    return sums.select(
        "event_type",
        "n",
        F.round(m1 / 100, 6).alias("mean_value"),
        F.round(var_c / 10000, 6).alias("var_value"),
        F.when(var_c > 0, F.round(skew, 6)).alias("skewness"),
    )


# ------------------------------------------------- linear counting

LC_M = 65_536  # bitmap bits (8 KB): load stays < 3 for every keyed column


def _lc_pos_sql(tag: str, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{tag}:' || CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {LC_M})"
    )


def _lc_pos(tag: str, key) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{tag}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % LC_M
    )


_LC_KEYS = (  # (tag, table, column)
    ("l_partkey", "lineitem", "l_partkey"),
    ("l_suppkey", "lineitem", "l_suppkey"),
    ("l_orderkey", "lineitem", "l_orderkey"),
)


@register(
    "sketch_linear_counting",
    oracle=f"""
    WITH pos AS (
      {" UNION ALL ".join(f"SELECT '{t}' AS key_name, {_lc_pos_sql(t, c)} AS p, {c} AS k FROM {tbl}" for t, tbl, c in _LC_KEYS)}
    ),
    agg AS (
      SELECT key_name,
             CAST(count(DISTINCT p) AS BIGINT) AS filled,
             CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
      FROM pos GROUP BY key_name
    )
    SELECT key_name, {LC_M} AS m, filled, exact_distinct,
           CAST(round(-{LC_M} * ln(CAST({LC_M} - filled AS DOUBLE) / {LC_M})) AS BIGINT)
             AS est_distinct,
           CAST(round(-{LC_M} * ln(CAST({LC_M} - filled AS DOUBLE) / {LC_M})) AS BIGINT)
             - exact_distinct AS err
    FROM agg
    """,
    tags=("sketch", "distinct", "linear-counting"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation by linear counting (Whang et al. 1990)
    — the engine-replayable cousin of HLL (whose binary sketches are
    engine-specific, so ``agg_approx_distinct_users`` is rows-only):
    each key hashes to one bit of an m={LC_M} bitmap and the estimate
    is -m·ln(empty/m), checked against the exact distinct count for
    three lineitem key columns of different cardinalities.

    Scale design: the bitmap build is a map-side-combinable distinct on
    (key_name, bit) — at most {LC_M} rows per column survive per map
    task, so reduce input is bounded by (tasks x m) regardless of data
    volume, and bitmaps merge across days/streams by OR (union of set
    bits).  The exact side is the verification piece you'd drop at
    100 TB.  The single float op (one ln, rounded to an integer) is the
    only library call — an ulp difference cannot flip the rounded
    integer except exactly at a .5 boundary."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey"
    )
    sides = []
    for tag, _tbl, c in _LC_KEYS:
        sides.append(
            li.select(
                F.lit(tag).alias("key_name"),
                _lc_pos(tag, F.col(c)).alias("p"),
                F.col(c).alias("k"),
            )
        )
    pos = sides[0]
    for s in sides[1:]:
        pos = pos.unionByName(s)
    agg = pos.groupBy("key_name").agg(
        F.count_distinct("p").alias("filled"),
        F.count_distinct("k").alias("exact_distinct"),
    )
    est = F.round(
        -F.lit(LC_M) * F.log((F.lit(LC_M) - F.col("filled")).cast("double") / LC_M)
    ).cast("long")
    return agg.select(
        "key_name",
        F.lit(LC_M).alias("m"),
        "filled",
        "exact_distinct",
        est.alias("est_distinct"),
        (est - F.col("exact_distinct")).alias("err"),
    )


# ------------------------------------------------- HyperLogLog registers
# Arithmetic lives in functions/hll.py, shared with the streaming
# counter (streaming/distinct_index.py); this query instantiates it at
# p=12 over three lineitem key columns and pins it against the exact
# distinct counts.

HLL_P = 12  # bucket bits
HLL_M = 1 << HLL_P  # 4096 registers (~4 KB of byte registers for real)
HLL_RMAX = _hll.rmax(HLL_P)  # 37: 36 remainder bits (48-bit hash - p) + 1
HLL_ALPHA = _hll.alpha(HLL_P)  # Flajolet bias constant, repr-inlined
HLL_C = _hll.scale_c(HLL_P)  # m^2 * 2^37 = 2^61, double-exact

_hll_h = _hll.hash48
_hll_h_sql = _hll.hash48_sql
_HLL_RHO_SQL = _hll.rho_sql(HLL_P)


@register(
    "sketch_hll_registers",
    oracle=f"""
    WITH base AS (
      {" UNION ALL ".join(f"SELECT '{t}' AS key_name, {_hll_h_sql(t, c)} AS h, {c} AS k FROM {tbl}" for t, tbl, c in _LC_KEYS)}
    ),
    regs AS (
      SELECT key_name, h % {HLL_M} AS bucket, MAX({_HLL_RHO_SQL}) AS r
      FROM base GROUP BY key_name, h % {HLL_M}
    ),
    agg AS (
      SELECT key_name, CAST(count(*) AS BIGINT) AS filled,
             CAST(SUM(1::BIGINT << ({HLL_RMAX} - r)) AS BIGINT) AS s_part
      FROM regs GROUP BY key_name
    ),
    ex AS (
      SELECT key_name, CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct
      FROM base GROUP BY key_name
    ),
    est AS (
      SELECT a.key_name, a.filled, e.exact_distinct,
             CAST(round({HLL_ALPHA!r} * CAST({HLL_C} AS DOUBLE)
                        / CAST(a.s_part + ({HLL_M} - a.filled)
                               * (1::BIGINT << {HLL_RMAX}) AS DOUBLE))
                  AS BIGINT) AS raw_est
      FROM agg a JOIN ex e USING (key_name)
    ),
    corrected AS (
      SELECT key_name, filled, exact_distinct, raw_est,
             CASE WHEN filled < {HLL_M} AND raw_est * 2 < 5 * {HLL_M}
                  THEN CAST(round(-{HLL_M} * ln(CAST({HLL_M} - filled AS DOUBLE)
                                                / {HLL_M})) AS BIGINT)
                  ELSE raw_est END AS est_distinct
      FROM est
    )
    SELECT key_name, {HLL_M} AS m, filled, raw_est, est_distinct, exact_distinct,
           est_distinct - exact_distinct AS err
    FROM corrected
    """,
    tags=("sketch", "distinct", "hll"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation by explicit HyperLogLog registers
    (Flajolet et al. 2007) with the small-range linear-counting
    correction — the oracle-checkable counterpart of
    ``agg_approx_distinct_users`` (whose engine-internal HLL++ sketch
    bytes are not portable, forcing a rows-only check).  Here the full
    register pipeline is md5-derived integer arithmetic both engines
    replay bit-exactly: a 48-bit hash splits into a {HLL_P}-bit bucket
    and a 36-bit remainder whose leading-zero rank is
    ``{HLL_RMAX} - bit_length`` (bit_length = ``length(bin(w))`` —
    string length of the binary rendering, no float log2 anywhere), and
    the harmonic mean is computed on INTEGERS by scaling 2^-r terms by
    2^{HLL_RMAX} (empty registers contribute 2^{HLL_RMAX} each; the sum
    is <= m * 2^{HLL_RMAX} = 2^49, well inside BIGINT).  The only float
    ops are the final alpha*2^61/s estimate and the small-range ln, each
    a single correctly-rounded-literal expression evaluated identically
    by both engines and immediately rounded to an integer.

    Scale design: registers reduce by MAX — map-side partial max bounds
    reduce input at (tasks x m) rows regardless of data volume, and
    sketches for different days/streams/partitions merge by the same
    register-wise max (the HLL merge law), making this a one-pass,
    shuffle-bounded, associatively-mergeable distinct count.  Checked
    against the exact distinct count for three lineitem key columns
    whose cardinalities straddle the correction cutoff (2.5m), so BOTH
    the raw-harmonic path and the linear-counting path execute.

    Reference scope note: the reference engine (quick-stream) has no
    sketch layer; this extends the warehouse tier per SURVEY §2.3."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey"
    )
    reg_sides, ex_sides = [], []
    for tag, _tbl, c in _LC_KEYS:
        reg_sides.append(
            _hll.register_table(li, tag, F.col(c), HLL_P).select(
                F.lit(tag).alias("key_name"), "bucket", "r"
            )
        )
        ex_sides.append(
            li.groupBy()
            .agg(F.count_distinct(c).alias("exact_distinct"))
            .select(F.lit(tag).alias("key_name"), "exact_distinct")
        )
    regs = reg_sides[0]
    for s in reg_sides[1:]:
        regs = regs.unionByName(s)
    ex = ex_sides[0]
    for s in ex_sides[1:]:
        ex = ex.unionByName(s)
    est = _hll.estimate(regs, HLL_P, ("key_name",)).join(ex, "key_name")
    return est.select(
        "key_name",
        F.lit(HLL_M).alias("m"),
        "filled",
        "raw_est",
        "est_distinct",
        "exact_distinct",
        (F.col("est_distinct") - F.col("exact_distinct")).alias("err"),
    )


# ------------------------------------- sketch set operations (theta-style)

SO_M = 16384  # bitmap bits: load stays < 1 per segment at test SF
SO_PIVOT = "1998-05-28"  # lineitem shipdate median: h1/h2 segments


def _so_pos_sql(key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('so:' || CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {SO_M})"
    )


_SO_EST_SQL = "CAST(round(-{m} * ln(CAST({m} - {f} AS DOUBLE) / {m})) AS BIGINT)".format


@register(
    "sketch_set_ops_distinct",
    oracle=f"""
    WITH base AS (
      SELECT {_so_pos_sql("l_orderkey")} AS p, l_orderkey AS k,
             l_shipdate < DATE '{SO_PIVOT}' AS in_h1
      FROM lineitem
    ),
    agg AS (
      SELECT
        CAST(count(DISTINCT CASE WHEN in_h1 THEN p END) AS BIGINT) AS f1,
        CAST(count(DISTINCT CASE WHEN NOT in_h1 THEN p END) AS BIGINT) AS f2,
        CAST(count(DISTINCT p) AS BIGINT) AS fu,
        CAST(count(DISTINCT CASE WHEN in_h1 THEN k END) AS BIGINT) AS x1,
        CAST(count(DISTINCT CASE WHEN NOT in_h1 THEN k END) AS BIGINT) AS x2,
        CAST(count(DISTINCT k) AS BIGINT) AS xu
      FROM base
    ),
    est AS (
      SELECT {_SO_EST_SQL(m=SO_M, f="f1")} AS e1,
             {_SO_EST_SQL(m=SO_M, f="f2")} AS e2,
             {_SO_EST_SQL(m=SO_M, f="fu")} AS eu,
             x1, x2, xu
      FROM agg
    )
    SELECT 'ship_h1' AS set_name, e1 AS est_distinct, x1 AS exact_distinct,
           e1 - x1 AS err FROM est
    UNION ALL
    SELECT 'ship_h2', e2, x2, e2 - x2 FROM est
    UNION ALL
    SELECT 'union', eu, xu, eu - xu FROM est
    UNION ALL
    SELECT 'intersect', e1 + e2 - eu, x1 + x2 - xu,
           (e1 + e2 - eu) - (x1 + x2 - xu) FROM est
    """,
    tags=("sketch", "distinct", "set-ops"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def sketch_set_ops_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations on distinct-count sketches — the theta-sketch
    workload (Dasgupta et al., DataSketches): how many distinct orders
    shipped lineitems in BOTH halves of the time range (the straddling
    band), without ever materializing
    the intersection?  Each segment keeps a {SO_M}-bit linear-counting
    bitmap (segment bitmaps merge by OR, so the union estimate comes
    from the OR'd bitmap = the distinct positions over both segments in
    one pass) and the intersection is inclusion-exclusion over the three
    ROUNDED integer estimates — pure integer arithmetic after three
    single-ln estimates, deterministic in both engines.  The exact
    side (distinct parts per segment) verifies every leg, intersection
    included, via the same inclusion-exclusion identity on exact counts.
    Orders are the key precisely because most ship entirely on one side
    of the pivot: the segments genuinely partially overlap, so the
    intersection estimate is a real derived quantity, not a subset
    degenerate.

    Scale design: ONE pass over lineitem; the shuffle carries at most
    3 x {SO_M} distinct (segment, bit) pairs per map task regardless of
    volume (map-side-combinable distinct), and per-segment bitmaps are
    the persistable state — daily sketches union by bit-OR exactly like
    production theta/HLL set-op pipelines, with intersection always
    derived, never joined.

    Reference scope note: extends the warehouse tier per SURVEY §2.3;
    no counterpart in the reference engine."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
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
    in_h1 = F.col("l_shipdate") < F.lit(SO_PIVOT).cast("date")
    base = li.select(
        pos.alias("p"), F.col("l_orderkey").alias("k"), in_h1.alias("in_h1")
    )
    agg = base.agg(
        F.count_distinct(F.when(F.col("in_h1"), F.col("p"))).alias("f1"),
        F.count_distinct(F.when(~F.col("in_h1"), F.col("p"))).alias("f2"),
        F.count_distinct("p").alias("fu"),
        F.count_distinct(F.when(F.col("in_h1"), F.col("k"))).alias("x1"),
        F.count_distinct(F.when(~F.col("in_h1"), F.col("k"))).alias("x2"),
        F.count_distinct("k").alias("xu"),
    )

    def _est(f: str) -> F.Column:
        return F.round(
            -F.lit(SO_M) * F.log((F.lit(SO_M) - F.col(f)).cast("double") / SO_M)
        ).cast("long")

    one = agg.select(
        _est("f1").alias("e1"),
        _est("f2").alias("e2"),
        _est("fu").alias("eu"),
        "x1",
        "x2",
        "xu",
    )
    rows = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("ship_h1").alias("set_name"),
                    F.col("e1").alias("est_distinct"),
                    F.col("x1").alias("exact_distinct"),
                    (F.col("e1") - F.col("x1")).alias("err"),
                ),
                F.struct(
                    F.lit("ship_h2").alias("set_name"),
                    F.col("e2").alias("est_distinct"),
                    F.col("x2").alias("exact_distinct"),
                    (F.col("e2") - F.col("x2")).alias("err"),
                ),
                F.struct(
                    F.lit("union").alias("set_name"),
                    F.col("eu").alias("est_distinct"),
                    F.col("xu").alias("exact_distinct"),
                    (F.col("eu") - F.col("xu")).alias("err"),
                ),
                F.struct(
                    F.lit("intersect").alias("set_name"),
                    (F.col("e1") + F.col("e2") - F.col("eu")).alias("est_distinct"),
                    (F.col("x1") + F.col("x2") - F.col("xu")).alias("exact_distinct"),
                    (
                        (F.col("e1") + F.col("e2") - F.col("eu"))
                        - (F.col("x1") + F.col("x2") - F.col("xu"))
                    ).alias("err"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rows
