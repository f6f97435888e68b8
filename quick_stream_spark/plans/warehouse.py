"""Warehouse-pattern operators: co-purchase affinity, SCD2 history
builds, Bloom-filter join pruning, and Z-order layout for data
skipping.  Each declares a classic large-scale warehouse/lakehouse
technique as a deterministic, DuckDB-replayable query so the full
arithmetic — not just row counts — is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import pin_session, sql_dsum
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table

# module-level oracle builders below dereference entries text.py
# registers (e.g. dedup_minhash_lsh); importing it here makes this
# module import-order-independent (registry._load_all imports text
# first, but a test file importing warehouse alone must work too)
import quick_stream_spark.plans.text  # noqa: E402,F401  (registration order)

# ------------------------------------------------------- market basket

BASKET_TOPK = 30


@register(
    "orders_market_basket",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM lineitem),
    singles AS (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.p1, p.p2, p.n_both, s1.n_part AS n_p1, s2.n_part AS n_p2,
           round(p.n_both * 1.0 / (SELECT n FROM n_orders), 6) AS support,
           round(p.n_both * 1.0 * (SELECT n FROM n_orders)
                 / (s1.n_part * s2.n_part), 6) AS lift
    FROM pairs p
    JOIN singles s1 ON p.p1 = s1.l_partkey
    JOIN singles s2 ON p.p2 = s2.l_partkey
    ORDER BY p.n_both DESC, p.p1 ASC, p.p2 ASC
    LIMIT {BASKET_TOPK}
    """,
    tags=("warehouse", "affinity", "basket"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the top-{BASKET_TOPK} co-purchased part
    pairs with support and lift — the exact pair-counting core of
    association-rule mining (the candidate-generation step FP-growth
    approximates at higher k).

    Scale design: pair generation is ROW-LOCAL — parts are collected
    per order (baskets are small by nature; TPC-H orders hold <= 13
    distinct parts, so <= 78 pairs per basket) and pairs explode from
    the sorted basket array, never via an order-level self-join through
    a shuffle.  One groupBy for baskets, one for pair counts, two
    equi-joins against the bounded per-part counts, and the top-k
    compiles to TakeOrderedAndProject.  The order count crosses the
    driver as one scalar."""
    pin_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    n_orders = op.select("l_orderkey").distinct().count()  # one bounded scalar
    baskets = op.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    idx = F.sequence(F.lit(0), F.size("parts") - 1)
    pairs_arr = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(
                    F.col("parts"), i + 2, F.greatest(F.size("parts") - i - 1, F.lit(0))
                ),
                lambda q: F.struct(
                    F.element_at(F.col("parts"), i + 1).alias("p1"), q.alias("p2")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pairs_arr).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    singles = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    s1 = singles.select(F.col("l_partkey").alias("p1"), F.col("n_part").alias("n_p1"))
    s2 = singles.select(F.col("l_partkey").alias("p2"), F.col("n_part").alias("n_p2"))
    return (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .select(
            "p1",
            "p2",
            "n_both",
            "n_p1",
            "n_p2",
            F.round(F.col("n_both") / F.lit(n_orders), 6).alias("support"),
            F.round(
                F.col("n_both") * F.lit(n_orders) / (F.col("n_p1") * F.col("n_p2")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), F.asc("p1"), F.asc("p2"))
        .limit(BASKET_TOPK)
    )


# ------------------------------------------------------------- SCD2

@register(
    "events_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IS DISTINCT FROM
                       lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version_id
      FROM ordered
    ),
    collapsed AS (
      SELECT user_id, version_id, event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM versions GROUP BY user_id, version_id, event_type
    )
    SELECT user_id, CAST(version_id AS BIGINT) AS version_id, event_type,
           valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_id)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version_id)
             IS NULL AS is_current,
           n_events
    FROM collapsed
    """,
    tags=("warehouse", "scd2", "window"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: per
    user, consecutive runs of the same event_type collapse into one
    versioned row with [valid_from, valid_to) validity and an
    is_current flag — the change-capture -> dimension-history pattern
    every warehouse ingest runs.

    Scale design: everything partitions by the dimension key (user_id)
    — one shuffle, then three window passes and a groupBy within each
    key's partition; no self-joins.  Ties (same-ts events) are ordered
    by event_id in BOTH engines so run boundaries are deterministic.
    At 100 TB this is the canonical key-partitioned window shape; a
    skewed key degrades one partition, not the plan."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
    ).otherwise(0)
    versions = ev.withColumn(
        "version_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    collapsed = versions.groupBy("user_id", "version_id", "event_type").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version_id")
    valid_to = F.lead("valid_from").over(wv)
    return collapsed.select(
        "user_id",
        "version_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


# ------------------------------------------------- bloom-filter pruning

BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions
HOT_BAL = 7000.0


def _bloom_pos_sql(j: int, key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{j}:' || CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {BLOOM_M})"
    )


def _bloom_pos(j: int, key) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


@register(
    "join_bloom_pruned",
    oracle=f"""
    WITH hot AS (SELECT c_custkey FROM customer WHERE c_acctbal > {HOT_BAL}),
    bits AS (
      SELECT DISTINCT j, pos FROM (
        {" UNION ALL ".join(f"SELECT {j} AS j, {_bloom_pos_sql(j, 'c_custkey')} AS pos FROM hot" for j in range(BLOOM_K))}
      )
    ),
    probe AS (
      SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
    ),
    probe_hits AS (
      SELECT p.o_custkey, count(*) AS n_hits FROM (
        {" UNION ALL ".join(f"SELECT o_custkey, {j} AS j, {_bloom_pos_sql(j, 'o_custkey')} AS pos FROM (SELECT DISTINCT o_custkey FROM orders)" for j in range(BLOOM_K))}
      ) p JOIN bits b ON p.j = b.j AND p.pos = b.pos
      GROUP BY 1
    )
    SELECT pr.o_custkey, pr.n_orders,
           coalesce(ph.n_hits, 0) = {BLOOM_K} AS passes_bloom,
           pr.o_custkey IN (SELECT c_custkey FROM hot) AS is_hot
    FROM probe pr LEFT JOIN probe_hits ph ON pr.o_custkey = ph.o_custkey
    """,
    tags=("warehouse", "bloom", "join-pruning"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, the runtime-filter pattern Spark
    itself applies inside AQE (spark.sql.optimizer.runtime.bloomFilter)
    made explicit and oracle-checkable: an m={BLOOM_M}/k={BLOOM_K}
    filter is built over the hot customers (acctbal > {HOT_BAL}),
    orders probe it, and the result labels every probe key with
    passes_bloom vs is_hot ground truth — false positives are the
    passes_bloom AND NOT is_hot rows (one-sided error: no false
    negatives, ever, by construction).

    Scale design: the filter build is a map-side-combinable distinct on
    (hash-row, bit) — at most {BLOOM_K}x{BLOOM_M} = {BLOOM_K * BLOOM_M}
    bits regardless of build-side volume, the definition of a bounded
    broadcastable artifact; the probe is {BLOOM_K} bounded-key lookups
    per distinct probe key.  This is the pre-shuffle pruning you deploy
    when the build side is too big to broadcast as keys but its Bloom
    bits fit in one packet."""
    pin_session(spark)
    hot = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > HOT_BAL)
        .select("c_custkey")
    )
    bits = (
        hot.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bloom_pos(j, F.col("c_custkey")).alias("pos"),
                        )
                        for j in range(BLOOM_K)
                    ]
                )
            ).alias("b")
        )
        .select("b.j", "b.pos")
        .distinct()
    )
    probe = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    probe_pos = probe.select(
        "o_custkey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bloom_pos(j, F.col("o_custkey")).alias("pos"),
                    )
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("b"),
    ).select("o_custkey", "b.j", "b.pos")
    hits = (
        probe_pos.join(F.broadcast(bits), ["j", "pos"])
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    hot_flag = hot.select(F.col("c_custkey").alias("o_custkey"), F.lit(True).alias("_hot"))
    return (
        probe.join(hits, "o_custkey", "left")
        .join(F.broadcast(hot_flag), "o_custkey", "left")
        .select(
            "o_custkey",
            "n_orders",
            (F.coalesce(F.col("n_hits"), F.lit(0)) == BLOOM_K).alias("passes_bloom"),
            F.coalesce(F.col("_hot"), F.lit(False)).alias("is_hot"),
        )
    )


# ---------------------------------------------------- z-order layout

Z_BITS = 12  # covers custkey 0..1499 and ~2400 order days
Z_FILES = 16
_Z_EPOCH = "1995-01-01"


def _interleave_sql(x: str, y: str) -> str:
    """DuckDB bit-interleave: x in even positions, y in odd."""
    terms = []
    for b in range(Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def _interleave_spark(x: str, y: str) -> F.Column:
    terms = []
    for b in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({x}, {b}) & 1, {2 * b})")
        terms.append(f"shiftleft(shiftright({y}, {b}) & 1, {2 * b + 1})")
    return F.expr(" + ".join(terms))


@register(
    "maintenance_zorder_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', TIMESTAMP '{_Z_EPOCH}', o_orderdate) AS d
      FROM orders
    ),
    ranked AS (
      SELECT o_orderkey, o_custkey, d,
             ntile({1 << Z_BITS}) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS cr,
             ntile({1 << Z_BITS}) OVER (ORDER BY d, o_orderkey) - 1 AS dr
      FROM keyed
    ),
    z AS (
      SELECT o_orderkey, o_custkey, d,
             {_interleave_sql("cr", "dr")} AS zval
      FROM ranked
    ),
    filed AS (
      SELECT o_custkey, d,
             ntile({Z_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id
      FROM z
    )
    SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
           min(o_custkey) AS min_custkey, max(o_custkey) AS max_custkey,
           min(d) AS min_day, max(d) AS max_day
    FROM filed GROUP BY file_id
    """,
    tags=("warehouse", "zorder", "data-skipping"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def maintenance_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering for data skipping (Delta OPTIMIZE ZORDER BY
    analog): orders are laid out by the interleaved-bit Morton code of
    (o_custkey, order-day) into {Z_FILES} equal files, and the query
    returns each file's min/max zone map for BOTH dimensions — the
    stats a scan consults to skip files.  Unlike a linear sort (tight
    on one column, full-range on the other), every Z-ordered file
    covers a narrow rectangle in both dimensions, so point/range
    predicates on EITHER column prune files
    (tests/test_warehouse_zorder.py asserts the skipping win
    quantitatively).

    The code interleaves {Z_BITS}-bit RANK buckets, not raw values —
    range-based interleaving, the same choice Delta's Z-order makes:
    raw-value interleaving silently degrades to a one-column sort
    whenever the dimensions' effective bit widths differ (a 150-key
    custkey domain contributes 8 meaningful bits against the day
    column's 11, so the top Morton bits would all be day bits —
    measured on this corpus as zero custkey pruning).

    Scale design: the Morton code is a row-local bit expression
    (whole-stage codegen, no UDF); the production layout step computes
    the rank-bucket boundaries from column statistics (approximate
    quantiles) and then runs ``repartitionByRange(zval)`` + write — one
    range shuffle, exactly what a linear sort costs.  The ntiles here
    stand in for those boundary lookups so the assignment is
    deterministic and DuckDB-replayable; zone-map stats are one groupBy
    over {Z_FILES} groups."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH).cast("date")).alias("d"),
    )
    tiles = 1 << Z_BITS
    ranked = o.select(
        "o_orderkey",
        "o_custkey",
        "d",
        (F.ntile(tiles).over(Window.orderBy("o_custkey", "o_orderkey")) - 1).alias("cr"),
        (F.ntile(tiles).over(Window.orderBy("d", "o_orderkey")) - 1).alias("dr"),
    )
    z = ranked.select(
        "o_orderkey",
        "o_custkey",
        "d",
        _interleave_spark("cr", "dr").alias("zval"),
    )
    filed = z.select(
        "o_custkey",
        "d",
        F.ntile(Z_FILES).over(Window.orderBy("zval", "o_orderkey")).alias("file_id"),
    )
    return filed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_custkey").alias("min_custkey"),
        F.max("o_custkey").alias("max_custkey"),
        F.min("d").alias("min_day"),
        F.max("d").alias("max_day"),
    )


# ------------------------------------------------- journey transitions

@register(
    "events_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    pairs AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM ordered WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    totals AS (SELECT src, sum(n) AS n_src FROM pairs GROUP BY src)
    SELECT p.src, p.dst, p.n,
           round(p.n * 1.0 / t.n_src, 6) AS prob
    FROM pairs p JOIN totals t USING (src)
    """,
    tags=("warehouse", "markov", "journey"),  # exported r9 rotation (was pytest-tier while the window was full)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user journeys: for
    every (event_type -> next event_type) step within a user's
    time-ordered stream, the transition count and conditional
    probability — the user-journey / next-action model behind funnel
    and churn analysis.

    Scale design: one shuffle partitions by user for the lead() pass
    (same-ts ties ordered by event_id in both engines), then the pair
    count partial-aggregates map-side into at most |event types|^2
    groups — a bounded transition matrix regardless of event volume;
    the per-source totals reuse the already-aggregated pairs (rows =
    matrix cells, not events)."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pairs.join(totals, "src").select(
        "src", "dst", "n", F.round(F.col("n") / F.col("n_src"), 6).alias("prob")
    )


# ------------------------------------------------- triangle counting

@register(
    "graph_triangles_dupgraph",
    oracle=None,  # set below: shares the minhash pair CTEs
    tags=("graph", "triangles"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def graph_triangles_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the near-dup pair graph — the clustering
    structure metric (a clique-like duplicate cluster yields C(k,3)
    triangles; a chain yields none): per-vertex triangle counts plus
    the graph total.

    Scale design: the canonical two-join algorithm on DIRECTED edges
    (id_a < id_b as produced by the LSH pair step, so each triangle is
    counted exactly once as a < b < c): wedges = edges(a,b) join
    edges(b,c), closed by joining (a,c) against the edge set.  At
    cluster scale the standard refinement orders edges by degree so
    wedge generation is bounded by arboricity; near-dup graphs are
    small-component graphs (bounded by MAX_BUCKET_SIZE capping), so
    the wedge join is already safe here.  Per-vertex counts credit
    every corner via one explode + groupBy."""
    from quick_stream_spark.plans.text import dedup_minhash_lsh

    pin_session(spark)
    e = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    ab = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    bc = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    ac = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])  # closure check: (a, c) must be an edge
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    total = tri.count()  # bounded scalar for the summary column
    return corners.select("id", "n_triangles", F.lit(total).alias("total_triangles"))


def _triangles_oracle() -> str:
    from quick_stream_spark.plans.registry import REGISTRY as _R

    pairs_sql = _R["dedup_minhash_lsh"].oracle
    return f"""
    WITH pairs AS ({pairs_sql}),
    e AS (SELECT id_a, id_b FROM pairs),
    tri AS (
      SELECT ab.id_a AS a, ab.id_b AS b, bc.id_b AS c
      FROM e ab
      JOIN e bc ON ab.id_b = bc.id_a
      JOIN e ac ON ac.id_a = ab.id_a AND ac.id_b = bc.id_b
    ),
    corners AS (
      SELECT v AS id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS v FROM tri UNION ALL
        SELECT b FROM tri UNION ALL
        SELECT c FROM tri
      ) GROUP BY v
    )
    SELECT id, n_triangles,
           (SELECT CAST(coalesce(sum(1), 0) AS BIGINT) FROM tri) AS total_triangles
    FROM corners
    """


from quick_stream_spark.plans.registry import REGISTRY as _WREG  # noqa: E402

_WREG["graph_triangles_dupgraph"].oracle = " ".join(_triangles_oracle().split())


# ------------------------------------------------- RFM segmentation

@register(
    "orders_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             {sql_dsum("o_totalprice", "monetary")}
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, 0.5) AS r_med,
             quantile_cont(frequency, 0.5) AS f_med,
             quantile_cont(monetary, 0.5) AS m_med
      FROM per_cust
    )
    SELECT p.o_custkey, p.recency_days, p.frequency, p.monetary,
           CASE WHEN p.recency_days <= c.r_med AND p.frequency > c.f_med
                     AND p.monetary > c.m_med THEN 'champion'
                WHEN p.recency_days <= c.r_med AND p.frequency > c.f_med
                  THEN 'loyal'
                WHEN p.recency_days <= c.r_med THEN 'recent'
                WHEN p.frequency > c.f_med OR p.monetary > c.m_med
                  THEN 'at_risk_valuable'
                ELSE 'hibernating' END AS segment
    FROM per_cust p, cuts c
    """,
    tags=("warehouse", "rfm", "segmentation"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order,
    anchored to the corpus max date so the query is reproducible),
    frequency (order count) and monetary (exact decimal spend) per
    customer, segmented against median cuts into the classic
    champion / loyal / recent / at-risk-valuable / hibernating tiers.

    Scale design: one groupBy on the customer key builds the RFM
    table; the cuts are THREE SCALARS from a percentile aggregate
    (approx_percentile at 100 TB — values change, shape doesn't),
    broadcast into a map-only CASE — never a global rank window over
    customers."""
    from quick_stream_spark.plans._util import dsum

    pin_session(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("maxd"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("o_totalprice", "monetary"),
        )
    )
    cuts = per_cust.agg(
        F.percentile("recency_days", F.lit(0.5)).alias("r_med"),
        F.percentile("frequency", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
    )
    seg = (
        F.when(
            (F.col("recency_days") <= F.col("r_med"))
            & (F.col("frequency") > F.col("f_med"))
            & (F.col("monetary") > F.col("m_med")),
            "champion",
        )
        .when(
            (F.col("recency_days") <= F.col("r_med"))
            & (F.col("frequency") > F.col("f_med")),
            "loyal",
        )
        .when(F.col("recency_days") <= F.col("r_med"), "recent")
        .when(
            (F.col("frequency") > F.col("f_med"))
            | (F.col("monetary") > F.col("m_med")),
            "at_risk_valuable",
        )
        .otherwise("hibernating")
    )
    return (
        per_cust.crossJoin(F.broadcast(cuts))
        .select(
            "o_custkey", "recency_days", "frequency", "monetary", seg.alias("segment")
        )
    )


# ------------------------------------------------- range-frame windows

@register(
    "window_range_frame_rolling",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("warehouse", "window", "range-frame"),
)
def window_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windows — the time-based sibling of the ROWS frames
    used elsewhere in the corpus: for every event, the count and exact
    decimal sum of the SAME user's events in the trailing hour,
    bounded by event-time distance (RANGE BETWEEN 3600 PRECEDING),
    not row position — rows outside the hour are excluded however many
    there are, and same-second peers are always included together.

    Scale design: one shuffle on user_id; within each partition the
    running frame is maintained by a sliding aggregate over the
    time-sorted rows (Spark evaluates range frames incrementally, not
    per-row rescans).  The epoch-seconds ordering key makes the frame
    arithmetic integer-exact and engine-identical."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


# ------------------------------------------------- last-touch attribution

ATTR_WINDOW_MIN = 30


@register(
    "events_attribution_last_touch",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS) OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS) OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    attributed AS (
      SELECT CASE WHEN touch_ts IS NOT NULL
                   AND ts - touch_ts <= INTERVAL '{ATTR_WINDOW_MIN} minutes'
                  THEN touch_type ELSE 'direct' END AS channel
      FROM ordered WHERE event_type = 'purchase'
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases
    FROM attributed GROUP BY channel
    """,
    tags=("warehouse", "attribution", "window"),  # exported r9 rotation (was pytest-tier while the window was full)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the SAME
    user's most recent preceding non-purchase event within
    {ATTR_WINDOW_MIN} minutes, else 'direct' — the marketing-analytics
    sibling of the as-of join, expressed as one pass instead of a
    range join.

    Scale design: single shuffle on user_id; last_value IGNORE NULLS
    over a rows-preceding frame finds the prior touch in one
    time-sorted pass (no per-purchase range join, no event
    duplication), same-ts ties ordered by event_id in both engines.
    The attribution cutoff is evaluated row-locally afterward."""
    pin_session(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("event_type") != "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    attributed = (
        ev.select(
            "event_type",
            "ts",
            touch_type.alias("touch_type"),
            touch_ts.alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("touch_ts").isNotNull()
                & (
                    F.col("ts").cast("long") - F.col("touch_ts").cast("long")
                    <= ATTR_WINDOW_MIN * 60
                ),
                F.col("touch_type"),
            )
            .otherwise("direct")
            .alias("channel")
        )
    )
    return attributed.groupBy("channel").agg(F.count(F.lit(1)).alias("n_purchases"))


# ------------------------------------------------- data-quality constraints


@register(
    "quality_constraint_report",
    oracle="""
    WITH o AS (
      SELECT CAST(count(*) AS BIGINT) AS checked,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS v_null,
             CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS v_range,
             CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                  AS BIGINT) AS v_domain
      FROM orders
    ),
    l AS (
      SELECT CAST(count(*) AS BIGINT) AS checked,
             CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
               AS v_unique,
             CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                  AS BIGINT) AS v_range,
             CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                  AS BIGINT) AS v_disc
      FROM lineitem
    ),
    fk AS (
      SELECT CAST(count(*) AS BIGINT) AS checked,
             CAST(count(*) FILTER (
               WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                  AS BIGINT) AS v
      FROM orders
    )
    SELECT * FROM (
      SELECT 'orders.o_orderkey unique' AS constraint, checked, v_unique AS violations FROM o
      UNION ALL SELECT 'orders.o_custkey not_null', checked, v_null FROM o
      UNION ALL SELECT 'orders.o_totalprice positive', checked, v_range FROM o
      UNION ALL SELECT 'orders.o_orderstatus in_domain', checked, v_domain FROM o
      UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber) unique', checked, v_unique FROM l
      UNION ALL SELECT 'lineitem.l_quantity in_range[1,50]', checked, v_range FROM l
      UNION ALL SELECT 'lineitem.l_discount in_range[0,1]', checked, v_disc FROM l
      UNION ALL SELECT 'orders.o_custkey fk_customer', checked, v FROM fk
    )
    """,
    tags=("warehouse", "quality", "constraints"),
    bench=True,  # LLM-pipeline tier benched at sf0.1 (r4),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def quality_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint checking (the Deequ pattern,
    Schelter et al., VLDB 2018): uniqueness, completeness, range,
    domain and referential-integrity checks compiled into ONE fused
    aggregation pass per table — eight constraints cost two scans plus
    one FK probe, not eight jobs, which is the difference between a
    nightly audit and an every-commit gate at 100 TB.  The FK check is
    a broadcast LEFT OUTER ``_fk_hit`` marker against the DISTINCT
    customer keys, folded into the orders aggregate (membership
    semantics — a row is a violation iff its key is absent); every
    metric is an exact count, so the report hash-matches the oracle.
    Output: one row per constraint with checked/violation counts."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    # FK membership folded into the SAME orders pass: a broadcast LEFT
    # OUTER probe against the (small) customer dimension marks each row,
    # so ALL five orders metrics — incl. the referential check — cost
    # ONE scan (was: three separate orders scans across o_agg, the
    # semi-join flag pass, and the fk count).  Guide §2.4/§1.2: remove
    # whole passes before tuning anything inside them.
    # The broadcast side is DEDUPLICATED (r14 ADVICE): the left-outer
    # mark is only membership-equivalent to the oracle's NOT IN when
    # the dimension keys are unique — a duplicated c_custkey would fan
    # out orders rows and corrupt ALL five orders metrics.  distinct()
    # on the tiny dimension restores the duplicate-safety the replaced
    # left_semi path had, at negligible cost (one agg on the broadcast
    # side, still far under the broadcast threshold).
    o_marked = o.join(
        F.broadcast(
            c.select(F.col("c_custkey").alias("o_custkey"))
            .distinct()
            .withColumn("_fk_hit", F.lit(1))
        ),
        "o_custkey",
        "left",
    )
    o_agg = o_marked.agg(
        F.count(F.lit(1)).alias("checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_unique"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("v_null"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("v_range"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)).alias(
            "v_domain"
        ),
        F.count(F.when(F.col("_fk_hit").isNull(), 1)).alias("v_fk"),
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("checked"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("v_unique"),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("v_range"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("v_disc"),
    )

    # ONE eager job materializes every metric: the one-row aggregates
    # cross-join into a single 1x10 row, so Spark schedules the orders
    # and lineitem aggregation trees as parallel stages of one job
    # instead of three sequential driver-blocking checkpoints (guide
    # §2.6: overlap independent work; measured 3 jobs -> 1).
    l_named = l_agg.select(
        F.col("checked").alias("l_checked"),
        F.col("v_unique").alias("l_v_unique"),
        F.col("v_range").alias("l_v_range"),
        F.col("v_disc").alias("l_v_disc"),
    )
    combined = o_agg.crossJoin(l_named).localCheckpoint(eager=True)
    o_agg = combined.select(
        "checked", "v_unique", "v_null", "v_range", "v_domain"
    )
    l_agg = combined.select(
        F.col("l_checked").alias("checked"),
        F.col("l_v_unique").alias("v_unique"),
        F.col("l_v_range").alias("v_range"),
        F.col("l_v_disc").alias("v_disc"),
    )
    fk_agg = combined.select("checked", F.col("v_fk").alias("v"))

    def row(name: str, src, vcol: str):
        return src.select(
            F.lit(name).alias("constraint"),
            F.col("checked"),
            F.col(vcol).alias("violations"),
        )

    return (
        row("orders.o_orderkey unique", o_agg, "v_unique")
        .unionByName(row("orders.o_custkey not_null", o_agg, "v_null"))
        .unionByName(row("orders.o_totalprice positive", o_agg, "v_range"))
        .unionByName(row("orders.o_orderstatus in_domain", o_agg, "v_domain"))
        .unionByName(row("lineitem.(l_orderkey,l_linenumber) unique", l_agg, "v_unique"))
        .unionByName(row("lineitem.l_quantity in_range[1,50]", l_agg, "v_range"))
        .unionByName(row("lineitem.l_discount in_range[0,1]", l_agg, "v_disc"))
        .unionByName(row("orders.o_custkey fk_customer", fk_agg, "v"))
    )


# ------------------------------------------------------ fuzzy string join

FUZZY_OFFSET = 1_000_000
FUZZY_MAX_DIST = 2


# ONE definition of the corrupted-duplicate corpus shared by the fuzzy
# join and the entity-resolution pipeline (Spark side AND both oracles):
# a formula change here cannot desynchronize pair edges from cluster
# membership.
_FUZZY_CORPUS_CTES = """
    base AS (
      SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name
    ),
    corrupted AS (
      SELECT id + {off} AS id,
             substr(name, 1, CAST(id % (strpos(name, ' ') - 1) AS INT))
             || substr(name, CAST(id % (strpos(name, ' ') - 1) AS INT) + 2)
               AS name
      FROM base
    ),
    fuzzy_corpus AS (
      SELECT id, name, substr(name, strpos(name, ' ') + 1) AS noun FROM (
        SELECT id, name FROM base UNION ALL SELECT id, name FROM corrupted
      )
    )"""


def _fuzzy_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _FUZZY_CORPUS_CTES: (id, name, noun)."""
    p = load_table(spark, sf_dir, "part")
    base = p.groupBy(F.col("p_name").alias("name")).agg(
        F.min("p_partkey").alias("id")
    )
    corrupted = base.select(
        (F.col("id") + FUZZY_OFFSET).alias("id"),
        F.concat(
            F.expr("substring(name, 1, id % (instr(name, ' ') - 1))"),
            F.expr("substring(name, (id % (instr(name, ' ') - 1)) + 2)"),
        ).alias("name"),
    )
    return (
        base.select("id", "name")
        .unionByName(corrupted)
        .select(
            "id",
            "name",
            F.expr("substring(name, instr(name, ' ') + 1)").alias("noun"),
        )
    )


@register(
    "join_fuzzy_part_names",
    oracle=f"""
    WITH {_FUZZY_CORPUS_CTES.format(off=FUZZY_OFFSET)}
    SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
    FROM fuzzy_corpus a JOIN fuzzy_corpus b ON a.noun = b.noun AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    """,
    tags=("warehouse", "join", "fuzzy", "entity-resolution"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def join_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string join (entity resolution): find name pairs within
    edit distance {FUZZY_MAX_DIST} without the O(n^2) cross join —
    candidates are BLOCKED on a stable key (here the noun token, which
    the corruption never touches), then verified with exact
    Levenshtein, a built-in in both engines.  The corpus duplicates
    every distinct part name with one deterministic character deletion
    inside the first word (position = id mod word length), so true
    distance-1 matches exist by construction.

    Scale design: blocking turns the all-pairs problem into an
    equi-join whose cost is sum of block-size squares — the standard
    entity-resolution recipe (at production scale use several
    complementary blocking keys and union the candidates; a hot block
    gets the same salting/cap treatment as an LSH bucket).  The verify
    is row-local integer DP; nothing is approximate after blocking."""
    pin_session(spark)
    corpus = _fuzzy_corpus(spark, sf_dir)
    a = corpus.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "noun"
    )
    b = corpus.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "noun"
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "noun")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= FUZZY_MAX_DIST)
        .select("id_a", "id_b", "name_a", "name_b", dist.cast("long").alias("dist"))
    )


# ------------------------------------------------------- column profiling

_PROFILE_ARMS_SQL = """
      SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS vs,
             CAST(o_orderkey AS DOUBLE) AS vn FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR),
             CAST(o_custkey AS DOUBLE) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus, NULL FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
             o_totalprice FROM orders
      UNION ALL
      SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
             NULL FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority, NULL FROM orders
"""


@register(
    "profile_orders_columns",
    oracle=f"""
    WITH entries AS ({_PROFILE_ARMS_SQL}),
    vals AS (
      SELECT col_name, vs, CAST(count(*) AS BIGINT) AS cnt, min(vn) AS vn
      FROM entries GROUP BY col_name, vs
    ),
    tops AS (
      SELECT col_name, vs AS top_value, cnt AS top_count FROM (
        SELECT *, row_number() OVER (
          PARTITION BY col_name ORDER BY cnt DESC, vs ASC) AS rn
        FROM vals WHERE vs IS NOT NULL
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT col_name,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN vs IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
             CAST(COUNT(CASE WHEN vs IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
             MIN(vn) AS min_num, MAX(vn) AS max_num,
             MIN(vs) AS min_str, MAX(vs) AS max_str
      FROM vals GROUP BY col_name
    )
    SELECT s.col_name, s.n_rows, s.n_null, s.n_distinct,
           t.top_value, t.top_count, s.min_num, s.max_num, s.min_str, s.max_str
    FROM stats s JOIN tops t ON s.col_name = t.col_name
    """,
    tags=("warehouse", "quality", "profiling"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the Deequ/Glue-crawler analyzer pattern): per
    column — row/null/distinct counts, numeric min/max, lexicographic
    string min/max over a canonical rendering, and the most frequent
    value with a deterministic tie-break (count DESC, value ASC).

    Scale design: the table unpivots ROW-LOCALLY into (column, value)
    entries — one scan regardless of column count — then ONE
    map-combinable groupBy over (column, value) produces the
    distinct-value histogram every statistic derives from; the final
    per-column reductions run over that far smaller frame.  Canonical
    renderings (decimal(18,2) for doubles, fixed timestamp format)
    make the string domain engine-identical."""
    pin_session(spark)
    o = load_table(spark, sf_dir, "orders")
    null_d = F.lit(None).cast("double")

    def arm(name: str, vs, vn):
        return F.struct(
            F.lit(name).alias("col_name"), vs.alias("vs"), vn.alias("vn")
        )

    entries = o.select(
        F.explode(
            F.array(
                arm("o_orderkey", F.col("o_orderkey").cast("string"),
                    F.col("o_orderkey").cast("double")),
                arm("o_custkey", F.col("o_custkey").cast("string"),
                    F.col("o_custkey").cast("double")),
                arm("o_orderstatus", F.col("o_orderstatus"), null_d),
                arm("o_totalprice",
                    F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                    F.col("o_totalprice")),
                arm("o_orderdate",
                    F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), null_d),
                arm("o_orderpriority", F.col("o_orderpriority"), null_d),
            )
        ).alias("e")
    ).select("e.col_name", "e.vs", "e.vn")
    vals = entries.groupBy("col_name", "vs").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("vn").alias("vn")
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("col_name").orderBy(F.desc("cnt"), F.asc("vs"))
    tops = (
        vals.filter(F.col("vs").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("col_name", F.col("vs").alias("top_value"), F.col("cnt").alias("top_count"))
    )
    stats = vals.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("vs").isNull(), F.col("cnt")).otherwise(0)).alias("n_null"),
        F.count(F.when(F.col("vs").isNotNull(), 1)).alias("n_distinct"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
        F.min("vs").alias("min_str"),
        F.max("vs").alias("max_str"),
    )
    return stats.join(tops, "col_name").select(
        "col_name", "n_rows", "n_null", "n_distinct", "top_value",
        "top_count", "min_num", "max_num", "min_str", "max_str",
    )


# ------------------------------------------- SCD2 point-in-time lookup


def _scd2_pit_oracle() -> str:
    from quick_stream_spark.plans.registry import REGISTRY as _R

    scd2 = _R["events_scd2_intervals"].oracle
    return f"""
    WITH dim AS (
      SELECT user_id, valid_from, max(version_id) AS version_id,
             max_by(event_type, version_id) AS state
      FROM ({scd2}) s GROUP BY user_id, valid_from
    )
    SELECT o.o_orderkey, o.o_custkey,
           d.version_id AS state_version, d.state AS state_at_order
    FROM orders o ASOF LEFT JOIN dim d
      ON o.o_custkey = d.user_id AND d.valid_from <= o.o_orderdate
    """


@register(
    "join_scd2_point_in_time",
    oracle=None,  # set below: SCD2 CTE + ASOF lookup
    tags=("warehouse", "scd2", "join", "asof"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 histories exist
    FOR: each order joins the customer's dimension version that was
    valid at order time (valid_from <= t, latest wins; orders before
    the first version read NULL).  Implemented with the union+window
    as-of pattern — version starts and facts union, sort within the
    key, carry the last version forward — ONE shuffle on the key, no
    interval range-join blow-up; the same 100 TB-safe strategy as
    join_asof_last_event_before_order, here over a dimension the
    engine itself built (events_scd2_intervals).  Versions sharing a
    valid_from (same-timestamp flips) pre-collapse to the newest, so
    both engines resolve ties identically."""
    pin_session(spark)
    dim = (
        events_scd2_intervals(spark, sf_dir)
        .groupBy("user_id", "valid_from")
        .agg(
            F.max("version_id").alias("version_id"),
            F.max_by("event_type", F.col("version_id")).alias("state"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    d_side = dim.select(
        F.col("user_id").alias("uid"),
        F.col("valid_from").alias("t"),
        F.lit(0).alias("is_fact"),
        F.lit(None).cast("long").alias("o_orderkey"),
        "version_id",
        F.col("state"),
    )
    o_side = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_fact"),
        "o_orderkey",
        F.lit(None).cast("long").alias("version_id"),
        F.lit(None).cast("string").alias("state"),
    )
    u = d_side.unionByName(o_side)
    w = (
        Window.partitionBy("uid")
        .orderBy(F.col("t").asc(), F.col("is_fact").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = u.select(
        "is_fact",
        "o_orderkey",
        F.col("uid").alias("o_custkey"),
        F.last("version_id", ignorenulls=True).over(w).alias("state_version"),
        F.last("state", ignorenulls=True).over(w).alias("state_at_order"),
    )
    return enriched.filter(F.col("is_fact") == 1).select(
        "o_orderkey", "o_custkey", "state_version", "state_at_order"
    )


from quick_stream_spark.plans.registry import REGISTRY as _WREG  # noqa: E402

_WREG["join_scd2_point_in_time"].oracle = " ".join(_scd2_pit_oracle().split())


# ------------------------------------------------- entity resolution


@register(
    "pipeline_entity_resolution",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    WITH RECURSIVE
    {_FUZZY_CORPUS_CTES.format(off=FUZZY_OFFSET)},
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM fuzzy_corpus a JOIN fuzzy_corpus b ON a.noun = b.noun AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    ),
    nodes AS (
      SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
      )
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    labeled AS (
      SELECT c.id, coalesce(comp.component, c.id) AS entity_id, c.name
      FROM fuzzy_corpus c LEFT JOIN comp ON comp.id = c.id
    )
    SELECT l.entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           cn.name AS canonical_name
    FROM labeled l JOIN fuzzy_corpus cn ON cn.id = l.entity_id
    GROUP BY l.entity_id, cn.name
    HAVING count(*) > 1
    """,
    tags=("warehouse", "entity-resolution", "pipeline", "iterative"),
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END — the warehouse MDM pipeline:
    blocked fuzzy matching (join_fuzzy_part_names' noun-blocked
    Levenshtein pairs over the deterministic corrupted-duplicate
    corpus) feeds connected components (functions/graph.py min-label
    propagation — records can chain a->b->c even when a and c never
    matched directly), and every matched cluster collapses to a
    canonical entity: lowest member id wins, its name becomes the
    canonical name, member count reported.  The oracle replays the
    pipeline with a recursive CTE for the transitive closure.

    Scale design: candidate generation is the blocked equi-join (sum
    of block-size squares, never all-pairs), the CC loop shuffles only
    the matched-pair graph (orders smaller than the record corpus),
    and the final grouping is one hash aggregation — the composition
    stays shuffle-bounded by match volume at every stage."""
    from quick_stream_spark.functions.graph import min_label_components
    from quick_stream_spark.plans._util import rows_sized_parts, scoped_shuffle
    from quick_stream_spark.plans.registry import REGISTRY as _R

    pin_session(spark)
    pairs = _R["join_fuzzy_part_names"].fn(spark, sf_dir).select("id_a", "id_b")
    n_parts = load_table(spark, sf_dir, "part").count()
    with scoped_shuffle(spark, rows_sized_parts(n_parts * 2, 20_000)):
        labels = min_label_components(spark, pairs)
    corpus = _fuzzy_corpus(spark, sf_dir).select("id", "name")
    labeled = (
        corpus.join(labels, corpus.id == labels.id, "left")
        .select(
            corpus.id,
            F.coalesce(labels.component, corpus.id).alias("entity_id"),
            "name",
        )
    )
    canon = corpus.select(
        F.col("id").alias("entity_id"), F.col("name").alias("canonical_name")
    )
    return (
        labeled.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .join(canon, "entity_id")
        .select("entity_id", "n_members", "canonical_name")
    )


# --------------------------------------------- privacy / governance audit

PRIV_K = 10  # k-anonymity floor per quasi-identifier cell
PRIV_L = 2  # l-diversity floor for the sensitive attribute


@register(
    "privacy_k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n,
           count(*) < {PRIV_K} AS k_violation,
           CAST(count(DISTINCT c_acctbal < 0) AS BIGINT) AS l_distinct,
           count(DISTINCT c_acctbal < 0) < {PRIV_L} AS l_violation
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    tags=("warehouse", "privacy", "governance"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    et al. 2007) — the release-gating check a data-governance pipeline
    runs before publishing quasi-identified records: a cell of the
    quasi-identifier grid (nation x market segment) violates
    k-anonymity when fewer than k={PRIV_K} records share it (those
    records are re-identifiable), and violates l-diversity when the
    sensitive attribute (here the account-balance sign, standing in
    for any binary sensitive flag) takes fewer than l={PRIV_L} distinct
    values inside the cell — the homogeneity attack: an attacker who
    only knows the QI learns the sensitive bit even though the cell is
    k-anonymous.  Emits one row per cell so the suppression /
    generalization step can act on exactly the violating cells.

    Scale design: ONE map-side-combinable groupBy over the QI columns
    — reduce input bounded by (tasks x |QI grid|), independent of row
    count; both checks ride the same aggregate.  At 100 TB this is the
    same one-pass shape as any profiling aggregate."""
    pin_session(spark)
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nation_key"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("c_acctbal") < 0).alias("l_distinct"),
        )
        .select(
            "nation_key",
            "segment",
            "n",
            (F.col("n") < PRIV_K).alias("k_violation"),
            "l_distinct",
            (F.col("l_distinct") < PRIV_L).alias("l_violation"),
        )
    )
