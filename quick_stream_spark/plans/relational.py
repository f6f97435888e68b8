"""Relational batch-query corpus (SURVEY.md §2.2).

The reference has **no** relational operators — no projection/filter,
joins, aggregations, windows, sorts, set ops or scalar functions
(SURVEY.md §2.2 table).  Our engine provides them entirely through
Spark built-ins, declared here so the DuckDB oracle verifies each
category at sf0.01 and the bench times the headline ones at sf0.1.

Determinism rules are in ``plans/_util.py`` (decimal money math,
rounded averages, UTC timestamps, unique-key tie-breaks).

Scale notes baked into the plans:
  - filters and projections sit directly on the parquet scan so Catalyst
    pushes them down (verified by tests/test_plans_explain.py);
  - small dimensions (region, nation) are explicitly ``broadcast()``;
    fact-to-fact joins stay shuffle joins for AQE to re-plan;
  - top-k = window over a bounded partition or global
    ``orderBy().limit()`` (TakeOrderedAndProject — no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import (
    SQL_REVENUE,
    davg,
    dsum,
    money,
    pin_session,
    revenue_col,
    sql_davg,
    sql_dsum,
)
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table

# gap-based sessionization break threshold (window_lag_event_gaps);
# matches the streaming session-window gap in plans/streaming_ext.py
SESSION_GAP_SECONDS = 1800


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation over a pushed-down filter scan (TPC-H Q1 shape)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "scan"),
    bench=True,
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Multi-way join + agg + top-k (TPC-H Q3 shape)


@register(
    "q3_top_revenue_orders",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2000-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Six-way join with broadcast dims (TPC-H Q5 shape)


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("join", "agg", "broadcast"),
    bench=True,
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: revenue from lineitems whose supplier sits
    in the customer's own nation.  region/nation are broadcast — they
    stay tiny at any scale factor."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Join varieties


@register(
    "join_semi_anti",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT 'semi_part' AS kind, p_partkey AS key, p_name AS name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                  AND l_quantity >= 40)
    UNION ALL
    SELECT 'anti_customer' AS kind, c_custkey AS key, c_name AS name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "semi", "anti"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (parts with a heavy shipment) and LEFT ANTI (customers
    with no orders) in one tagged result.  Both compile to their
    dedicated join operators — semi/anti never materialize the probe
    side, which is what makes existence checks affordable at scale."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    semi = (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .select(
            F.lit("semi_part").alias("kind"),
            F.col("p_partkey").alias("key"),
            F.col("p_name").alias("name"),
        )
    )
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            F.lit("anti_customer").alias("kind"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
        )
    )
    return semi.unionByName(anti)


@register(
    "join_full_outer_nation_activity",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(customers, 0) AS customers,
           COALESCE(suppliers, 0) AS suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    tags=("join", "agg"),
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("customers", F.lit(0)).alias("customers"),
        F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
    )


@register(
    "join_range_events_orders",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT o_orderkey, COUNT(e.event_id) AS events_that_day
    FROM orders o
    LEFT JOIN events e
      ON e.ts >= o_orderdate AND e.ts < o_orderdate + INTERVAL 1 DAY
    WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY o_orderkey
    """,
    tags=("join", "range"),
)
def join_range_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: events occurring within a day of the
    order date.  At scale: bucket both sides by coarse time bucket and
    join on bucket + range to avoid the cartesian blow-up."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-06-01 00:00:00").cast("timestamp")
    )
    e = _t(spark, sf_dir, "events")
    cond = (e.ts >= o.o_orderdate) & (e.ts < F.date_add(o.o_orderdate, 1).cast("timestamp"))
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count(F.col("event_id")).alias("events_that_day"))
    )


@register(
    "q10_returned_item_revenue",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue-change forecast — a pure
    scan-filter-aggregate with every predicate pushed to the parquet
    scan (date range, discount band, quantity cap) and a map-side
    partial sum; the no-join baseline for scan throughput."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(money("l_extendedprice") * money("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share — conditional decimal
    aggregation over a fact-to-dim join; ``part`` is broadcast so the
    only full pass is the pruned lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = revenue_col()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.00
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q16_parts_supplier_distribution",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type NOT IN ('PROMO')
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q16_parts_supplier_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-part relationships come from
    lineitem, the synthetic schema has no partsupp): how many distinct
    suppliers can furnish each surviving (brand, type, size) — negated
    dim predicates + COUNT DISTINCT over the join."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").isin("PROMO"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction-of-conjunctions across both join
    sides.  Catalyst extracts the common join key as an equi-join and
    evaluates the OR residual post-join, so this still plans as a
    broadcast hash join, not a cartesian."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(clause).agg(
        F.sum(revenue_col()).cast("double").alias("revenue")
    )


_ABOVE_AVG_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
"""


@register(
    "subquery_orders_above_customer_avg",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=_ABOVE_AVG_SQL,
    tags=("subquery", "sql"),
)
def subquery_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL front end — Catalyst
    decorrelates it into an aggregate + join (no per-row re-execution;
    SURVEY §4 lists decorrelation among the optimizations the reference
    lacks and Spark provides).  The average uses the exact decimal-sum
    construction so both engines compare against bit-identical
    thresholds."""
    pin_session(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ABOVE_AVG_SQL)


# --------------------------------------------------------------------------
# Grouping extensions


@register(
    "agg_grouping_analytics",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_price")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "sql", "grouping"),
)
def agg_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping analytics through the SQL front end: the full
    GROUPING SETS lattice over (returnflag, linestatus) — the union of
    ROLLUP and CUBE semantics in one pass (Spark expands it to a single
    Expand + one aggregation, not one scan per set).  The DataFrame-API
    ``rollup``/``cube`` twins are pytest-gated below; group columns are
    non-null in the data, so NULL in the output unambiguously marks the
    rolled-up level."""
    pin_session(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_rollup_returns",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API ROLLUP twin of agg_grouping_analytics."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "agg_cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum("o_totalprice", "sum_price")}
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API CUBE twin of agg_grouping_analytics."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "agg_events_by_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(DISTINCT user_id) AS distinct_users_salted,
           max_by(user_id, event_id) AS user_of_last_event,
           min_by(user_id, event_id) AS user_of_first_event,
           CAST(max_by(event_id, ts || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                AS BIGINT) AS latest_event_id
    FROM events GROUP BY event_type
    """,
    tags=("agg", "argmax", "distinct", "skew", "scale"),
)
def agg_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event profile combining three aggregation families:

    - exact COUNT DISTINCT (``distinct_users``) — the direct plan;
    - two-phase **salted** COUNT DISTINCT (``distinct_users_salted``) —
      the skew-mitigation pattern for heavy grouping keys: phase 1
      counts distinct users within (type, salt) shards so no single
      reducer sees a whole heavy group, phase 2 sums the shard counts
      (exact: the salt is a hash of the key, so each user lands in
      exactly one shard).  Same contract, different physical plan —
      the oracle states it as the plain COUNT DISTINCT;
    - arg-min/arg-max (``max_by``/``min_by`` — the building block under
      the LWW dedup), ordered by unique keys (event_id; ts||event_id
      for the time-ordered variant) so ties cannot diverge.
    """
    e = _t(spark, sf_dir, "events")
    time_key = F.concat(
        F.col("ts").cast("string"), F.lit("|"), F.lpad(F.col("event_id").cast("string"), 12, "0")
    )
    direct = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("user_id")).alias("distinct_users"),
        F.max_by("user_id", "event_id").alias("user_of_last_event"),
        F.min_by("user_id", "event_id").alias("user_of_first_event"),
        F.max_by("event_id", time_key).alias("latest_event_id"),
    )
    salted = (
        e.withColumn("__salt", F.pmod(F.xxhash64("user_id"), F.lit(32)))
        .groupBy("event_type", "__salt")
        .agg(F.count_distinct("user_id").alias("part"))
        .groupBy("event_type")
        .agg(F.sum("part").alias("distinct_users_salted"))
    )
    return direct.join(salted, "event_type").select(
        "event_type",
        "n",
        "distinct_users",
        "distinct_users_salted",
        "user_of_last_event",
        "user_of_first_event",
        "latest_event_id",
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_unpivot_roundtrip",
    oracle="""
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, event_type
    """,
    tags=("agg", "pivot"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long -> wide: one column per event type, explicit value
    list so the schema is static and no extra distinct-values job runs)
    followed by UNPIVOT (wide -> long) — the roundtrip lands back on the
    plain GROUP BY contract, which is what the oracle states.  Absent
    (user, type) combos surface as NULL cells in the wide form and are
    dropped on unpivot, matching GROUP BY's no-row semantics."""
    wide = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return (
        wide.unpivot("user_id", list(EVENT_TYPES), "event_type", "n")
        .filter(F.col("n").isNotNull())
        .select("user_id", "event_type", F.col("n").cast("long").alias("n"))
    )


@register(
    "agg_approx_distinct_users",
    # HLL sketch VALUES are engine-specific, so the oracle states the
    # sketch's ACCURACY CONTRACT instead: per group, the exact distinct
    # count plus the assertion that the Spark-side HLL estimate landed
    # within tolerance (always-TRUE column in SQL; Spark computes it
    # for real, so a broken sketch hash-mismatches)
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++), driver-checkable (r11):
    raw sketch estimates are engine-specific by construction, so the
    exported row is the sketch's accuracy contract — the exact distinct
    count per group alongside ``approx_within_5pct``, computed by
    comparing the REAL HLL estimate (rsd=0.01) against the exact count
    in the same plan.  A regressed sketch flips the boolean and fails
    the hash compare; the estimate itself stays out of the hashed
    columns.  The exact twin is agg_events_by_type."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("__approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


# --------------------------------------------------------------------------
# Window functions


@register(
    "window_order_analytics",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wrun AS DOUBLE)
             AS running_spend,
           first_value(o_orderkey) OVER wfull AS first_order,
           last_value(o_orderkey) OVER wfull AS last_order,
           nth_value(o_orderkey, 2) OVER wfull AS second_order,
           ntile(4) OVER wg AS price_quartile,
           round(percent_rank() OVER wg, 6) AS pct_rank,
           round(cume_dist() OVER wg, 6) AS cume,
           rank() OVER ws AS status_rank,
           dense_rank() OVER ws AS status_dense_rank
    FROM orders
    WINDOW
      wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      wg AS (ORDER BY o_totalprice ASC, o_orderkey ASC),
      ws AS (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    tags=("window", "rank"),
)
def window_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function families in one pass over orders: running
    frame aggregate (cumulative spend), full-partition value picks
    (first/last/nth), global distribution ranks (ntile / percent_rank /
    cume_dist) and per-partition ranking (rank / dense_rank).  Every
    ordering ends in the unique o_orderkey so both engines agree
    exactly; Spark plans one Window operator per distinct
    partitioning/frame, not one per function."""
    o = _t(spark, sf_dir, "orders")
    wrun = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wg = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    ws = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(money("o_totalprice")).over(wrun).cast("double").alias("running_spend"),
        F.first("o_orderkey").over(wfull).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        F.ntile(4).over(wg).alias("price_quartile"),
        F.round(F.percent_rank().over(wg), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(wg), 6).alias("cume"),
        F.rank().over(ws).alias("status_rank"),
        F.dense_rank().over(ws).alias("status_dense_rank"),
    )


@register(
    "topk_orders",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT 'per_customer' AS scope, o_custkey, o_orderkey, o_totalprice, rank FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders
    ) WHERE rank <= 3
    UNION ALL
    SELECT 'global' AS scope, CAST(NULL AS BIGINT) AS o_custkey,
           o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders
    ) WHERE rank <= 10
    """,
    tags=("window", "topk", "sort"),
    bench=True,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k both ways: per-customer top-3 (row_number window + filter —
    Spark 4 pre-reduces map-side via WindowGroupLimit) and global top-10
    (orderBy+limit — compiles to TakeOrderedAndProject: per-partition
    heap + driver merge, no full sort; pinned by
    tests/test_plans_explain.py on the sort_top10_orders twin)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    per_cust = (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.lit("per_customer").alias("scope"),
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            "rank",
        )
    )
    wg = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    top10 = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .withColumn("rank", F.row_number().over(wg))
        .select(
            F.lit("global").alias("scope"),
            F.lit(None).cast("long").alias("o_custkey"),
            "o_orderkey",
            "o_totalprice",
            "rank",
        )
    )
    return per_cust.unionByName(top10)


@register(
    "window_lag_event_gaps",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=f"""
    SELECT user_id, event_id,
           CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_seconds,
           session_num
    FROM (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             CAST(SUM(CASE WHEN prev_gap IS NULL
                             OR prev_gap > {SESSION_GAP_SECONDS} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
      FROM (
        SELECT *, date_diff('second',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS prev_gap
        FROM events
      )
    ) WHERE prev_ts IS NOT NULL
    """,
    tags=("window", "sessionization"),
)
def window_lag_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag gaps + batch sessionization: a session break is a gap over
    SESSION_GAP_SECONDS (or the user's first event); ``session_num`` is
    the running count of breaks — the standard gap-based sessionization
    (the batch twin of the streaming session window in
    ``stream_windows``).  One shuffle: every window shares the
    (user_id; ts, event_id) partitioning, so Catalyst plans a single
    exchange + sort for all three window functions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("prev_gap", gap)
        .withColumn(
            "session_num",
            F.sum(
                F.when(
                    F.col("prev_gap").isNull()
                    | (F.col("prev_gap") > SESSION_GAP_SECONDS),
                    1,
                ).otherwise(0)
            )
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")).alias("gap_seconds"),
            "session_num",
        )
    )


# --------------------------------------------------------------------------
# Sorts / limits / set ops


@register(
    "sort_top10_orders",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    tags=("sort", "topk"),
)
def sort_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    a per-partition heap + driver merge, not a full sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "set_ops",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT 'union' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set operators (set semantics, like the SQL twins) over
    the customer/supplier nation keys, tagged by operator.  UNION
    DISTINCT / INTERSECT / EXCEPT each compile to their dedicated
    hash-based physical operators (one shuffle on the compared
    columns)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tagged = [
        ("union", c.union(s).distinct()),
        ("intersect", c.intersect(s)),
        ("except", c.subtract(s)),
    ]
    out = None
    for op, df in tagged:
        part = df.select(F.lit(op).alias("op"), "nationkey")
        out = part if out is None else out.unionByName(part)
    return out


# --------------------------------------------------------------------------
# Scalar functions (string / date / math / json / null handling)


@register(
    "scalar_part_funcs",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           p_brand || '/' || p_type AS brand_type,
           round(p_retailprice * 1.1, 2) AS price_bumped,
           CAST(p_size % 5 AS INT) AS size_mod,
           abs(p_size - 25) AS size_dist,
           CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
           regexp_extract(p_type, '[A-Z]+') AS first_upper_run,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_brand, 'Brand#1[0-9]') AS is_brand_1x,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_lower_runs,
           map(['price', 'size'], [p_retailprice, CAST(p_size AS DOUBLE)])['price'][1]
             AS price_from_map,
           cardinality(map(['price', 'size'], [p_retailprice, CAST(p_size AS DOUBLE)]))
             AS map_size,
           struct_pack(brand := p_brand, sz := p_size).brand AS brand_from_struct,
           struct_pack(brand := p_brand, sz := p_size).sz + 1 AS size_plus_one,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           array_to_string(list_sort(string_split(p_name, ' ')), '-') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'red') AS has_red,
           array_to_string(list_reverse(string_split(p_name, ' ')), ' ') AS reversed_name
    FROM part
    """,
    tags=("scalar", "string", "math", "regex", "map", "struct", "array"),
)
def scalar_part_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function families over ``part`` in one wide projection:
    string ops, arithmetic, CASE, regex (extract/replace/match/
    extract_all), MapType/StructType construction + field access
    (surfaced as scalars — map/struct columns themselves don't hash
    portably across engines; their lookups do), and array algebra
    (split/sort/contains/reverse/join).  All JVM built-ins inside one
    whole-stage-codegen span — a map-only pass at any scale."""
    p = _t(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("price"), F.col("p_retailprice"),
        F.lit("size"), F.col("p_size").cast("double"),
    )
    s = F.struct(F.col("p_brand").alias("brand"), F.col("p_size").alias("sz"))
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_bumped"),
        (F.col("p_size") % 5).cast("int").alias("size_mod"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.regexp_extract("p_type", "[A-Z]+", 0).alias("first_upper_run"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_brand").rlike("Brand#1[0-9]").alias("is_brand_1x"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), F.lit(0))).alias("n_lower_runs"),
        F.element_at(m, "price").alias("price_from_map"),
        F.size(m).alias("map_size"),
        s.getField("brand").alias("brand_from_struct"),
        (s.getField("sz") + 1).alias("size_plus_one"),
        F.size(words).alias("n_words"),
        words.getItem(0).alias("first_word"),
        F.array_join(F.array_sort(words), "-").alias("sorted_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.array_join(F.reverse(words), " ").alias("reversed_name"),
    )


@register(
    "scalar_event_funcs",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS prop_k_mod,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           event_id << 2 AS shifted_left,
           event_id >> 3 AS shifted_right,
           CAST(bit_count(event_id) AS INT) AS popcount,
           COALESCE(NULLIF(event_type, 'error'), 'n/a') AS type_or_na,
           (value IS NULL) AS value_missing,
           COALESCE(value, 0.0) AS value_filled,
           CAST(year(ts) AS INT) AS event_year,
           CAST(month(ts) AS INT) AS event_month,
           CAST(dayofweek(ts) AS INT) AS event_dow,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(ts AS DATE), DATE '2002-01-01') AS INT)
             AS days_to_2002
    FROM events
    """,
    tags=("scalar", "json", "bitwise", "null", "date"),
)
def scalar_event_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function families over ``events`` in one wide projection:
    JSON path extraction, bitwise ops (exact integer semantics), NULL
    handling (NULLIF/COALESCE/IS NULL), and date/time parts over the
    event timestamp.  DuckDB dayofweek is Sunday=0 vs Spark's Sunday=1,
    hence the -1."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("prop_k"),
        (k % 10).alias("prop_k_mod"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(F.col("event_id"), 2).alias("shifted_left"),
        F.shiftright(F.col("event_id"), 3).alias("shifted_right"),
        F.bit_count(F.col("event_id")).alias("popcount"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("n/a")).alias("type_or_na"),
        F.isnull("value").alias("value_missing"),
        F.coalesce("value", F.lit(0.0)).alias("value_filled"),
        F.year("ts").alias("event_year"),
        F.month("ts").alias("event_month"),
        (F.dayofweek("ts") - 1).alias("event_dow"),
        F.date_trunc("month", "ts").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("ts").cast("date")).alias(
            "days_to_2002"
        ),
    )


@register(
    "scalar_variant_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS VARCHAR) AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 + 1 AS k_derived,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing
    FROM events
    """,
    tags=("scalar", "variant", "json"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def scalar_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: the JSON
    props column is parsed once with parse_json and fields come out of
    the binary variant encoding with typed variant_get paths (missing
    paths -> NULL via try_variant_get).  Against DuckDB's JSON
    extraction as the oracle.  VARIANT keeps the parse tree in a
    columnar binary form, so repeated field access beats re-parsing
    JSON strings — the modern path for props-style columns at scale."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "int").cast("string").alias("k_str"),
        (F.variant_get(v, "$.k", "int") * 2 + 1).alias("k_derived"),
        F.try_variant_get(v, "$.missing", "int").alias("k_missing"),
    )


_RECURSIVE_HIERARCHY_SQL = """
    WITH RECURSIVE walk(c_custkey, ancestor, depth) AS (
      SELECT c_custkey, c_custkey, 0
      FROM customer
      UNION ALL
      SELECT w.c_custkey, CAST(FLOOR(w.ancestor / 2) AS BIGINT), w.depth + 1
      FROM walk w WHERE w.ancestor > 0
    )
    SELECT c_custkey,
           CAST(MAX(depth) AS INT) AS depth_to_root,
           CAST(SUM(ancestor) AS BIGINT) AS ancestor_key_sum
    FROM walk GROUP BY c_custkey
"""


@register(
    "recursive_cte_hierarchy",
    oracle=_RECURSIVE_HIERARCHY_SQL,
    tags=("sql", "recursive"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through Spark's SQL front end (WITH RECURSIVE,
    new in Spark 4): every customer walks the implicit binary-halving
    hierarchy (parent = key/2) to the root, yielding its depth and the
    sum of ancestor keys — the BOM-explosion / org-chart query class,
    expressed declaratively instead of a driver-side loop.  The walk is
    acyclic so UNION ALL recursion terminates (Spark does not yet
    support cycle-safe UNION DISTINCT recursion; the iterative
    fixpoint operator dedup_connected_components covers the cyclic
    class).  Identical text runs on DuckDB as the oracle."""
    pin_session(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_HIERARCHY_SQL)


_LATERAL_TOPK_SQL = """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey ASC
      LIMIT 2
    ) t
"""


@register(
    "join_lateral_topk_per_nation",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle=_LATERAL_TOPK_SQL,
    tags=("join", "lateral", "sql"),
)
def join_lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in the FROM clause: the two
    richest customers of every nation.  Catalyst decorrelates the
    per-nation ORDER BY ... LIMIT into a ranked window join rather
    than re-executing the subquery per outer row — the declarative
    form of topk_orders' row_number pattern, with the unique-key
    tie-break making both engines' top-2 identical."""
    pin_session(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_TOPK_SQL)


@register(
    "join_strategy_hints",
    oracle="""
    SELECT 'merge' AS strategy, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'shuffle_hash', o_orderstatus, CAST(COUNT(*) AS BIGINT)
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "hints"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: the same join executed under a MERGE
    (sort-merge) hint and a SHUFFLE_HASH hint, tagged.  Hints override
    the planner's size-based choice — the lever for the cases AQE can't
    see (a side that EXPLODES after a filter the optimizer can't
    estimate, or a sort order worth preserving).  Results are identical
    by construction; tests/test_plans_explain.py pins that each hint
    actually selected its physical strategy."""
    pin_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(tag).alias("strategy"), "o_orderstatus", "n")
        )

    merge_join = orders.join(
        cust.hint("merge"), F.col("o_custkey") == F.col("c_custkey")
    )
    hash_join = orders.join(
        cust.hint("shuffle_hash"), F.col("o_custkey") == F.col("c_custkey")
    )
    return agg(merge_join, "merge").unionByName(agg(hash_join, "shuffle_hash"))


# --------------------------------------------------- time-weighted average


@register(
    "events_twap_per_user",
    # first-time entry (r_upsert_endstate_pointer) — leads the r14
    # queue (driver-green r10); still oracle-checked locally
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS vc,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nt
      FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(SUM(nt - t) AS BIGINT) AS span_us,
           round(CAST(SUM(CAST(vc AS DECIMAL(38,0)) * (nt - t)) AS DOUBLE)
                 / CAST(SUM(nt - t) AS DOUBLE) / 100, 6) AS twap
    FROM e WHERE nt IS NOT NULL GROUP BY user_id
    """,
    tags=("window", "timeseries", "analytics"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def events_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP shape used for
    sensor readings, position marks and price feeds): each observation
    is weighted by how long it was current — value_i x (t_{i+1} - t_i)
    over the total covered span, the piecewise-constant integral a
    plain AVG gets wrong whenever sampling is irregular.

    Determinism: timestamps become exact epoch MICROSECOND integers
    and values exact cents, so the weighted sum is a DECIMAL(38,0)
    integer aggregation — order-independent — with ONE double division
    at the end.  One lead() window + one groupBy, both partitioned by
    user: a single key shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        t.alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
        F.lead(t).over(w).alias("nt"),
    ).filter(F.col("nt").isNotNull())
    dt = F.col("nt") - F.col("t")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(dt).alias("span_us"),
        F.round(
            F.sum(F.col("vc").cast("decimal(38,0)") * dt).cast("double")
            / F.sum(dt).cast("double")
            / 100,
            6,
        ).alias("twap"),
    )


# ------------------------------------------------------ skew diagnosis


@register(
    "diagnose_key_skew_events",
    oracle="""
    WITH freqs AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS freq
      FROM events GROUP BY user_id
    ),
    summary AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(min(freq) AS BIGINT) AS min_freq,
             CAST(max(freq) AS BIGINT) AS max_freq,
             round(CAST(SUM(freq) AS DOUBLE) / count(*), 6) AS avg_freq,
             round(CAST(max(freq) AS DOUBLE)
                   / (CAST(SUM(freq) AS DOUBLE) / count(*)), 6) AS skew_factor
      FROM freqs
    ),
    top AS (
      SELECT user_id AS top1_key, freq AS top1_freq FROM (
        SELECT *, row_number() OVER (ORDER BY freq DESC, user_id ASC) AS rn
        FROM freqs
      ) WHERE rn = 1
    )
    SELECT s.*, t.top1_key, t.top1_freq FROM summary s, top t
    """,
    tags=("diagnostics", "skew", "agg"),
    # r10: rotated INTO the driver window (first-time driver check)
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def diagnose_key_skew_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the pre-flight a 100 TB join deserves:
    frequency profile of a prospective shuffle key (rows, distinct
    keys, min/avg/max per-key frequency, the heaviest key, and a skew
    factor = max/avg that directly predicts the straggler ratio of a
    hash-partitioned shuffle).  A skew factor over ~5-10 is the cue to
    reach for the salting/AQE-skew-join machinery this engine pins
    elsewhere.  One map-combinable groupBy (the frequency table) and
    two bounded reductions over it; the heaviest-key pick is a
    deterministic top-1."""
    ev = load_table(spark, sf_dir, "events")
    freqs = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("freq"))
    summary = freqs.agg(
        F.sum("freq").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.min("freq").alias("min_freq"),
        F.max("freq").alias("max_freq"),
        F.round(F.sum("freq").cast("double") / F.count(F.lit(1)), 6).alias("avg_freq"),
        F.round(
            F.max("freq").cast("double")
            / (F.sum("freq").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("skew_factor"),
    )
    top = (
        freqs.orderBy(F.desc("freq"), F.asc("user_id"))
        .limit(1)
        .select(F.col("user_id").alias("top1_key"), F.col("freq").alias("top1_freq"))
    )
    return summary.crossJoin(F.broadcast(top))


# ------------------------------------------------- correlation matrix

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    sums = ", ".join(
        f"CAST(SUM(CAST(round({c} * 100) AS BIGINT)) AS BIGINT) AS s_{c}"
        for c in _CORR_COLS
    )
    ndev = ", ".join(
        f"CAST(CAST(t.n AS BIGINT) * CAST(round(e.{c} * 100) AS BIGINT) - t.s_{c} "
        f"AS DECIMAL(19,0)) AS d_{c}"
        for c in _CORR_COLS
    )
    sq = ", ".join(
        f"SUM(d_{c} * d_{c}) AS q_{c}" for c in _CORR_COLS
    )
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    xs = ", ".join(
        f"SUM(d_{a} * d_{b}) AS x_{a}_{b}" for a, b in pairs
    )
    arms = " UNION ALL ".join(
        f"""SELECT '{a}' AS col_x, '{b}' AS col_y,
               round(CAST(x_{a}_{b} AS DOUBLE)
                     / (sqrt(CAST(q_{a} AS DOUBLE)) * sqrt(CAST(q_{b} AS DOUBLE))),
                     6) AS corr
        FROM moments"""
        for a, b in pairs
    )
    return f"""
    WITH totals AS (SELECT count(*) AS n, {sums} FROM lineitem),
    dev AS (SELECT {ndev} FROM lineitem e, totals t),
    moments AS (SELECT {sq}, {xs} FROM dev)
    {arms}
    """


@register(
    "stats_lineitem_correlations",
    oracle=None,  # set below (generated pairwise arms)
    tags=("agg", "statistics", "ml"),
    # r10: rotated INTO the driver window (first-time driver check)
)
def stats_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the fact table's numeric columns
    — the feature-screening pass an ML pipeline runs before training —
    computed EXACTLY: values scale to integer cents, deviations are the
    integer n*x - sum(x) (multiplying by n keeps them integral; the n^2
    factors cancel in the ratio), and every cross/square moment
    accumulates in DECIMAL(38,0) — order-independent, so both engines
    agree bit-for-bit before the one closing sqrt/divide (IEEE sqrt is
    correctly rounded).  Plan: two fused scans — one for the totals
    (broadcast back as scalars), one accumulating all {n} squared and
    cross moments map-side — regardless of how many column pairs are
    requested; a naive corr() per pair would rescan per pair."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = {c: F.round(F.col(c) * 100).cast("long") for c in _CORR_COLS}
    totals = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(cents[c]).alias(f"s_{c}") for c in _CORR_COLS],
    )
    dev_cols = [
        (F.col("n") * cents[c] - F.col(f"s_{c}")).cast("decimal(19,0)").alias(f"d_{c}")
        for c in _CORR_COLS
    ]
    dev = li.crossJoin(F.broadcast(totals)).select(*dev_cols)
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]]
    moments = dev.agg(
        *[
            F.sum(F.col(f"d_{c}") * F.col(f"d_{c}")).alias(f"q_{c}")
            for c in _CORR_COLS
        ],
        *[
            F.sum(F.col(f"d_{a}") * F.col(f"d_{b}")).alias(f"x_{a}_{b}")
            for a, b in pairs
        ],
    )
    out = None
    for a, b in pairs:
        arm = moments.select(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.round(
                F.col(f"x_{a}_{b}").cast("double")
                / (
                    F.sqrt(F.col(f"q_{a}").cast("double"))
                    * F.sqrt(F.col(f"q_{b}").cast("double"))
                ),
                6,
            ).alias("corr"),
        )
        out = arm if out is None else out.unionByName(arm)
    return out


from quick_stream_spark.plans.registry import REGISTRY as _RELREG  # noqa: E402

_RELREG["stats_lineitem_correlations"].oracle = " ".join(_corr_oracle().split())
