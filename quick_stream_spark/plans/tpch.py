"""TPC-H breadth corpus: the remaining 14 canonical query shapes.

The exported driver corpus (50 entries, plans/relational.py and
friends) already carries Q1/Q3/Q5/Q10 plus the pytest-gated
Q6/Q14/Q16/Q19.  This module completes the set — every remaining TPC-H
query shape (Q2, Q4, Q7, Q8, Q9, Q11, Q12, Q13, Q15, Q17, Q18, Q20,
Q21, Q22) adapted to the synthetic star schema (no partsupp table, no
commit/receipt dates, no ship modes — adaptations are documented per
query).  All entries are pytest-gated (`pytest_only=True`): they run
under the identical local DuckDB oracle gate at sf0.001 without
consuming driver CORRECTNESS slots.

Scale posture mirrors plans/relational.py: dimension sides are
broadcast, scalar subqueries become broadcast cross-joins of one-row
aggregates (never a driver collect), correlated predicates are
decorrelated into grouped joins, and every LIMIT carries a unique-key
tie-break.  Determinism rules (decimal money math, rounded divisions,
UTC timestamps) come from plans/_util.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_stream_spark.plans._util import (
    SQL_REVENUE,
    money,
    pin_session,
    revenue_col,
)
from quick_stream_spark.plans.registry import register
from quick_stream_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier (correlated min over a region-scoped group)


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_d
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT c.l_partkey, c.l_suppkey, c.cost_d,
             s.s_name, s.s_acctbal, n.n_name
      FROM cost c
      JOIN supplier s ON c.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_partkey ORDER BY cost_d ASC, l_suppkey ASC) AS rn
      FROM eur
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(cost_d AS DOUBLE) AS supply_cost
    FROM ranked JOIN part ON l_partkey = p_partkey
    WHERE rn = 1 AND p_size BETWEEN 1 AND 25 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
    tags=("join", "window", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: supply cost := min lineitem price per
    (part, supplier) — the schema has no partsupp).  The correlated
    "cost = MIN(cost) within region" subquery decorrelates into a
    row_number window over the region-scoped candidate set; supplier,
    nation and region are broadcast dims, so the only shuffle is the
    (part, supplier) aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(money("l_extendedprice")).alias("cost_d")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        cost.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    win = Window.partitionBy("l_partkey").orderBy(
        F.col("cost_d").asc(), F.col("l_suppkey").asc()
    )
    best = eur.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") == 1)
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 25) & (F.col("p_type") == "STANDARD")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("cost_d").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q4: order-priority checking (EXISTS -> left-semi join)


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg", "tpch"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over lineitem (adapted predicate:
    a returned line stands in for commit<receipt — the schema has no
    commit/receipt dates).  Plans as a left-semi join: no duplication
    of orders rows, the lineitem side is filtered before the shuffle."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
            AND n2.n_name IN ('NATION_2', 'NATION_4', 'NATION_6'))
        OR (n1.n_name IN ('NATION_2', 'NATION_4', 'NATION_6')
            AND n2.n_name IN ('NATION_1', 'NATION_3', 'NATION_5')))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by year.  Both
    nation legs are broadcast; the OR-of-pairs predicate is evaluated
    after the joins (it references both legs), while the shipdate range
    pushes to the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    odd = ("NATION_1", "NATION_3", "NATION_5")
    even = ("NATION_2", "NATION_4", "NATION_6")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("supp_nation").isin(*odd) & F.col("cust_nation").isin(*even))
            | (F.col("supp_nation").isin(*even) & F.col("cust_nation").isin(*odd))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(revenue_col()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------
# Q8: national market share


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {SQL_REVENUE}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({SQL_REVENUE}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ECONOMY-part revenue sold
    into ASIA, by order year.  Five broadcast dims around the
    lineitem–orders shuffle join; the share is a conditional decimal
    sum over the total decimal sum (one IEEE division, rounded)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = revenue_col()
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(reg), F.col("n2_region") == F.col("r_regionkey"))
    )
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q9: product-type profit measure


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({SQL_REVENUE}
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(0.1 AS DECIMAL(3,1))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%g%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: supply cost := 10% of retail price per
    unit — no partsupp.ps_supplycost in the schema): profit by supplier
    nation and order year for parts matching a name pattern.  All
    decimal products stay exact, so the final double cast is engine-
    independent."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%g%"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = revenue_col() - money("p_retailprice") * money("l_quantity") * F.lit(
        "0.1"
    ).cast("decimal(3,1)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11: important part values (scalar-subquery threshold)


@register(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_d
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_4')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(value_d AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(value_d AS DOUBLE) >
          (SELECT CAST(SUM(value_d) AS DOUBLE) * 0.001 FROM pv)
    """,
    tags=("join", "agg", "subquery", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stocked value exceeds a fraction of
    the national total.  The scalar subquery is a one-row aggregate
    broadcast-cross-joined against the per-part values — no driver
    collect, and the per-part aggregation is computed once and reused
    for both sides (same exact decimal sums on each engine)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    pv = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(money("l_extendedprice")).alias("value_d"))
    )
    total = pv.agg(
        (F.sum("value_d").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_d").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_d").cast("double").alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# Q12: shipping priority classes


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag <> 'A'
    GROUP BY l_linestatus
    """,
    tags=("join", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: line status classes stand in for ship
    modes — the schema has no l_shipmode): urgent-vs-other order counts
    per line status over a year of shipments.  Integer conditional
    sums are exact; the shipdate range and returnflag filter push to
    the lineitem scan before the join shuffle."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_returnflag") != "A")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution


@register(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
    tags=("join", "outer", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers (left outer join with an ON-clause
    filter, so unmatched customers survive with count 0), then a
    second aggregation over the counts."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    co = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15: top supplier (scalar MAX subquery)


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("join", "agg", "subquery", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    The revenue view is computed once; the MAX scalar subquery is a
    one-row aggregate broadcast back over it.  Exact decimal sums make
    the double equality engine-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(revenue_col()).cast("double").alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue (correlated AVG, decorrelated)


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey AS pq_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
    """,
    tags=("join", "agg", "subquery", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders far below a part's average
    quantity.  The correlated AVG decorrelates into a grouped join on
    partkey; the average is an exact-decimal sum over a count (one IEEE
    division), so the 0.2x threshold compares identically on both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers (HAVING over a grouped join)


@register(
    "q18_large_volume_customers",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 120
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders.  The HAVING
    aggregation runs first and shrinks the fact side to the rare big
    orders, so the follow-up joins are cheap; the top-100 carries the
    unique orderkey tie-break and compiles to TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty").cast("double") > 120)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q20: suppliers with excess shipments (nested IN -> grouped semi-join)


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%r%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50
    )
    """,
    tags=("join", "semi", "agg", "tpch"),
    pytest_only=True,  # r13 rotation out (driver-green r12); still oracle-checked locally
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity from lineitem stands
    in for partsupp availability): suppliers who moved more than a
    threshold of any matching part in a year.  The nested IN becomes a
    grouped aggregate followed by a left-semi join — no duplication,
    one shuffle on (suppkey, partkey)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%r%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty").cast("double") > 50)
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return sup.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")


# --------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS)


@register(
    "q21_waiting_suppliers",
    pytest_only=True,  # r12 rotation out (driver-green r11); still oracle-checked locally
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "agg", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: a returned line in a failed order
    stands in for late receipt): suppliers solely responsible for a
    multi-supplier order's failure.  EXISTS plans as a left-semi join
    and NOT EXISTS as a left-anti join, both on orderkey with the
    supplier-inequality residual — the canonical Spark decorrelation
    of the double-correlated TPC-H query."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity (scalar AVG + NOT EXISTS)


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS threshold
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    tags=("anti", "agg", "subquery", "tpch"),
    pytest_only=True,  # r14 rotation out (driver-green r13); still oracle-checked locally
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: grouped by nation — the schema has no
    phone country codes — and "never ordered" relaxed to "no recent
    orders" so the anti-join side is non-trivial at every scale).
    The positive-balance average is a broadcast one-row aggregate; the
    NOT EXISTS is a left-anti join against the filtered orders; exact
    decimal sums keep the threshold comparison and totals
    engine-independent."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "threshold"
        )
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
