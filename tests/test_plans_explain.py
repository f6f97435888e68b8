"""Plan-quality gates (100 TB posture): pushdown reaches the scan,
dims are broadcast, no Python UDFs in JVM-expressible paths, top-k
compiles to TakeOrderedAndProject."""

from quick_stream_spark.plans.registry import REGISTRY, queries
from tests.conftest import SF_SMOKE

queries()  # populate


def _formatted(spark, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _formatted(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side combine before the shuffle (partial aggregation)
    assert "partial_sum" in plan
    assert "BatchScan" in plan or "Scan parquet" in plan


def test_q1_column_pruning(spark):
    plan = _formatted(spark, "q1_pricing_summary")
    # ReadSchema must not include unused columns like l_comment/l_partkey
    read = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert read, "no ReadSchema in plan"
    assert "l_partkey" not in read[0]
    assert "l_orderkey" not in read[0]


def test_q5_broadcasts_dimensions(spark):
    plan = _formatted(spark, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark):
    plan = _formatted(spark, "sort_top10_orders")
    assert "TakeOrderedAndProject" in plan


def test_no_python_udf_in_jvm_paths(spark):
    """Plan-purity contract, two tiers:

    1. ``BatchEvalPython`` (row-at-a-time interpreted Python UDF) is
       banned in EVERY registered query's plan, unconditionally — there
       is no hot path where a per-row Python UDF is acceptable at 100 TB.
    2. ``ArrowEvalPython`` (vectorized pandas_udf, Arrow batch transfer)
       is allowed ONLY for queries tagged 'arrow' or 'pandas' — the
       declared Arrow-batched seams (fast hyperplane signature,
       grouped-map / stateful pandas).  Any other query sprouting an
       ArrowEvalPython stage fails: the JVM built-in path regressed."""
    for name, spec in REGISTRY.items():
        plan = _formatted(spark, name)
        # global structural gate, same walk (plan builds are the cost):
        # no registered query may plan a CartesianProduct — the O(n^2)
        # pair-enumeration failure mode.  (BroadcastNestedLoopJoin is
        # allowed where it appears: every instance broadcasts a bounded
        # artifact — a one-row aggregate, the 8-vector query set, a
        # scalar-cutoff frame.)
        assert "CartesianProduct" not in plan, (
            f"{name} plans a CartesianProduct"
        )
        # BatchEvalPythonUDTF is the (distinct) Python table-function
        # node — allowed only under the 'udtf' tag; mask it so the
        # scalar-UDF check below can't confuse the two.
        scalar_plan = plan.replace("BatchEvalPythonUDTF", "")
        assert "BatchEvalPython" not in scalar_plan, (
            f"{name} contains a row-at-a-time Python UDF stage"
        )
        if "udtf" not in spec.tags:
            assert "BatchEvalPythonUDTF" not in plan, (
                f"{name} contains an undeclared Python UDTF stage"
            )
        if "pandas" in spec.tags or "arrow" in spec.tags:
            continue
        assert "ArrowEvalPython" not in plan, (
            f"{name} contains an undeclared Arrow UDF stage "
            "(tag it 'arrow' if this is an intentional vectorized seam)"
        )


def test_bucketed_join_has_no_join_shuffle(spark):
    """Catalog-bucketed fact-fact join must plan without an Exchange on
    the join inputs (co-located buckets): the ONLY Exchange in the whole
    plan is the post-join aggregation shuffle.  Broadcast is disabled so
    the tiny test tables exercise the sort-merge path a 100 TB join
    would take."""
    import re

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted(spark, "join_bucketed_colocated")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan


def test_dedup_single_shuffle_with_partial_limit(spark):
    """The LWW dedup (window variant) must shuffle exactly once (on the
    key), and Spark 4 should pre-reduce map-side via partial
    WindowGroupLimit (top-1 per key before the exchange) — the shuffle
    carries at most one row per (key, input partition).  Plan built from
    the operator directly: the registered r_dedup_latest_per_key query
    unions both physical variants, which would double-count exchanges."""
    import contextlib
    import io
    import re

    from quick_stream_spark.operators.dedup import latest_per_key
    from quick_stream_spark.sources.readers import load_table

    df = latest_per_key(
        load_table(spark, SF_SMOKE, "events"),
        keys=("user_id",),
        version_col="ts",
        arrival_col="event_id",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan
    assert "WindowGroupLimit" in plan


def test_q6_predicates_reach_the_scan(spark):
    """TPC-H Q6 shape: every predicate (date range, discount band,
    quantity cap) must appear in PushedFilters — the scan-throughput
    query reads only what it needs."""
    plan = _formatted(spark, "q6_forecast_revenue")
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed, "no PushedFilters section in the q6 plan"
    text = " ".join(pushed)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in text, f"{col} predicate not pushed to the scan"


def test_partitioned_export_prunes_partitions(spark):
    """The partition-column filter must resolve to PartitionFilters on
    the scan (directory pruning), not a data filter over a full scan."""
    plan = _formatted(spark, "source_partitioned_pruning")
    lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert lines, "no PartitionFilters in plan"
    assert "lang" in lines[0]
    # the text column must not be read at all (column pruning through
    # the partitioned roundtrip)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "text" not in read[0]


def test_q18_topk_compiles_to_take_ordered(spark):
    """Q18's top-100 must compile to TakeOrderedAndProject — no global
    sort of the joined result at any scale."""
    plan = _formatted(spark, "q18_large_volume_customers")
    assert "TakeOrderedAndProject" in plan


def test_q21_plans_semi_and_anti_joins(spark):
    """Q21's EXISTS / NOT EXISTS must plan as left-semi and left-anti
    joins (no row duplication, no subquery re-execution)."""
    plan = _formatted(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q2_broadcasts_all_dimensions(spark):
    """Q2's supplier/nation/region/part legs are all small dims and
    must broadcast — the only shuffle is the (part, supplier) cost
    aggregation + the ranking window."""
    plan = _formatted(spark, "q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 3


def test_join_hints_select_their_strategies(spark):
    """The MERGE and SHUFFLE_HASH hints must each pick their physical
    join (overriding the size-based default, which would broadcast the
    small customer side)."""
    plan = _formatted(spark, "join_strategy_hints")
    assert "SortMergeJoin" in plan
    assert "ShuffledHashJoin" in plan


def test_basket_topk_and_partial_pair_counts(spark):
    """Market basket: the final top-30 must compile to
    TakeOrderedAndProject (no global sort of the pair space) and the
    pair count must partial-aggregate map-side before its shuffle."""
    plan = _formatted(spark, "orders_market_basket")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_countmin_build_partial_aggregates(spark):
    """The CMS counter build must partial-aggregate map-side: reduce
    input is then bounded by (tasks x d x w), independent of volume."""
    plan = _formatted(spark, "sketch_countmin_heavy_hitters")
    assert "partial_count" in plan


def test_bloom_probe_broadcasts_the_bit_table(spark):
    """The bounded (k x m)-bit filter table must broadcast to the probe
    side — the probe never shuffles on the bit key."""
    plan = _formatted(spark, "join_bloom_pruned")
    assert "BroadcastHashJoin" in plan


def test_markov_pair_counts_partial_aggregate(spark):
    """The transition-matrix count must partial-aggregate map-side into
    the bounded |types|^2 matrix before shuffling."""
    plan = _formatted(spark, "events_markov_transitions")
    assert "partial_count" in plan


def test_dsir_model_broadcasts_and_partial_aggregates(spark):
    """DSIR: the B-row log-likelihood model must broadcast into the
    scoring join (the corpus never shuffles on the bucket key), and the
    model sums over the materialized doc-bucket counts must
    partial-aggregate map-side (the token->count shuffle itself runs at
    checkpoint time and is pinned by the bucket-count cardinality)."""
    plan = _formatted(spark, "sample_importance_dsir")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_profile_unpivot_is_row_local_with_partial_counts(spark):
    """The column profiler's unpivot must be a row-local Generate
    (explode) — one scan regardless of column count — and the
    (column, value) histogram must partial-aggregate before its
    shuffle."""
    plan = _formatted(spark, "profile_orders_columns")
    assert "Generate" in plan
    assert "partial_count" in plan


def test_fuzzy_join_is_blocked_not_cartesian(spark):
    """The fuzzy name join must plan as an equi-join on the blocking
    key — never a cartesian/nested-loop pair enumeration."""
    plan = _formatted(spark, "join_fuzzy_part_names")
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pre_reduce_collapses_hot_keys_map_side(spark):
    """upsert(pre_reduce=True)'s batch collapse must plan with partial
    max_by aggregation — the hot key reduces inside each input task
    before any exchange."""
    import contextlib
    import io

    from quick_stream_spark.operators.dedup import latest_per_key_agg
    from quick_stream_spark.sources.readers import load_table

    df = latest_per_key_agg(
        load_table(spark, SF_SMOKE, "events"),
        keys=("user_id",),
        version_col="ts",
        arrival_col="event_id",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "partial_max_by" in plan


def test_sessionize_reuses_one_user_exchange(spark):
    """Both window passes and the session aggregation share the
    user_id partitioning: exactly ONE hashpartitioning(user_id)
    Exchange in the whole plan — the gap split, the cumulative session
    counter and the per-session groupBy must not each re-shuffle."""
    plan = _formatted(spark, "events_sessionize")
    # formatted mode lists operator arguments separately: count the
    # hashpartitioning specs (one per Exchange instance)
    n = plan.count("hashpartitioning(user_id")
    assert n == 1, f"expected exactly one user_id exchange, got {n}\n{plan}"


def test_new_similarity_and_dedup_plans_avoid_cartesian(spark):
    """Candidate generation in the banded-LSH and substring-span
    operators must be equi-joins — a CartesianProduct or
    BroadcastNestedLoopJoin in these plans is the O(n^2) failure mode
    the banding/hash-grouping exists to avoid.  (The deliberate
    broadcast of the 8-row query set in ANN re-ranking is a broadcast
    HASH join, which remains allowed.)"""
    for name in ("emb_lsh_ann_topk", "dedup_substring_spans", "dedup_url_canonical"):
        plan = _formatted(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_scd2_build_uses_one_key_exchange(spark):
    """The SCD2 history build must shuffle ONCE on the dimension key:
    the run-boundary window, cumulative version counter, per-version
    groupBy and validity lead all share the user_id partitioning."""
    import re

    plan = _formatted(spark, "events_scd2_intervals")
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_scd2_point_in_time_avoids_interval_range_join(spark):
    """The point-in-time lookup must use the union+window as-of shape —
    one user_id exchange carries the version fill-forward; never an
    interval range join (Cartesian/BNLJ pair enumeration)."""
    plan = _formatted(spark, "join_scd2_point_in_time")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


# (the global no-CartesianProduct gate rides inside
# test_no_python_udf_in_jvm_paths's registry walk — one plan build per
# query instead of two)


def test_new_tpch_exports_broadcast_dims_and_partial_aggregate(spark):
    """The r5-exported TPC-H breadth (q7/q8/q9/q13) must keep the
    plan shape that survives 100 TB: every dimension leg broadcasts
    (q7: 10 BHJs, q8: 14, q9: 8 at audit time — gate on a floor), the
    aggregation partial-reduces map-side, and the whole query runs on
    ONE post-join exchange (q13's grouped count needs two: the outer
    join's build + the distribution)."""
    import re

    floors = {
        "q7_volume_shipping": (4, 1),
        "q8_market_share": (6, 1),
        "q9_product_type_profit": (4, 1),
        "q13_customer_distribution": (1, 2),
    }
    for name, (min_bhj, max_exch) in floors.items():
        plan = _formatted(spark, name)
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "partial_sum" in plan or "partial_count" in plan, name
        exch = len(re.findall(r"\(\d+\) Exchange", plan))
        assert exch <= max_exch, f"{name}: {exch} exchanges\n{plan}"


def test_training_order_avoids_global_sort(spark):
    """The global training-order enumeration must never plan a
    rangepartitioning (the one-reducer global sort a naive
    row_number-over-hash would take): positions come from
    bucket-partitioned windows plus the broadcast 64-row offset
    artifact — only hashpartitioning(bucket) exchanges touch data."""
    plan = _formatted(spark, "sample_training_order")
    assert "rangepartitioning" not in plan, plan
    assert "hashpartitioning(bucket" in plan
    assert "BroadcastExchange" in plan  # offsets ride a broadcast, not a shuffle join
