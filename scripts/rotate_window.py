"""One-shot r12 window rotation: flip ``pytest_only`` flags in the plans
sources so the exported corpus becomes the queued r12 re-verification
window (COVERAGE.md). Idempotent; edit the two lists for the next
rotation.
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# r11 window -> pytest tier (rotate OUT, add the flag)
OUT = [
    "r_upsert_endstate_guarded",
    "r_upsert_endstate_manifest",
    "r_read_where_zorder",
    "r_schema_evolution",
    "q3_top_revenue_orders",
    "join_semi_anti",
    "join_full_outer_nation_activity",
    "join_range_events_orders",
    "q10_returned_item_revenue",
    "subquery_orders_above_customer_avg",
    "agg_grouping_analytics",
    "agg_rollup_returns",
    "agg_cube_orders",
    "agg_events_by_type",
    "agg_approx_distinct_users",
    "window_order_analytics",
    "topk_orders",
    "window_lag_event_gaps",
    "sort_top10_orders",
    "set_ops",
    "scalar_part_funcs",
    "scalar_event_funcs",
    "join_lateral_topk_per_nation",
    "join_asof_last_event_before_order",
    "source_roundtrips",
    "pandas_zscore_per_user",
    "agg_percentiles",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_chunking",
    "text_vocabulary_topk",
    "dedup_simhash_pairs",
    "pipeline_decontamination",
    "mm_binary_meta",
    "dedup_substring_spans",
    "emb_cosine_topk",
    "emb_quantize_int8",
    "emb_centroids",
    "emb_ivf_trained_topk",
    "emb_pq_topk",
    "emb_ann_quality_eval",
    "join_bucketed_colocated",
    "sample_splits",
    "stream_drop_duplicates_watermark",
    "events_cohort_retention",
    "stream_windows",
    "stream_matview_hourly",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "pipeline_entity_resolution",
]

# queued r12 window -> exported (rotate IN, drop the flag)
IN = [
    "r_lookup_bloom_endstate",
    # r5 leftovers
    "q2_min_cost_supplier", "recursive_cte_hierarchy",
    "scalar_variant_props", "source_python_datasource",
    "text_bpe_train", "udtf_chunk_docs",
    # all of r6
    "dedup_connected_components", "dedup_embedding_cosine",
    "dedup_minhash_lsh", "emb_lsh_ann_topk", "events_sessionize",
    "mm_image_decode", "pipeline_training_data", "q1_pricing_summary",
    "q5_local_supplier_volume", "quality_constraint_report",
    "r_split_size_classes", "sketch_countmin_heavy_hitters",
    "stream_stateful_user_counter", "stream_stream_interval_join",
    "text_metrics",
    # all of r7
    "emb_hard_negatives", "emb_matryoshka_eval", "events_scd2_intervals",
    "join_bloom_pruned", "join_scd2_point_in_time",
    "maintenance_zorder_stats", "orders_market_basket",
    "profile_orders_columns", "q13_customer_distribution",
    "q14_promo_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "sketch_hll_registers",
    "sketch_linear_counting",
    # 11 alphabetically-first of r8 (q4_order_priority displaced to r13
    # by the new r_pruning_diagnostics flagship, first-time priority)
    "graph_pagerank_dupgraph", "graph_triangles_dupgraph",
    "mm_jpeg_decode", "privacy_k_anonymity_audit", "q11_important_parts",
    "q12_priority_shipping", "q15_top_supplier",
    "q16_parts_supplier_distribution", "q17_small_quantity_revenue",
    "q19_discounted_revenue", "q20_excess_suppliers",
]

PLANS = list((ROOT / "quick_stream_spark" / "plans").glob("*.py"))

FLAG = (
    "    pytest_only=True,  # r12 rotation out (driver-green r11); "
    "still oracle-checked locally\n"
)


def rotate() -> None:
    for path in PLANS:
        lines = path.read_text().splitlines(keepends=True)
        changed = False
        i = 0
        while i < len(lines):
            if "@register(" not in lines[i]:
                i += 1
                continue
            end = i + 1
            while end < len(lines) and not lines[end].startswith(")"):
                end += 1
            block = "".join(lines[i:end + 1])
            name = next((n for n in OUT + IN if f'"{n}"' in block), None)
            if name in OUT and "pytest_only" not in block:
                lines.insert(end, FLAG)
                changed = True
                end += 1
            elif name in IN and "pytest_only" in block:
                for j in range(end, i, -1):
                    if lines[j].lstrip().startswith("pytest_only=True,"):
                        del lines[j]
                        changed = True
            i = end + 1
        if changed:
            path.write_text("".join(lines))
            print(f"edited {path.name}")


if __name__ == "__main__":
    rotate()
    from quick_stream_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    exported = [n for n, s in REGISTRY.items() if not s.pytest_only]
    missing = [n for n in IN if n not in exported]
    stale = [n for n in OUT if n in exported]
    print(f"exported: {len(exported)}")
    assert not missing, f"failed to rotate in: {missing}"
    assert not stale, f"failed to rotate out: {stale}"
