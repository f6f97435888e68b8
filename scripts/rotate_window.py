"""One-shot r13 window rotation: flip ``pytest_only`` flags in the plans
sources so the exported corpus becomes the queued r13 re-verification
window (COVERAGE.md). Idempotent; edit the two lists for the next
rotation.
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# r12 window -> pytest tier (rotate OUT, add the flag)
OUT = [
    "r_lookup_bloom_endstate",
    "r_pruning_diagnostics",
    "q2_min_cost_supplier", "recursive_cte_hierarchy",
    "scalar_variant_props", "source_python_datasource",
    "text_bpe_train", "udtf_chunk_docs",
    "dedup_connected_components", "dedup_embedding_cosine",
    "dedup_minhash_lsh", "emb_lsh_ann_topk", "events_sessionize",
    "mm_image_decode", "pipeline_training_data", "q1_pricing_summary",
    "q5_local_supplier_volume", "quality_constraint_report",
    "r_split_size_classes", "sketch_countmin_heavy_hitters",
    "stream_stateful_user_counter", "stream_stream_interval_join",
    "text_metrics",
    "emb_hard_negatives", "emb_matryoshka_eval", "events_scd2_intervals",
    "join_bloom_pruned", "join_scd2_point_in_time",
    "maintenance_zorder_stats", "orders_market_basket",
    "profile_orders_columns", "q13_customer_distribution",
    "q14_promo_revenue", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "sketch_hll_registers",
    "sketch_linear_counting",
    "graph_pagerank_dupgraph", "graph_triangles_dupgraph",
    "mm_jpeg_decode", "privacy_k_anonymity_audit", "q11_important_parts",
    "q12_priority_shipping", "q15_top_supplier",
    "q16_parts_supplier_distribution", "q17_small_quantity_revenue",
    "q19_discounted_revenue", "q20_excess_suppliers",
]

# queued r13 window -> exported (rotate IN, drop the flag).  The TWO
# new first-time entries (`r_maintenance_contract` and the benched
# `r_upsert_endstate_pointer`) are registered exported at birth (no
# flag to drop) and take the 49th/50th slots, displacing the 15th and
# 16th alphabetical r10 entries (events_twap_per_user,
# join_strategy_hints) to the r14 queue head — the same
# first-time-priority precedent as r11/r12.
IN = [
    # r8 leftovers (7; q4_order_priority displaced from r12 by the
    # pruning flagship)
    "q4_order_priority", "sample_mixture_upsample",
    "sample_training_order", "sketch_set_ops_distinct",
    "stream_countmin_heavy_hitters", "stream_distinct_hll",
    "stream_matview_distinct_users",
    # all 27 entries last driver-checked r9
    "agg_histogram_quantiles", "dedup_simhash", "emb_ivf_ann_topk",
    "events_funnel_conversion", "join_fuzzy_part_names",
    "mm_audio_pcm_depths", "mm_jpeg_progressive", "mm_mp4_av_demux",
    "mm_mp4_mjpeg_frames", "mm_png_layout_matrix",
    "pivot_unpivot_roundtrip", "q22_sales_opportunity", "r_cdc_changes",
    "r_cdc_matview", "r_cdc_replication", "r_cdc_stream_feed",
    "r_dedup_latest_per_key", "r_delete_endstate",
    "r_multi_table_endstate", "r_stream_upsert_endstate",
    "r_wide_row_endstate", "sample_importance_dsir",
    "stream_dedup_minhash_incremental", "stream_emb_ann_topk",
    "stream_late_data_watermark", "stream_quality_filter",
    "stream_session_windows",
    # 14 alphabetically-first of r10's 50
    "agg_moments_by_type", "dedup_boilerplate_lines",
    "dedup_embedding_quality_eval", "dedup_lsh_quality_eval",
    "dedup_semantic_kmeans", "dedup_url_canonical",
    "diagnose_key_skew_events", "emb_lsh_signatures", "emb_mips_topk",
    "events_attribution_last_touch", "events_ewma_smooth",
    "events_markov_transitions", "events_resample_hourly_ffill",
    "events_rolling_anomaly",
]

PLANS = list((ROOT / "quick_stream_spark" / "plans").glob("*.py"))

FLAG = (
    "    pytest_only=True,  # r13 rotation out (driver-green r12); "
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
