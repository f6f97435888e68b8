"""One-shot r14 window rotation: flip ``pytest_only`` flags in the plans
sources so the exported corpus becomes the queued r14 re-verification
window (VERDICT.md r13 ask #1).  Idempotent; edit the two lists for the
next rotation.
"""

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

# r13 window -> pytest tier (rotate OUT, add the flag)
OUT = [
    "agg_histogram_quantiles", "agg_moments_by_type",
    "dedup_boilerplate_lines", "dedup_embedding_quality_eval",
    "dedup_lsh_quality_eval", "dedup_semantic_kmeans",
    "dedup_simhash", "dedup_url_canonical",
    "diagnose_key_skew_events", "emb_ivf_ann_topk",
    "emb_lsh_signatures", "emb_mips_topk",
    "events_attribution_last_touch", "events_ewma_smooth",
    "events_funnel_conversion", "events_markov_transitions",
    "events_resample_hourly_ffill", "events_rolling_anomaly",
    "join_fuzzy_part_names", "mm_audio_pcm_depths",
    "mm_jpeg_progressive", "mm_mp4_av_demux",
    "mm_mp4_mjpeg_frames", "mm_png_layout_matrix",
    "pivot_unpivot_roundtrip", "q22_sales_opportunity",
    "q4_order_priority", "r_cdc_changes",
    "r_cdc_matview", "r_cdc_replication",
    "r_cdc_stream_feed", "r_dedup_latest_per_key",
    "r_delete_endstate", "r_maintenance_contract",
    "r_multi_table_endstate", "r_stream_upsert_endstate",
    "r_upsert_endstate_pointer", "r_wide_row_endstate",
    "sample_importance_dsir", "sample_mixture_upsample",
    "sample_training_order", "sketch_set_ops_distinct",
    "stream_countmin_heavy_hitters", "stream_dedup_minhash_incremental",
    "stream_distinct_hll", "stream_emb_ann_topk",
    "stream_late_data_watermark", "stream_matview_distinct_users",
    "stream_quality_filter", "stream_session_windows",
]

# queued r14 window -> exported (rotate IN, drop the flag): all 36
# entries last driver-checked r10 (events_twap_per_user and
# join_strategy_hints, displaced from r13 by the two first-time
# entries, at the head) + the alphabetically-first 13 of r11's 50.
# The ONE new first-time entry (`r_stream_upsert_endstate_pointer`,
# registered exported at birth — no flag to drop) takes the 50th slot,
# displacing the 14th alphabetical r11 entry (emb_ivf_trained_topk) to
# the r15 queue head — the standing first-time-priority policy.
IN = [
    "events_twap_per_user", "join_strategy_hints",
    "mm_audio_decode", "mm_image_header_parse",
    "mm_video_frames", "monitor_split_drift_psi",
    "orders_rfm_segments", "pandas_scalar_revenue_cents",
    "pipeline_curation_report", "pipeline_deduped_corpus",
    "pipeline_multimodal_curation", "pipeline_ngram_decontamination",
    "r_incremental_read_zonemap", "r_lookup_composite_endstate",
    "r_point_lookup_endstate", "r_read_where_clustered",
    "r_upsert_endstate", "sample_cluster_safe_split",
    "sample_domain_mixture", "sample_quality_stratified",
    "source_binaryfile_metadata", "source_partitioned_pruning",
    "source_python_stream_datasource", "source_xml_roundtrip",
    "stats_lineitem_correlations", "stream_dedup_clusters_incremental",
    "stream_emb_neardup_incremental", "stream_static_enrich",
    "text_bigram_lm_score", "text_bm25_topk",
    "text_bpe_tokenize", "text_cooccurrence_topk",
    "text_lexical_diversity", "text_quality_classifier_train",
    "text_sequence_packing", "window_range_frame_rolling",
    "agg_approx_distinct_users", "agg_cube_orders",
    "agg_events_by_type", "agg_grouping_analytics",
    "agg_percentiles", "agg_rollup_returns",
    "dedup_exact", "dedup_ngram_jaccard",
    "dedup_simhash_pairs", "dedup_substring_spans",
    "emb_ann_quality_eval", "emb_centroids",
    "emb_cosine_topk",
]

PLANS = list((ROOT / "quick_stream_spark" / "plans").glob("*.py"))

FLAG = (
    "    pytest_only=True,  # r14 rotation out (driver-green r13); "
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
    assert len(exported) == 50, len(exported)
