"""Query plan registry — importing this package populates REGISTRY.

Registration order is CURATED: the driver's correctness gate records the
first 50 ``queries()`` entries, so DRIVER_WINDOW pins one query per
SURVEY.md §2 component (including every LLM-pipeline / UDF / extension
operator) into that window. The tail past 50 holds redundant variants of
components already covered in-window — each tail entry was driver-green in
a recent CORRECTNESS_r*.json (r11 displaced rows at the head of the tail
for the r12 layout; the oldest remaining evidence anywhere is r07) and
remains locally oracle-checked by tests/test_oracle_parity.py and
tools/exact_parity.py at every SF.
"""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

from . import relational  # noqa: F401,E402
from . import windows_sets  # noqa: F401,E402
from . import streaming_batch  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import sampling  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import sql_text  # noqa: F401,E402
from . import udfs  # noqa: F401,E402
from . import stats  # noqa: F401,E402

# First 50 = the driver-checked window. ROUND-12 LAYOUT — data-driven from
# the per-query last-green-driver-row ages (computed over every
# CORRECTNESS_r*.json; see the r12 session notes):
#
# - The 3 never-driver-checked r12 queries are in-window (hard rule,
#   enforced by tests/test_driver_window.py): q_dedup_survivors
#   (quality-ranked survivor selection, VERDICT r11 #1),
#   q_dedup_savings_minhash (the banded-edge savings census — the
#   production edge path, VERDICT r11 #2), and
#   q_token_burstiness_incremental (dispersion census served from the
#   widened vocab side table, VERDICT r11 #4).
# - The 4 queries whose IMPLEMENTATION changed in r12 keep slots so the
#   driver re-checks the new code (the standing rule from r08/r10/r11):
#   q_vocab_incremental (side table widened to (token, n, df, sc2)),
#   q_dedup_minhash_incremental (delta signatured once — within-batch leg
#   now enumerates from the cached signature table),
#   q_token_burstiness (report stage extracted to the shared
#   _burstiness_report), q_dedup_savings (census id_col realignment).
# - ALL 15 remaining r06-era rows rotate in (VERDICT r11 #5's list:
#   q_pricing_summary, q_join_range_binned, q_dedup_minhash_lsh,
#   q_join_inner_equi, q_filter_pred, q_project_rename, q_string_fns,
#   q_sample_stratified, q_intersect, plus the 6 displaced late in r11:
#   q_agg_collect_set, q_date_fns, q_sort_multi_key, q_win_lag_lead,
#   q_corpus_mix_epochs, q_text_repetition) — after r12 NO query's last
#   driver row is older than r07.
# - The remaining 28 slots refresh 28 of the 47 r07-era rows, prioritizing
#   queries with no frozen-bench or in-window family redundancy (streaming,
#   UDF, multimodal, corpus-pipeline, text-curation families). The 19
#   r07-era rows left out each carry a standing redundancy story, annotated
#   at their tail entries; they are first in line for the r13 window.
DRIVER_WINDOW = [
    # --- new r12 operators (never driver-checked, must be in-window) ---
    "q_dedup_survivors",
    "q_dedup_savings_minhash",
    "q_token_burstiness_incremental",
    # --- r12 implementation changes earn driver evidence on the new code ---
    "q_vocab_incremental",
    "q_dedup_minhash_incremental",
    "q_token_burstiness",
    "q_dedup_savings",
    # --- all 15 remaining r06-era rows refresh (clears r06 entirely) ---
    "q_agg_collect_set",
    "q_corpus_mix_epochs",
    "q_date_fns",
    "q_dedup_minhash_lsh",
    "q_filter_pred",
    "q_intersect",
    "q_join_inner_equi",
    "q_join_range_binned",
    "q_pricing_summary",
    "q_project_rename",
    "q_sample_stratified",
    "q_sort_multi_key",
    "q_string_fns",
    "q_text_repetition",
    "q_win_lag_lead",
    # --- 28 of the 47 r07-era rows refresh (the 19 left out are annotated
    # at their tail entries and head the r13 rotation queue) ---
    "q_applyinpandas_group_pct",
    "q_bm25_topk",
    "q_corpus_curation",
    "q_corpus_delta",
    "q_data_quality_audit",
    "q_dedup_embedding_cosine_lsh",
    "q_dedup_exact",
    "q_events_funnel",
    "q_fuzzy_name_pairs",
    "q_incremental_dedup",
    "q_join_anti",
    "q_join_theta_range",
    "q_multimodal_dedup",
    "q_multimodal_features",
    "q_multimodal_metadata",
    "q_multimodal_resize",
    "q_pandas_udf_scalar",
    "q_sample_fixed_k",
    "q_sample_weighted_k",
    "q_sql_shared_window",
    "q_stream_stream_join",
    "q_text_decontaminate",
    "q_text_langid",
    "q_text_unigram_nll",
    "q_training_order",
    "q_window_session",
    "q_window_sliding",
    "q_window_watermark",
]


# Tail: ordered by evidence freshness — youngest displaced rows first (they
# can vacate precisely because their evidence is newest), the annotated
# r07-era leftovers last. Functionally only the first 50 of the registry
# matter to the driver; the tail order documents the rotation queue. All
# tail queries remain locally oracle-checked by tests/test_oracle_parity.py
# + tools/exact_parity.py at every SF per round.
TAIL_PRIORITY = [
    # --- green r11 rows displaced by the r12 refresh rotation (the r11
    # window minus the 4 implementation-changed queries that kept slots) ---
    "q_agg_approx_count_distinct",
    "q_agg_count_by_value",
    "q_agg_multi",
    "q_agg_percentiles",
    "q_agg_rollup",
    "q_ann_recall_probe",
    "q_apply_delta",
    "q_array_fns",
    "q_boilerplate_census",
    "q_corpus_mix",
    "q_dedup_canonical",
    "q_dedup_clusters",
    "q_dedup_embedding_cosine",
    "q_dedup_paragraphs",
    "q_dedup_simhash",
    "q_heavy_hitters",
    "q_join_left_outer",
    "q_join_salted_skew",
    "q_join_semi",
    "q_json_fns",
    "q_ks_value_drift",
    "q_mann_whitney_u",
    "q_multimodal_frame_sample",
    "q_numeric_histogram",
    "q_oov_rate",
    "q_pack_greedy",
    "q_pandas_udf_grouped_agg",
    "q_retention_cohorts",
    "q_scd2_history",
    "q_shuffle_shards",
    "q_similarity_ivf_topk",
    "q_similarity_ivfpq_served",
    "q_source_vocab_overlap",
    "q_sql_shared_text",
    "q_stateful_user_totals",
    "q_surrogate_keys",
    "q_text_ngram_jaccard",
    "q_text_quality",
    "q_text_redact_pii",
    "q_text_tfidf_cosine_pairs",
    "q_text_tfidf_top_term",
    "q_token_count",
    "q_vocab_growth",
    "q_win_ntile_pctrank",
    "q_win_running_sum",
    "q_window_tumbling",
    # --- green r10 rows ---
    "q_ab_funnel_lift",
    "q_agg_avg_per_key",
    "q_bootstrap_se",
    "q_conversion_latency",
    "q_corpus_mix_temperature",
    "q_decontaminate_containment",
    "q_dedup_by_key",
    "q_dedup_first_event",
    "q_dedup_spans_incremental",
    "q_dedup_substring_spans",
    "q_doc_fingerprint",
    "q_embedding_pca_spectrum",
    "q_entity_resolution",
    "q_events_sessionize",
    "q_hybrid_rrf_topk",
    "q_label_coherence",
    "q_local_supplier_volume",
    "q_mad_per_type",
    "q_pipeline_end_to_end",
    "q_psi_value_drift",
    "q_quality_classifier",
    "q_resample_daily",
    "q_revenue_change_q6",
    "q_sample_split",
    "q_sample_weighted_per_source",
    "q_seasonal_zscore",
    "q_select_token_budget",
    "q_shipping_priority_q3",
    "q_similarity_ivfpq_topk",
    "q_similarity_lsh_topk",
    "q_similarity_pq_served",
    "q_similarity_pq_topk",
    "q_source_concentration",
    "q_split_leakage_safe",
    "q_temporal_dim_join",
    "q_text_chunks",
    "q_text_jaccard_pairs",
    "q_text_vocab_coverage",
    "q_token_entropy",
    "q_token_kl_divergence",
    "q_topk_global",
    "q_trend_per_type",
    "q_union_all",
    "q_win_time_range",
    "q_winsorized_mean",
    "q_zipf_fit",
    # --- green r09 rows ---
    "q_attribution_last_touch",
    "q_benford_audit",
    "q_chi2_independence",
    "q_conversion_by_deadline",
    "q_embedding_centroids",
    "q_events_cusum",
    "q_events_ewma",
    "q_except_all",
    "q_fk_orphan_audit",
    "q_join_full_outer",
    "q_quality_calibrated_keep",
    "q_resample_interpolate",
    "q_rolling_active_users",
    "q_substring_search_trgm",
    "q_text_bigram_nll",
    "q_token_pair_lift",
    "q_union_schema_evolution",
    "q_unpivot_melt",
    "q_value_outliers",
    "q_welch_ttest",
    # --- green r08 rows ---
    "q_attribution_linear",
    "q_event_transitions",
    "q_events_autocorr",
    "q_golden_record",
    "q_interevent_gaps",
    "q_source_syndication",
    "q_twap_per_user",
    # --- the 19 r07-era rows that did not fit the r12 window — each has a
    # standing redundancy story; they head the r13 rotation queue ---
    "q_flagship_star_revenue",   # entry() flagship + frozen bench, executed
                                 # and smoke-checked every round
    "q_join_multiway_star",      # frozen headline bench re-executes per round
    "q_join_asof",               # headline bench re-measures per round
    "q_similarity_topk_cosine",  # headline bench (similarity_topk) per round
    "q_topk_per_group",          # headline bench re-executes per round
    "q_join_broadcast",          # join family reps semi/left/salted r11;
                                 # broadcast exercised by most in-window plans
    "q_math_fns",                # row-ops reps json/array r11 + date/string/
                                 # filter/project refreshing in this window
    "q_positive_or_null",        # row-op twin, same family rep story
    "q_safe_cast",               # golden ETL exercises safe_cast per round
    "q_union_distinct",          # set-op family: union_all r10, intersect
                                 # in-window, except/except_all r09/r10
    "q_except",                  # same set-op family story
    "q_win_rank",                # window family: running_sum/ntile r11,
                                 # lag_lead in-window
    "q_win_sliding_frame",       # same window family story
    "q_agg_percentiles_approx",  # agg family: percentiles r11 exact twin,
                                 # approx_count_distinct r11
    "q_agg_first_nonnull",       # agg family reps multi/rollup/count r11
    "q_agg_cube",                # grouping-sets code family: rollup r11
    "q_agg_grouping_sets",       # same grouping-sets family
    "q_agg_pivot",               # same family
    "q_agg_count_distinct",      # count_by_value + approx variant r11
]


def _wrap_release(spec: QuerySpec) -> QuerySpec:
    """Starting a query releases the PREVIOUS query's tracked caches, so a
    long-lived session sweeping the registry retains at most one query's
    working set (VERDICT r01 #8). The current query's own caches stay live —
    its returned DataFrame hasn't executed yet.

    ASSUMPTION: builders and executions interleave strictly (build q1 ->
    execute q1 -> build q2 -> ...), which is how the driver, bench.py, and
    tests consume the registry. A consumer that builds several DataFrames
    before executing the first would have its earlier queries' caches
    released mid-flight — results stay CORRECT (unpersist only drops the
    materialized blocks; lineage recomputes), but the intra-query cache
    reuse degrades to recomputation. If such a consumer appears, release on
    execution boundaries (QueryExecutionListener) instead of build time."""
    import dataclasses

    from ..session import release_caches

    inner = spec.spark_fn

    def fn(spark, sf_dir):
        release_caches()
        return inner(spark, sf_dir)

    fn.__doc__ = inner.__doc__
    fn.__name__ = inner.__name__
    return dataclasses.replace(spec, spark_fn=fn)


def _reorder() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    placed = set(DRIVER_WINDOW) | set(TAIL_PRIORITY)
    rest = [n for n in REGISTRY if n not in placed]
    ordered = {
        n: _wrap_release(REGISTRY[n])
        for n in [*DRIVER_WINDOW, *[t for t in TAIL_PRIORITY if t in REGISTRY], *rest]
    }
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
