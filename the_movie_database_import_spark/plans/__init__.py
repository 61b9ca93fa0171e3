"""Query plan registry — importing this package populates REGISTRY.

Registration order is CURATED: the driver's correctness gate records the
first 50 ``queries()`` entries, so DRIVER_WINDOW pins one query per
SURVEY.md §2 component (including every LLM-pipeline / UDF / extension
operator) into that window. The tail past 50 holds redundant variants of
components already covered in-window — each tail entry was driver-green in
a recent CORRECTNESS_r*.json (r12 displaced rows at the head of the tail
for the r13 layout; once CORRECTNESS_r13 lands, the only pre-r09 rows
anywhere are the two annotated displacements heading the r14 queue —
q_agg_cube + q_positive_or_null r07, q_benford_audit r09) and remains
locally oracle-checked by
tests/test_oracle_parity.py and tools/exact_parity.py at every SF.
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

# First 50 = the driver-checked window. ROUND-13 LAYOUT — data-driven from
# the per-query last-green-driver-row ages (recomputed this round over every
# CORRECTNESS_r*.json; pre-rotation distribution: r07x19, r08x7, r09x20,
# r10x46, r11x46, r12x50, never-checked x2):
#
# - The NEW r13 queries are in-window (hard rule, enforced by
#   tests/test_driver_window.py): q_multimodal_decode_image and
#   q_multimodal_decode_audio — the real pure-numpy codec paths
#   (VERDICT r12 #2), plus the round's new operators
#   (q_quality_gopher_rules, q_interval_coalesce,
#   q_er_sorted_neighborhood, q_key_skew_census, ...) — all full-oracle
#   rows. Each new operator displaces one r09-era refresh row whose
#   family keeps other in-window representatives (annotated at their
#   tail entries).
# - The 7 queries whose IMPLEMENTATION changed in r13 keep/take slots so
#   the driver re-checks the new code (standing rule): q_bootstrap_se
#   (sliced-md5 weight lane + when-chain draws + fan-out, VERDICT r12 #3)
#   and the six connected-components consumers, which all inherit the
#   pointer-jumping O(log n) fixpoint (VERDICT r12 #4): q_dedup_clusters,
#   q_split_leakage_safe, q_entity_resolution, q_dedup_savings,
#   q_dedup_savings_minhash, q_dedup_survivors.
# - 17 of the 19 r07-era rows rotate in (VERDICT r12 #1's list — the
#   remaining tail of stale evidence; q_agg_cube yields its slot to the
#   late-r13 graph family and q_positive_or_null to the Kaplan-Meier
#   survival curve — both head the r14 rotation queue).
# - ALL 7 r08-era rows rotate in.
# - The remaining slots refresh r09-era rows, minus five slots taken by
#   the LATE-r13 operators (setjoin-prefix, C4 lines, DSIR, hard
#   negatives, within-doc dedup — never driver-checked, so the hard rule
#   outranks the refresh). The r09 rows left out each have in-window
#   family redundancy, annotated at their tail entries; they head the
#   r14 rotation queue.
DRIVER_WINDOW = [
    # --- new r13 operators (never driver-checked, must be in-window) ---
    "q_multimodal_decode_image",
    "q_multimodal_decode_audio",
    "q_quality_gopher_rules",
    "q_interval_coalesce",
    "q_er_sorted_neighborhood",
    "q_key_skew_census",
    "q_bpe_pair_census",
    "q_bpe_train",
    "q_join_bloom_prefilter",
    "q_dedup_semantic",
    "q_bpe_encode",
    # --- r13 implementation changes earn driver evidence on the new code
    # (bootstrap weight lane; pointer-jumping connected components) ---
    "q_bootstrap_se",
    "q_dedup_clusters",
    "q_split_leakage_safe",
    "q_entity_resolution",
    "q_dedup_savings",
    "q_dedup_savings_minhash",
    "q_dedup_survivors",
    # --- 17 of the 19 remaining r07-era rows refresh (q_agg_cube yields
    # its slot to the late-r13 graph family, q_positive_or_null to the
    # Kaplan-Meier survival query; both HEAD the r14 rotation queue —
    # annotated at their tail entries) ---
    "q_agg_count_distinct",
    "q_agg_first_nonnull",
    "q_agg_grouping_sets",
    "q_agg_percentiles_approx",
    "q_agg_pivot",
    "q_except",
    "q_flagship_star_revenue",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_multiway_star",
    "q_math_fns",
    "q_safe_cast",
    "q_similarity_topk_cosine",
    "q_topk_per_group",
    "q_union_distinct",
    "q_win_rank",
    "q_win_sliding_frame",
    # --- all 7 r08-era rows refresh (clears r08 entirely) ---
    "q_attribution_linear",
    "q_event_transitions",
    "q_events_autocorr",
    "q_golden_record",
    "q_interevent_gaps",
    "q_source_syndication",
    "q_twap_per_user",
    # --- late-r13 new operators (never driver-checked, must be in-window;
    # each displaces one r09-era refresh row to the head of the r14
    # rotation queue — annotated at their tail entries) ---
    "q_dedup_setjoin_prefix",
    "q_quality_c4_lines",
    "q_dsir_importance",
    "q_ann_hard_negatives",
    "q_dedup_within_doc",
    # --- late-r13 graph family (never driver-checked, hard rule): the
    # engine's second hash-exact iterative fixpoint (PageRank on the
    # integer grid, unrolled-CTE oracle) and the degree-ordered triangle
    # census. They take the final r09-refresh slot (q_benford_audit) and
    # one r07 slot (q_agg_cube) — both annotated at their tail entries.
    "q_graph_pagerank",
    "q_graph_triangles",
    # --- late-r13: Kaplan-Meier survival (never driver-checked) ---
    "q_km_survival",
]


# Tail: ordered by evidence freshness — youngest displaced rows first (they
# can vacate precisely because their evidence is newest), the annotated
# r09-era leftovers last. Functionally only the first 50 of the registry
# matter to the driver; the tail order documents the rotation queue. All
# tail queries remain locally oracle-checked by tests/test_oracle_parity.py
# + tools/exact_parity.py at every SF per round.
TAIL_PRIORITY = [
    # --- HEAD OF THE r14 ROTATION QUEUE ---
    "q_positive_or_null",  # r07-era: displaced by the late-r13 Kaplan-Meier
                       # survival query; its null-lane row-op family keeps
                       # q_safe_cast in-window (same junk-guard machinery,
                       # plans/relational.py); locally exact-parity-checked
                       # every round
    "q_agg_cube",      # the other remaining r07-era row: displaced by the
                       # late-r13 graph family; its Expand machinery is
                       # exercised in-window by q_agg_grouping_sets (same
                       # code path, cube = the full grouping-set lattice);
                       # locally exact-parity-checked every round
    "q_benford_audit", # r09-era: displaced by the late-r13 graph family;
                       # census-then-in-row-stat shape shared with the
                       # in-window q_bootstrap_se / q_key_skew_census rows
    # --- green r12 rows displaced by the r13 refresh rotation (the r12
    # window minus the 3 implementation-changed queries that kept slots) ---
    "q_agg_collect_set",
    "q_applyinpandas_group_pct",
    "q_bm25_topk",
    "q_corpus_curation",
    "q_corpus_delta",
    "q_corpus_mix_epochs",
    "q_data_quality_audit",
    "q_date_fns",
    "q_dedup_embedding_cosine_lsh",
    "q_dedup_exact",
    "q_dedup_minhash_incremental",
    "q_dedup_minhash_lsh",
    "q_events_funnel",
    "q_filter_pred",
    "q_fuzzy_name_pairs",
    "q_incremental_dedup",
    "q_intersect",
    "q_join_anti",
    "q_join_inner_equi",
    "q_join_range_binned",
    "q_join_theta_range",
    "q_multimodal_dedup",
    "q_multimodal_features",
    "q_multimodal_metadata",
    "q_multimodal_resize",
    "q_pandas_udf_scalar",
    "q_pricing_summary",
    "q_project_rename",
    "q_sample_fixed_k",
    "q_sample_stratified",
    "q_sample_weighted_k",
    "q_sort_multi_key",
    "q_sql_shared_window",
    "q_stream_stream_join",
    "q_string_fns",
    "q_text_decontaminate",
    "q_text_langid",
    "q_text_repetition",
    "q_text_unigram_nll",
    "q_token_burstiness",
    "q_token_burstiness_incremental",
    "q_training_order",
    "q_vocab_incremental",
    "q_win_lag_lead",
    "q_window_session",
    "q_window_sliding",
    "q_window_watermark",
    # --- green r11 rows ---
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
    "q_conversion_latency",
    "q_corpus_mix_temperature",
    "q_decontaminate_containment",
    "q_dedup_by_key",
    "q_dedup_first_event",
    "q_dedup_spans_incremental",
    "q_dedup_substring_spans",
    "q_doc_fingerprint",
    "q_embedding_pca_spectrum",
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
    # --- the r09-era rows that did not fit the r13 window — each has a
    # standing redundancy story; they head the r14 rotation queue ---
    "q_value_outliers",          # census-then-in-row-stat family: benford
                                 # and mad_per_type cover the shape;
                                 # displaced for the late-r13
                                 # q_dedup_setjoin_prefix slot
    "q_quality_calibrated_keep", # quality-filter family: gopher + the new
                                 # C4 line rules carry the family
                                 # in-window; displaced for the late-r13
                                 # q_quality_c4_lines slot
    "q_fk_orphan_audit",         # audit family: data-quality audit is
                                 # r12-green, benford refreshes in-window;
                                 # displaced for the late-r13
                                 # q_dsir_importance slot
    "q_substring_search_trgm",   # retrieval family: bm25/rrf/trgm share
                                 # the index machinery, bm25 r12-green;
                                 # displaced for the late-r13
                                 # q_ann_hard_negatives slot
    "q_events_cusum",            # change-point family: autocorr + ewma
                                 # cover the per-key ordered-scan shape,
                                 # streaming twin test-pinned; displaced
                                 # for the late-r13 q_dedup_within_doc slot
    "q_join_full_outer",         # join family: broadcast/asof/multiway/
                                 # full refreshes share the join code path;
                                 # displaced for a new r13 operator
    "q_unpivot_melt",            # set-op/reshape family: q_except and
                                 # q_union_distinct in-window; displaced
                                 # for a new r13 operator
    "q_resample_interpolate",    # resample family: same per-key ordered
                                 # scan as q_events_cusum/autocorr
                                 # (in-window); displaced for r13 operator
    "q_rolling_active_users",    # rolling-window family: q_win_sliding
                                 # _frame in-window shares the frame
                                 # machinery; displaced for r13 operator
    "q_chi2_independence",       # census-then-in-row-stat family: benford
                                 # refreshes in-window;
                                 # displaced for a new r13 operator
    "q_token_pair_lift",         # token-census family: bigram_nll stays
                                 # in-window, burstiness/unigram r12-green;
                                 # displaced for a new r13 operator
    "q_conversion_by_deadline",  # conversion family: q_conversion_latency
                                 # shares the journey scan, funnel r12-green;
                                 # displaced for a new r13 operator
    "q_embedding_centroids",     # embedding-census family: the new
                                 # q_dedup_semantic drives the same
                                 # centroid-assignment machinery in-window;
                                 # displaced for a new r13 operator
    "q_text_bigram_nll",         # LM-NLL family: q_text_unigram_nll is
                                 # r12-green on the shared integer-ln lane;
                                 # displaced for a new r13 operator
    "q_attribution_last_touch",  # attribution family: the linear twin
                                 # (q_attribution_linear, r08-era) is
                                 # in-window; both share the journey scan
    "q_events_ewma",             # events time-series family: cusum and
                                 # autocorr (same per-key ordered-scan
                                 # shape) refresh in this window
    "q_except_all",              # set-op family: q_except in-window;
                                 # union_all/union_distinct/intersect all
                                 # r12/r13-green
    "q_union_schema_evolution",  # union family: by-name union is the
                                 # q_union_distinct code path in-window
    "q_welch_ttest",             # two-sample test family: chi2 (same
                                 # census-then-in-row-stat shape) and
                                 # mann_whitney (r11) cover the family
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
