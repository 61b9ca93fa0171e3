"""Query plan registry — importing this package populates REGISTRY.

Registration order is CURATED: the driver's correctness gate records the
first 50 ``queries()`` entries, so DRIVER_WINDOW pins one query per
SURVEY.md §2 component (including every LLM-pipeline / UDF / extension
operator) into that window. The tail past 50 holds redundant variants of
components already covered in-window — each tail entry was driver-green in
a recent CORRECTNESS_r*.json (r08/r09 at the head of the tail for the r10
layout) and remains locally oracle-checked by tests/test_oracle_parity.py
and tools/exact_parity.py at every SF.
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

# First 50 = the driver-checked window. Round-10 rotation on top of the
# r09 layout: the never-driver-checked r10 queries (persisted-ANN serve
# path, token-entropy census) are in-window; q_similarity_lsh_topk rotates
# in because its r09 multi-probe upgrade never earned a driver row on the
# new code (VERDICT r09 #3); and the 10 stalest green rows (all r05-era)
# rotate back through for fresh evidence (VERDICT r09 #7) — every
# displaced query is green-r09, keeps a family representative or per-round
# local pin, and is annotated at both ends. The r09 narrative below is
# retained where its displacement reasoning still governs rows.
#
# Round-9 rotation on top of the
# r08 layout (each in-window displacement is annotated in place, both here
# and at the tail entry it freed): the seven never-driver-checked r09
# queries (PSI census, PQ ANN, IVFPQ ANN, seasonal z-score, TPC-H Q3
# analog, MAD census, source-concentration census; the r09 multi-probe
# upgrade rides the existing rows-only q_similarity_lsh_topk tail entry)
# took slots from seven green-r08 queries whose families keep in-window
# representatives (q_events_autocorr, q_twap_per_user, q_interevent_gaps,
# q_golden_record, q_source_syndication, q_event_transitions,
# q_attribution_linear — annotated at both ends). The r08 narrative below is
# retained because its displacement reasoning still governs most rows:
#
# - the three queries whose IMPLEMENTATION changed in r08 keep slots (the
#   span-dedup pair + the daily pipeline composite);
# - VERDICT r07 #1's stale-evidence rotation: the r05-era tail queries
#   rotated in; as the round added new operators, the members of that
#   set with REDUNDANT live coverage yielded slots back — queries the
#   FROZEN HEADLINE BENCH re-executes every round (window_tumbling,
#   win_running_sum, text_quality, json_fns, agg_multi via rollup +
#   pricing), and queries whose family keeps another in-window
#   representative (each annotated);
# - every NEW r08 operator is in-window (never-driver-checked rule):
#   session 1's five (token budget, temperature mix, ML quality
#   classifier, KL drift, RRF), session 2's analytics/window set, and
#   sessions 3-4's statistical censuses (OLS trend, autocorr, chi2,
#   Welch t, Markov transitions, both attributions), time-series ops
#   (TWAP, gap quartiles, CUSUM, interpolation, conversion latency +
#   deadline curve), curation/search ops (calibrated keep, syndication
#   matrix, bigram NLL, trigram substring search), warehouse ops
#   (golden record, entity resolution, temporal SCD2 join, TPC-H Q5/Q6
#   analogs), and the sketch/ML pair (HLL rolling distinct, PCA
#   spectrum — rows-only with pinned local evidence).
#
# Every displaced query keeps its r05/r06/r07 driver row, a live family
# representative or per-round bench execution, and the full-registry
# tools/exact_parity.py sweep on current testdata at sf0.01 AND sf0.1.
DRIVER_WINDOW = [
    # --- r08 implementation changes earn driver evidence on the new code ---
    "q_dedup_substring_spans",   # lambda-bound grams + array_except rebuild
    "q_dedup_spans_incremental", # + side-table distinctness now trusted
    "q_pipeline_end_to_end",     # composite gains the span-dedup stage
    # --- rotated in: newest driver rows were r05-era (VERDICT r07 #1) ---
    "q_split_leakage_safe",
    # --- new r08 session-3 operators (never driver-checked): the six
    # statistical-census queries (plans/stats.py). Slots freed by the
    # three r06-refresh fillers (q_pricing_summary: exercised by the
    # headline bench every round; q_join_inner_equi: flagship/multiway
    # exercise inner joins and q_join_semi stays in-window;
    # q_surrogate_keys: its maybe_broadcast claim is redundant —
    # q_dedup_spans_incremental and q_text_decontaminate guard-sites are
    # in-window) and by three r05-rotation entries whose families keep
    # an in-window representative (q_agg_count_by_value: avg_per_key +
    # multi stay; q_dedup_canonical: by_key + clusters stay;
    # q_text_ngram_jaccard: jaccard_pairs stays) — all six displaced
    # queries keep their r05/r06 rows and the full-registry
    # tools/exact_parity.py sweep on current testdata. ---
    "q_trend_per_type",          # per-key OLS drift census (regr_* aggs)
    "q_psi_value_drift",         # NEW r09: Population Stability Index per
                                 # key (Laplace-smoothed sparse bin census,
                                 # 1e-6 ln grid) — never driver-checked, so
                                 # in-window; slot freed by
                                 # q_events_autocorr -> tail (green r08 row;
                                 # trend/chi2/welch keep the statistical-
                                 # census family in-window)
    "q_mad_per_type",            # NEW r09: median-absolute-deviation
                                 # robust dispersion census (exact order-
                                 # statistic lane) — never driver-checked,
                                 # so in-window; slot freed by
                                 # q_event_transitions -> tail (green r08
                                 # row; attribution_last_touch + trend +
                                 # psi keep event/stats censuses in-window)
    "q_ks_value_drift",          # NEW r10: two-sample Kolmogorov–Smirnov
                                 # drift per key (census + shared-
                                 # partitioning windows; exact 128-bit
                                 # integer numerator max) — never
                                 # driver-checked, so in-window; slot freed
                                 # by q_welch_ttest -> tail (green r09 row;
                                 # trend + psi + mad + source_concentration
                                 # + ks keep the statistical-census family
                                 # in-window)
    # --- ...and the three time-series/curation follow-ups. Slots freed
    # by three r05-rotation entries that the FROZEN HEADLINE BENCH
    # re-executes every round anyway (execution evidence per-round, and
    # local exact-parity at every SF): q_window_tumbling,
    # q_win_running_sum, q_text_quality — streaming keeps
    # dedup_first_event + stateful_user_totals in-window, windows keep
    # win_time_range, text censuses keep token_count + vocab_coverage. ---
    "q_similarity_pq_topk",      # NEW r09: product-quantization compressed
                                 # ANN (ADC + exact re-rank; 0.932 recall
                                 # pin at 32x compression) — never
                                 # driver-checked, so in-window; slot freed
                                 # by q_twap_per_user -> tail (green r08
                                 # row; gap_quantiles + cusum + interpolate
                                 # keep time-series in-window)
    "q_seasonal_zscore",         # NEW r09: day-of-week seasonal residual
                                 # z-score census (decimal-grid day totals,
                                 # moment-lane weekday baseline) — never
                                 # driver-checked, so in-window; slot freed
                                 # by q_interevent_gaps -> tail (green r08
                                 # row; cusum + interpolation + deadline
                                 # curve keep time-series in-window)
    "q_shipping_priority_q3",    # NEW r09: TPC-H Q3 analog — the canon's
                                 # join-agg-rank member (2 broadcasts, one
                                 # exchange, TakeOrderedAndProject pinned);
                                 # slot freed by q_golden_record -> tail
                                 # (green r08 row; entity_resolution +
                                 # temporal_dim_join keep the warehouse
                                 # family in-window)
    "q_similarity_ivfpq_topk",   # NEW r09: IVF x PQ composed ANN (probe-
                                 # pruned code scan + exact re-rank; PQ
                                 # costs <=0.05 recall over IVF-Flat,
                                 # pinned) — never driver-checked, so
                                 # in-window; slot freed by
                                 # q_source_syndication -> tail (green r08
                                 # row; spans + paragraphs + tfidf pairs
                                 # keep near-dup censuses in-window)
    "q_source_concentration",    # NEW r09: corpus-concentration census
                                 # (top share, HHI, Gini over exact integer
                                 # token totals) — never driver-checked, so
                                 # in-window; slot freed by
                                 # q_attribution_linear -> tail (green r08
                                 # row; attribution_last_touch keeps the
                                 # attribution family in-window)
    "q_local_supplier_volume",   # TPC-H Q5 analog: two dim paths meet on
                                 # nationhood, 5 broadcasts, one exchange;
                                 # slot freed by q_text_vocab_coverage ->
                                 # tail (q_token_count keeps text censuses
                                 # in-window)
    "q_revenue_change_q6",       # TPC-H Q6 analog: the pure pushed-filter
                                 # scan; slot freed by q_dedup_first_event ->
                                 # tail (stateful_user_totals keeps streaming
                                 # in-window; sliding/session/watermark hold
                                 # r07 rows)
    "q_entity_resolution",       # fuzzy-pair -> connected-components ->
                                 # survivorship composite; slot freed by
                                 # q_dedup_clusters -> tail (the composite
                                 # RUNS connected_components, so the
                                 # component keeps driver coverage)
    "q_temporal_dim_join",       # fact-to-SCD2 versioned-dimension join
                                 # (composes the proven scd2_history); slot
                                 # freed by q_pack_greedy -> tail
                                 # (q_training_order composite packs shards
                                 # in tail with an r07 row; chunking keeps
                                 # local parity)
    "q_embedding_pca_spectrum",  # MLlib PCA anisotropy screen (rows-only +
                                 # numpy-pinned spectrum; MLlib paths earn
                                 # driver-env execution evidence like the
                                 # quality classifier); slot freed by
                                 # q_agg_multi -> tail (rollup + pricing in
                                 # the frozen headline bench re-execute the
                                 # multi-aggregate shape every round)
    "q_bootstrap_se",            # one-pass Poisson-bootstrap error bars
                                 # (md5 Poisson weights, 2B+2 sums, in-row
                                 # SE); slot freed by q_join_semi -> tail
                                 # (Q5/Q6 + flagship keep joins in-window;
                                 # q_join_anti holds an r07 row)
    "q_ab_funnel_lift",          # experimentation readout (hash split +
                                 # funnel conversion + pooled z); slot freed
                                 # by q_stateful_user_totals -> tail
                                 # (stream_cusum parity-tests the
                                 # applyInPandasWithState path per round;
                                 # sliding/session/watermark hold r07 rows)
    "q_sample_weighted_per_source",  # NEW r10: stratified A-ES weighted
                                 # top-k per source (pow-grid lane, salt-
                                 # specific margins pinned) — never driver-
                                 # checked, so in-window; slot freed by
                                 # q_fk_orphan_audit -> tail (green r09
                                 # row; the golden ETL's FK-safe write
                                 # order + live-FK Derby test run every
                                 # round; data_quality_audit holds r07)
    "q_winsorized_mean",         # NEW r10: IQR-winsorized robust mean per
                                 # key (order-stat + fold-replay lanes) —
                                 # never driver-checked, so in-window; slot
                                 # freed by q_embedding_centroids -> tail
                                 # (green r09 row; in-window
                                 # q_label_coherence RUNS label_centroids —
                                 # the dedup_clusters precedent)
    "q_zipf_fit",                # NEW r10: per-source Zipf rank-frequency
                                 # OLS (1e-6 ln grid on both axes, exact
                                 # 128-bit moment sums) — never driver-
                                 # checked, so in-window; slot freed by
                                 # q_token_pair_lift -> tail (green r09 row;
                                 # token_entropy + heavy_hitters + zipf keep
                                 # token censuses in-window)
    "q_mann_whitney_u",          # NEW r10: Mann–Whitney U rank-sum test per
                                 # key (doubled-rank exact-integer lane,
                                 # tie-corrected z; completes the drift/AB
                                 # panel beside PSI/KS/Welch) — never
                                 # driver-checked, so in-window; slot freed
                                 # by q_value_outliers -> tail (green r09
                                 # row; mad_per_type keeps robust dispersion
                                 # in-window, Tukey fences pinned locally)
    "q_heavy_hitters",           # NEW r10: Misra–Gries phi-heavy hitters
                                 # with exact candidate recount (sketch-
                                 # accelerated yet oracle-hash-exact) —
                                 # never driver-checked, so in-window; slot
                                 # freed by q_union_schema_evolution -> tail
                                 # (green r09 row; q_union_all keeps set-ops
                                 # in-window, by-name NULL-fill pin local)
    "q_decontaminate_containment",  # NEW r10: graded benchmark-containment
                                 # audit (PaLM/FLAN >=tau overlap policy;
                                 # in-row denominator + broadcast gram
                                 # probe) — never driver-checked, so
                                 # in-window; slot freed by
                                 # q_join_full_outer -> tail (green r09 row;
                                 # Q3/Q5/Q6 + entity_resolution keep joins
                                 # in-window, SMJ FullOuter pin local)
    "q_conversion_latency",      # latency quartiles (restored: the repo's
                                 # own insurance test — correctly — rejects
                                 # leaving any never-driver-checked query
                                 # out of the window); slot freed by
                                 # q_text_redact_pii -> tail (the in-window
                                 # pipeline composite RUNS the redact stage;
                                 # corpus CLI pins no-PII end-to-end)
    # --- new r08 operators: never driver-checked, must be in-window ---
    "q_select_token_budget", # token-budget corpus selection (greedy-exact)
    "q_corpus_mix_temperature",  # alpha-temperature mixing, in-plan weights
    "q_quality_classifier",  # seed-vs-crawl LR filter (rows-only, iterative)
    "q_token_kl_divergence", # per-lang distribution-drift census (1e-6 grid)
    "q_hybrid_rrf_topk",     # BM25 ⊕ cosine reciprocal-rank fusion (RAG hybrid)
    # --- new r08 session-2 operators (never driver-checked) ---
    "q_events_sessionize",   # gap-based batch sessionization (stream twin of
                             # q_window_session); sort slot freed by
                             # q_sort_multi_key -> tail (q_topk_global keeps
                             # the family in-window)
    "q_win_time_range",      # trailing 7-day time-RANGE frame; window slot
                             # freed by q_win_lag_lead -> tail (this entry is
                             # now the window family's in-window rep)
    "q_resample_daily",      # daily grid + forward fill; slot freed by
                             # q_project_rename -> tail (q_filter_pred +
                             # q_string_fns keep row-ops in-window)
    "q_label_coherence",     # nearest-centroid confusion census; slot
                             # freed by q_join_left_outer -> tail
                             # (q_join_inner_equi + q_join_semi keep
                             # joins in-window)
    "q_similarity_pq_served", # NEW r10: PQ top-k SERVED from a persisted
                             # snapshot-table index (stored codes +
                             # codebook sidecar committed atomically; no
                             # in-query k-means) — never driver-checked,
                             # so in-window; slot freed by q_events_ewma
                             # -> tail (green r09 row; cusum + seasonal
                             # z-score + interpolation keep time-series
                             # in-window)
    "q_text_tfidf_cosine_pairs",  # lexical-weighted near-dup pairs; slot
                             # freed by q_agg_percentiles -> tail
                             # (q_value_outliers keeps exact-quantile
                             # machinery in-window)
    # --- r10 rotation (VERDICT r09 #3/#7 + the new r10 operator) ---
    "q_token_entropy",       # NEW r10: per-source Shannon-entropy diversity
                             # census (1e-6 ln grid) — never driver-checked,
                             # so in-window; slot freed by q_benford_audit ->
                             # tail (green r09 row; trend/welch/psi/mad/
                             # source_concentration keep stats censuses
                             # in-window)
    "q_similarity_lsh_topk", # VERDICT r09 #3: the r09 multi-probe upgrade
                             # (n_probe=10, Lv et al.) rode this rows-only
                             # entry in the tail and has never earned a
                             # driver row on the new code — in-window now;
                             # slot freed by q_quality_calibrated_keep ->
                             # tail (green r09 row; quality_classifier +
                             # token_kl keep the quality family in-window)
    # --- VERDICT r09 #7: the 10 stalest green rows (all r05-era — three
    # rounds of testdata generations ago) rotate back through the window
    # for fresh driver evidence; each vacating query is annotated at its
    # tail entry ---
    "q_doc_fingerprint",     # r05 row; slot freed by q_rolling_active_users
                             # -> tail (green r09 rows-only row; the HLL
                             # <=5% error pin runs locally every round)
    "q_dedup_by_key",        # r05 row; slot freed by q_text_bigram_nll ->
                             # tail (green r09 row; token_kl + token_entropy
                             # keep the ln-lane text censuses in-window)
    "q_agg_avg_per_key",     # r05 row; slot freed by q_events_cusum -> tail
                             # (green r09 row; seasonal z-score + resample
                             # keep time-series in-window; stream_cusum
                             # parity-pins the same closed form per round)
    "q_text_jaccard_pairs",  # r05 row; slot freed by q_resample_interpolate
                             # -> tail (green r09 row; q_resample_daily
                             # keeps the resample family in-window)
    "q_sample_split",        # r05 row; slot freed by
                             # q_conversion_by_deadline -> tail (green r09
                             # row; q_conversion_latency stays in-window —
                             # same per-user window machinery)
    "q_text_chunks",         # r05 row; slot freed by q_substring_search_trgm
                             # -> tail (green r09 row; byte-equal-to-naive
                             # pin + trgm showcase run locally every round)
    "q_union_all",           # r05 row; becomes the set-op in-window rep;
                             # slot freed by q_except_all -> tail (green r09
                             # row)
    "q_text_vocab_coverage", # r05 row; slot freed by q_unpivot_melt -> tail
                             # (green r09 row; pivot holds an r07 row and
                             # the Expand-node pin runs locally)
    "q_dedup_first_event",   # r05 row; slot freed by q_attribution_last_touch
                             # -> tail (green r09 row; sessionize +
                             # conversion_latency keep event analytics
                             # in-window)
    "q_topk_global",         # r05 row; slot freed by q_chi2_independence ->
                             # tail (green r09 row; welch + trend + psi +
                             # mad keep the statistical-census family
                             # in-window)
]


# Tail: every entry holds a green driver row from r06/r07 (both on recent
# testdata generations) and remains locally oracle-checked by
# tests/test_oracle_parity.py + tools/exact_parity.py at every SF. Listed
# r07-rows first (freshest evidence), then the r06-rows that did not fit
# the r08 window (next rotation candidates).
TAIL_PRIORITY = [
    # --- slots displaced by the r10 rotation (each vacated for a
    # never-driver-checked r10 query, the multi-probe LSH evidence gap, or
    # an r05-era stale-evidence refresh — the in-window entry that took
    # each slot carries the matching annotation) ---
    "q_benford_audit",        # green r09 row; trend/welch/psi/mad/
                              # source_concentration keep stats censuses
                              # in-window; local exact-parity every round
    "q_welch_ttest",          # green r09 row; trend + psi + mad + ks keep
                              # the statistical-census family in-window
    "q_union_schema_evolution",  # green r09 row; q_union_all keeps set-ops
                              # in-window; by-name NULL-fill semantics
                              # pinned locally every round
    "q_join_full_outer",      # green r09 row; Q3/Q5/Q6 +
                              # entity_resolution keep joins in-window;
                              # the SMJ-FullOuter preservation pin runs
                              # locally every round
    "q_value_outliers",       # green r09 row; mad_per_type keeps robust
                              # dispersion in-window; Tukey-fence hand
                              # cases pinned locally every round
    "q_token_pair_lift",      # green r09 row; token_entropy +
                              # heavy_hitters + zipf_fit keep token
                              # censuses in-window; A-priori hand case
                              # pinned locally every round
    "q_embedding_centroids",  # green r09 row; in-window q_label_coherence
                              # RUNS label_centroids (the dedup_clusters
                              # precedent keeps the component driver-
                              # covered); quantized-fold pins run locally
    "q_fk_orphan_audit",      # green r09 row; the golden ETL's FK-safe
                              # write order + live-FK Derby test run every
                              # round; q_data_quality_audit holds an r07
                              # row for the audit family
    "q_quality_calibrated_keep",  # green r09 row; quality_classifier +
                              # token_kl keep the quality family in-window
    "q_rolling_active_users", # green r09 rows-only row; the mergeable-HLL
                              # <=5% error pin runs locally every round
    "q_text_bigram_nll",      # green r09 row; token_kl + token_entropy keep
                              # the ln-lane text censuses in-window
    "q_events_cusum",         # green r09 row; stream_cusum parity-pins the
                              # same integer prefix-min closed form per
                              # round; seasonal z + resample keep time-series
    "q_resample_interpolate", # green r09 row; q_resample_daily keeps the
                              # resample family in-window
    "q_conversion_by_deadline",  # green r09 row; q_conversion_latency stays
                              # in-window (same per-user window machinery)
    "q_substring_search_trgm",  # green r09 row; byte-equal-to-naive pin +
                              # trgm showcase run locally every round
    "q_except_all",           # green r09 row; q_union_all rotates in as the
                              # set-op family's in-window rep
    "q_unpivot_melt",         # green r09 row; pivot holds an r07 row; the
                              # native-Expand no-exchange pin runs locally
    "q_attribution_last_touch",  # green r09 row; sessionize +
                              # conversion_latency keep event analytics
                              # in-window; attribution_linear holds r08
    "q_chi2_independence",    # green r09 row; welch + trend + psi + mad
                              # keep the statistical-census family in-window
    # slot displaced by the never-driver-checked r10 persisted-ANN query
    "q_events_ewma",          # green r09 row; cusum + seasonal z-score +
                              # interpolation keep time-series in-window;
                              # the EWMA fold lane is also parity-tested
                              # locally at both SFs every round
    # slots displaced by the never-driver-checked r09 queries (PSI, PQ)
    "q_events_autocorr",      # green r08 row; trend/chi2/welch/psi keep the
                              # statistical-census family in-window; local
                              # exact-parity at both SFs every round
    "q_twap_per_user",        # green r08 row; gap_quantiles + cusum +
                              # interpolation keep time-series in-window;
                              # local exact-parity at both SFs every round
    "q_interevent_gaps",      # green r08 row; cusum + interpolation +
                              # deadline curve keep time-series in-window;
                              # local exact-parity at both SFs every round
    "q_golden_record",        # green r08 row; entity_resolution +
                              # temporal_dim_join keep the warehouse family
                              # in-window; local exact-parity at both SFs
    "q_source_syndication",   # green r08 row; spans/paragraphs/tfidf-pairs
                              # keep near-dup censuses in-window; local
                              # exact-parity at both SFs every round
    "q_event_transitions",    # green r08 row; attribution_last_touch +
                              # trend + psi keep event/stats censuses
                              # in-window; local exact-parity at both SFs
    "q_attribution_linear",   # green r08 row; attribution_last_touch keeps
                              # the attribution family in-window; local
                              # exact-parity at both SFs every round
    # slots displaced by the never-driver-checked r08 session-3 stats queries
    "q_window_tumbling",      # frozen headline bench re-executes per-round
    "q_win_running_sum",      # frozen headline bench re-executes per-round
    "q_text_quality",         # frozen headline bench re-executes per-round
    "q_json_fns",             # frozen headline bench re-executes per-round
    "q_sql_shared_text",      # SQL front door: shared_window r07 row + sink test
    "q_dedup_clusters",       # connected_components driver-covered via
                              # q_entity_resolution (same operator)
    "q_pack_greedy",          # packing exercised by q_training_order (tail r07)
    "q_agg_multi",            # multi-agg shape in headline bench (rollup, pricing)
    "q_join_semi",            # join family: Q5/Q6/flagship in-window, anti r07
    "q_stateful_user_totals", # applyInPandasWithState path parity-tested via
                              # stream_cusum every round
    "q_pandas_udf_grouped_agg", # UDF reps scalar/applyInPandas r07 rows
    "q_token_count",          # text censuses rep'd by bigram_nll + calibrated keep
    "q_text_redact_pii",      # redact stage runs inside in-window pipeline composite
    "q_multimodal_frame_sample", # multimodal family: metadata/features/resize r07 rows
    "q_pricing_summary",      # headline bench re-measures it every round
    "q_join_inner_equi",      # flagship + multiway exercise inner joins
    "q_surrogate_keys",       # maybe_broadcast guard-sites stay in-window
    "q_agg_count_by_value",   # agg reps avg_per_key/multi in-window
    "q_dedup_canonical",      # dedup reps by_key/clusters in-window
    "q_text_ngram_jaccard",   # text-similarity rep jaccard_pairs in-window
    # r06-row slots displaced by never-driver-checked r08 session-2 queries
    "q_sort_multi_key",       # sort family rep q_topk_global in-window
    "q_win_lag_lead",         # window family rep q_win_running_sum in-window
    "q_project_rename",       # row-ops reps q_filter_pred/q_json_fns in-window
    "q_intersect",            # set-op family rep q_union_all in-window
    "q_string_fns",           # row-ops reps q_filter_pred/q_json_fns in-window
    "q_agg_rollup",           # agg reps avg_per_key/multi/count_by_value in-window
    "q_join_left_outer",      # join reps inner_equi/semi in-window
    "q_filter_pred",          # row-ops rep q_json_fns in-window
    "q_agg_percentiles",      # exact-quantile rep q_value_outliers in-window
    "q_join_range_binned",    # r06 row; also exercised per-round by bench.py
    # r07 rows (displaced by the r08 rotation)
    "q_agg_percentiles_approx",
    "q_dedup_embedding_cosine_lsh",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_multimodal_metadata",
    "q_win_sliding_frame",
    "q_agg_cube",
    "q_union_distinct",
    "q_sample_fixed_k",
    "q_join_anti",
    "q_agg_pivot",
    "q_window_sliding",
    "q_except",
    "q_positive_or_null",
    "q_safe_cast",
    "q_incremental_dedup",
    "q_corpus_curation",
    "q_training_order",
    "q_text_unigram_nll",     # vocab family rep vocab_coverage in-window
    "q_events_funnel",        # analytics family: r07 rows across the family
    "q_data_quality_audit",
    "q_multimodal_dedup",     # multimodal rep frame_sample in-window
    "q_sql_shared_window",    # sql family rep sql_shared_text in-window
    "q_bm25_topk",
    "q_sample_weighted_k",
    "q_fuzzy_name_pairs",
    "q_similarity_topk_cosine",  # similarity rep lsh_topk in-window
    "q_math_fns",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_theta_range",
    "q_join_multiway_star",
    "q_agg_first_nonnull",
    "q_agg_grouping_sets",
    "q_agg_count_distinct",
    "q_win_rank",
    "q_topk_per_group",
    "q_window_watermark",     # streaming reps tumbling/stateful in-window
    "q_window_session",
    "q_stream_stream_join",
    "q_pandas_udf_scalar",    # UDF rep pandas_udf_grouped_agg in-window
    "q_applyinpandas_group_pct",
    "q_dedup_exact",          # dedup reps spans/canonical/clusters in-window
    "q_text_langid",
    "q_text_decontaminate",
    "q_corpus_delta",         # delta family rep pipeline composite in-window
    "q_flagship_star_revenue",
    # r06 rows (next rotation candidates)
    "q_sample_stratified",    # sampling reps sample_split/leakage in-window
    "q_date_fns",             # relational reps string/array/project in-window
    "q_win_ntile_pctrank",    # window reps lag_lead/running_sum in-window
    "q_array_fns",            # relational reps string_fns/project in-window
    "q_agg_collect_set",      # agg reps avg/multi/rollup/count_by_value in-window
    "q_agg_approx_count_distinct",  # no-oracle + pinned error tests
    "q_text_repetition",
    "q_join_salted_skew",
    "q_dedup_simhash",
    "q_text_tfidf_top_term",
    "q_similarity_ivf_topk",
    "q_dedup_embedding_cosine",
    "q_oov_rate",
    "q_corpus_mix",           # mixing family rep pack_greedy in-window
    "q_shuffle_shards",
    "q_corpus_mix_epochs",
    "q_dedup_paragraphs",     # span-dedup generalization in-window
    "q_boilerplate_census",
    "q_retention_cohorts",
    "q_scd2_history",
    "q_apply_delta",
    "q_numeric_histogram",
    "q_dedup_minhash_lsh",    # no-oracle + pinned recall/precision tests
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
