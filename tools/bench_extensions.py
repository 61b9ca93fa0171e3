"""Benchmark the training-pipeline extension queries (the ops outside
bench.py's frozen 16-query headline set) at $SPARK_GRAFT_SF_DIR — same
methodology as bench.py (noop sink, untimed warmup, median of 3 passes,
loadavg bracketing) so rounds are comparable.

The headline set stays frozen for cross-round comparability; this tool
gives the NEW operators their own recorded cost series (BASELINE.md).

Usage: python tools/bench_extensions.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_incremental_dedup",
    "q_oov_rate",
    "q_corpus_mix",
    "q_corpus_mix_epochs",
    "q_shuffle_shards",
    "q_dedup_paragraphs",
    "q_boilerplate_census",
    "q_text_unigram_nll",
    "q_corpus_delta",
    "q_multimodal_dedup",
    "q_sql_shared_window",
    "q_training_order",
    "q_events_funnel",
    "q_retention_cohorts",
    "q_bm25_topk",
    "q_scd2_history",
    "q_apply_delta",
    "q_data_quality_audit",
    "q_sample_weighted_k",
    "q_fuzzy_name_pairs",
    "q_numeric_histogram",
    "q_dedup_substring_spans",
    "q_dedup_spans_incremental",
    "q_select_token_budget",
    "q_corpus_mix_temperature",
    "q_quality_classifier",
    "q_token_kl_divergence",
    "q_token_entropy",
    "q_zipf_fit",
    "q_ks_value_drift",
    "q_mann_whitney_u",
    "q_winsorized_mean",
    "q_sample_weighted_per_source",
    "q_heavy_hitters",
    "q_decontaminate_containment",
    "q_psi_value_drift",
    "q_similarity_pq_topk",
    "q_seasonal_zscore",
    "q_shipping_priority_q3",
    "q_similarity_ivfpq_topk",
    "q_similarity_pq_served",
    "q_similarity_ivfpq_served",
    "q_dedup_minhash_incremental",
    "q_ann_recall_probe",
    "q_token_burstiness",
    "q_source_vocab_overlap",
    "q_vocab_incremental",
    "q_vocab_growth",
    # q_dedup_savings and q_dedup_survivors are deliberately NOT in this
    # series: their registry forms take edges from jaccard_pairs_exact —
    # the ORACLE-TWIN edge generator (all within-block pairs, the
    # documented quadratic exactness baseline, same reason
    # q_dedup_clusters is absent here). The census/argmax themselves are
    # cluster-table-sized; at scale the edge list drops in from the
    # banded MinHash path — which is exactly what q_dedup_savings_minhash
    # (r12, below) measures.
    "q_dedup_savings_minhash",
    "q_token_burstiness_incremental",
    "q_mad_per_type",
    "q_source_concentration",
    "q_hybrid_rrf_topk",
    "q_events_sessionize",
    "q_win_time_range",
    "q_resample_daily",
    "q_value_outliers",
    "q_token_pair_lift",
    "q_fk_orphan_audit",
    "q_embedding_centroids",
    "q_label_coherence",
    "q_events_ewma",
    "q_text_tfidf_cosine_pairs",
    "q_benford_audit",
    "q_trend_per_type",
    "q_events_autocorr",
    "q_event_transitions",
    "q_attribution_last_touch",
    "q_chi2_independence",
    "q_welch_ttest",
    "q_twap_per_user",
    "q_interevent_gaps",
    "q_quality_calibrated_keep",
    "q_rolling_active_users",
    "q_text_bigram_nll",
    "q_golden_record",
    "q_events_cusum",
    "q_source_syndication",
    "q_conversion_latency",
    "q_resample_interpolate",
    "q_attribution_linear",
    "q_conversion_by_deadline",
    "q_substring_search_trgm",
    "q_entity_resolution",
    "q_temporal_dim_join",
    "q_embedding_pca_spectrum",
    "q_bootstrap_se",
    "q_ab_funnel_lift",
    "q_except_all",
    "q_unpivot_melt",
    "q_union_schema_evolution",
    "q_join_full_outer",
    "q_pipeline_end_to_end",
    # r13 additions: the real-codec multimodal paths
    "q_multimodal_decode_image",
    "q_multimodal_decode_audio",
    # r13 additions: new operator families
    "q_quality_gopher_rules",
    "q_interval_coalesce",
    "q_er_sorted_neighborhood",
    "q_key_skew_census",
    "q_bpe_pair_census",
    "q_bpe_train",
    "q_bpe_encode",
    "q_join_bloom_prefilter",
    "q_dedup_semantic",
    "q_dedup_setjoin_prefix",
    "q_quality_c4_lines",
    "q_dsir_importance",
    "q_ann_hard_negatives",
    "q_dedup_within_doc",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_km_survival",
]


def _cpu_calib_ms() -> float:
    """Single-core speed anchor — see bench.py._cpu_calib_ms (r13)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(3_000_000):
        x = (x * 1103515245 + i) & 0xFFFFFFFFFFFF
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_before = os.getloadavg()
    calib_before = _cpu_calib_ms()
    spark = get_spark("tmdb-spark-bench-ext")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str) -> None:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    from the_movie_database_import_spark import metrics

    for name in QUERIES:  # untimed warmup
        run(name)
    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    cpu_samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    task_samples: dict[str, list[int]] = {n: [] for n in QUERIES}
    for _ in range(3):
        for name in QUERIES:
            snap0 = metrics.stage_totals(spark.sparkContext)
            t0 = time.perf_counter()
            run(name)
            samples[name].append(time.perf_counter() - t0)
            d = metrics.delta(snap0, metrics.stage_totals(spark.sparkContext))
            cpu_samples[name].append(d.cpu_ns / 1e9)
            task_samples[name].append(d.tasks)
    timings = {n: round(statistics.median(ts), 4) for n, ts in samples.items()}
    cpu_timings = {
        n: round(statistics.median(cs), 4) for n, cs in cpu_samples.items()
    }
    tasks = {n: int(statistics.median(ts)) for n, ts in task_samples.items()}
    print(
        json.dumps(
            {
                "metric": "extension_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "cpu_sec_total": round(sum(cpu_timings.values()), 4),
                "queries_cpu_sec": cpu_timings,
                "queries_tasks": tasks,
                "sf_dir": sf_dir,
                "cpus": int(
                    os.environ.get("SPARK_GRAFT_CPUS")
                    or spark.sparkContext.defaultParallelism
                ),
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
                "cpu_calib_ms_before": calib_before,
                "cpu_calib_ms_after": _cpu_calib_ms(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
