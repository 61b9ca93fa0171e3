"""Regenerate PLANS.md: formatted physical plans for the plan shapes the
engine's 100 TB posture depends on, with the properties each one must keep
(the same properties tests/test_plans.py asserts).

Usage: python tools/explain_plans.py > PLANS.md
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

SHOWCASES = [
    (
        "q_flagship_star_revenue",
        "Star join: every dimension broadcasts (no shuffle of the fact side); the "
        "lineitem ReadSchema is pruned to the join key + two money columns and "
        "the whole agg pipeline whole-stage-codegens.",
    ),
    (
        "q_filter_pred",
        "Predicate pushdown: the filters appear as PushedFilters at the parquet "
        "scan, so row groups are skipped storage-side before any Spark work.",
    ),
    (
        "q_topk_per_group",
        "Per-group top-k: exactly one hash-partition exchange on the group key; "
        "the rank filter runs inside the post-shuffle window stage.",
    ),
    (
        "q_dedup_minhash_lsh",
        "LSH near-dup: signatures cached once, banded self-join keyed on "
        "(band, signature), exact-Jaccard verification fused into the join "
        "projection (array_intersect appears exactly once), first-collision-band "
        "predicate dedups candidates without a distinct shuffle.",
    ),
    (
        "q_json_fns",
        "Single JSON parse: one from_json struct projection (the plan contains "
        "exactly one from_json and zero get_json_object) — fields are picked "
        "from the parsed struct, never re-parsed per extraction.",
    ),
    (
        "q_dedup_simhash",
        "SimHash near-dup: banded self-join with first-collision-band emission "
        "— no HashAggregate/distinct over the candidate stream; Hamming "
        "verification is a bit_count on XOR in the join output projection.",
    ),
    (
        "q_window_watermark",
        "Watermark batch twin: the 1-row global max(ts) broadcasts to filter "
        "finalized windows; the events scan for the max reads only ts "
        "(column-pruned), and the window agg shuffles once on the window key.",
    ),
    (
        "q_join_salted_skew",
        "Salted shuffle join on a 5-value skewed key: the exchange partitions "
        "on (event_type, _salt) so each hot key spreads over 8 partitions; "
        "shuffled-hash build on the replicated small side, no broadcast.",
    ),
    (
        "q_corpus_curation",
        "Composed curation pipeline (quality score -> langid filter -> "
        "canonical dedup flag): all scalar stages fuse into the scan "
        "projection, zero Python stages, exactly one exchange (the "
        "map-side-combined canonical-digest winner aggregate; the flag "
        "joins back on the unique winner id — skew-proof, no content "
        "window).",
    ),
    (
        "q_incremental_dedup",
        "Incremental dedup of a daily batch: the corpus contributes only a "
        "digest side-table; the within-batch winner is a map-side-combined "
        "min aggregate joined back on the unique (digest, id) pair (AQE "
        "can split skewed join partitions, never window partitions), and "
        "corpus text never moves — daily cost is proportional to the "
        "increment, not the corpus.",
    ),
    (
        "q_pipeline_end_to_end",
        "Eight-stage daily pipeline composite (delta -> incremental dedup -> "
        "decontaminate -> redact -> filter -> split -> chunk -> pack -> "
        "census): the delta prologue shuffles (id, digest, presence) "
        "triples; the deduped increment is cached once and read by both "
        "decontamination consumers (two InMemoryTableScans, prologue joins "
        "run once); redaction/scoring/langid/split/chunking all fuse "
        "scan-side; zero Python stages.",
    ),
    (
        "q_events_funnel",
        "Strict-order conversion funnel: ONE user-keyed exchange (the "
        "collect_list aggregate); the stage walk is an in-row array_sort + "
        "aggregate fold — no per-stage self-joins of the event log; the "
        "final stage census aggregates one int per user and broadcasts "
        "against a literal stage table.",
    ),
    (
        "q_bm25_topk",
        "BM25 lexical top-k: per-term tfs are conditional aggregate columns "
        "of the SAME exchange that counts document length (one corpus "
        "shuffle); the per-doc frame is cached once and read by both the "
        "stats scalar and the scoring pass (two InMemoryTableScans); the "
        "one-row corpus stats broadcast back; top-k is "
        "TakeOrderedAndProject, never a global sort.",
    ),
    (
        "q_apply_delta",
        "MERGE a change feed into a snapshot: the victim-id set (upsert + "
        "delete ids, deduped) BROADCASTS, so the snapshot streams through a "
        "broadcast LEFT ANTI join and corpus rows never hit an exchange — "
        "daily maintenance of a 100 TB table moves only the feed.",
    ),
    (
        "q_fuzzy_name_pairs",
        "Fuzzy edit-distance-1 matching: the deletion-variant stream is "
        "cached once (census + both join sides read InMemoryTableScans), "
        "candidates come from a variant-hash equi-join — no cartesian, no "
        "nested loop — and the exact Levenshtein verification is fused "
        "into the post-join projection.",
    ),
    (
        "q_data_quality_audit",
        "Declarative constraint audit: five predicate checks as conditional "
        "sums in ONE global aggregate over one scan; the composite-key "
        "uniqueness count-distinct rides the same scan as a pre-grouped "
        "partial aggregate (map-side dedup), and the per-check report "
        "explodes in-row from the one-row aggregate — never a job per "
        "check, nothing collected to the driver.",
    ),
    (
        "q_dedup_substring_spans",
        "ExactSubstr span dedup: k-grams hash IN-ROW at the scan (token "
        "array bound once as a lambda variable — the r08 fix; grams were "
        "re-splitting the doc per position before), the cached (digest, "
        "id, pos) stream feeds the winner aggregate (map-side-combined "
        "min(struct) — never a window over digests) and the losing-"
        "occurrence join; the rebuild is one unique-id left join with "
        "hash-set array_except membership in-row.",
    ),
    (
        "q_dedup_spans_incremental",
        "Daily-maintenance span dedup: the batch's gram digests probe the "
        "corpus gram-digest side table on the digest key (side table "
        "distinctness TRUSTED — no corpus-scale re-aggregation; bucket it "
        "on the digest and its branch carries no Exchange, pinned in "
        "tests/test_plans.py), plus the same within-batch winner "
        "aggregate and in-row rebuild as the full operator.",
    ),
    (
        "q_dedup_minhash_incremental",
        "Daily-maintenance NEAR-dup (r11): the new batch's band signatures "
        "probe the corpus band-signature side table — the corpus side "
        "scans, explodes its band array in-map, and streams through a "
        "BroadcastHashJoin against the budget-guarded broadcast of the "
        "batch (zero hash exchange in the cross-probe plan, pinned in "
        "tests/test_plans.py); exact-Jaccard verify runs on the stored "
        "token-hash arrays so corpus TEXT is never re-read; within-batch "
        "pairs delegate to the full banded operator over batch rows only.",
    ),
    (
        "q_vocab_growth",
        "Heaps-law growth curve (r11): the global document rank is the "
        "DISTRIBUTED form — range-partition on doc id, row_number "
        "windows partitioned by the range bucket, cumulative offsets "
        "from a bounded per-partition count table broadcast back, and "
        "the ntile bucket as a map-side exact-integer formula; no "
        "windowspecdefinition orders all per-doc rows unpartitioned "
        "(pinned in tests/test_plans.py). Single-partition windows "
        "touch only the stats-sized offsets and 10-row checkpoint "
        "tables.",
    ),
    (
        "q_similarity_ivfpq_served",
        "Persisted IVFxPQ serve (r11): coarse-centroid probe pruning over "
        "STORED codes read from the snapshot table (bucket column "
        "persisted with the codes), ADC scoring from the committed "
        "codebook sidecar, exact cosine re-rank against the raw vector "
        "table — no k-means and no corpus re-encode anywhere in the "
        "query; pinned identical to the in-query IVFxPQ twin.",
    ),
    (
        "q_select_token_budget",
        "Token-budget corpus selection: doc rows NEVER enter a global "
        "window — the quantized-score census (bounded <= grid+1 rows by "
        "construction) carries the prefix sums in a single-partition "
        "window over the census only, bucket decisions broadcast (cached "
        "so the census aggregate runs once across both union branches), "
        "full-keep buckets pass through window-free, and the one boundary "
        "bucket's running sum is hash-partitioned on its bucket key.",
    ),
    (
        "q_corpus_mix_temperature",
        "Temperature mixing (p ∝ n^alpha): per-group count aggregate, the "
        "feasibility min as an unbounded window over the tiny group table, "
        "snapped + 1e-9-grid-quantized rates broadcast, and a scan-side "
        "md5-bucket filter — corpus rows are never shuffled, identical "
        "shape to q_corpus_mix with the weights derived in-plan.",
    ),
    (
        "q_token_kl_divergence",
        "Per-group KL drift census: ONE corpus pass builds the (group, "
        "token) count table; global per-token counts come from a window "
        "PARTITIONED BY token over that same table (no second scan), "
        "totals/joint-vocab from bounded global windows, and the "
        "1e-6-quantized p*ln(p/q) terms sum as exact integers.",
    ),
    (
        "q_quality_classifier",
        "Model-based quality filter: stateless HashingTF features + the "
        "broadcast LR coefficient vector score JVM-side (no Python "
        "stages); the Pareto keep rule is a scan-side md5 expression; "
        "the decile census is one aggregate. Training (L-BFGS "
        "treeAggregate) runs before this scoring plan.",
    ),
    (
        "q_events_cusum",
        "Page CUSUM drift census: the sequential recurrence runs as its "
        "prefix-minimum closed form — running-sum and running-min windows "
        "plus the final per-key aggregate all share ONE user-keyed "
        "exchange, and the 1e-6 integer grid keeps every window op exact "
        "64-bit arithmetic (cross-engine bit-identical despite differing "
        "running-SUM internals).",
    ),
    (
        "q_source_syndication",
        "Cross-source syndication matrix: NO join operator anywhere — the "
        "paragraph self-join (d-squared for a span in d docs) is replaced "
        "by one digest-keyed collect_set(source) bounded by |sources|, "
        "in-row pair generation, and a constant-size census aggregate.",
    ),
    (
        "q_quality_calibrated_keep",
        "Per-source calibrated quality keep: data rows never enter a "
        "window (a percent_rank over a hot source would be one task "
        "sorting that source) — the only hash exchange is the source-keyed "
        "score-list aggregate, and the threshold table broadcasts back as "
        "a filter.",
    ),
    (
        "q_twap_per_user",
        "Time-weighted average: the lead window and the decimal-integer "
        "numerator aggregate share one user-keyed exchange; the quantized "
        "numerator makes the result partition- and order-invariant.",
    ),
    (
        "q_local_supplier_volume",
        "TPC-H Q5 analog: two dimension paths (order->customer, "
        "line->supplier) meet on nationhood — five broadcast joins, zero "
        "sort-merge, one final-aggregate exchange, date range pushed to "
        "the orders scan with a three-column ReadSchema.",
    ),
    (
        "q_revenue_change_q6",
        "TPC-H Q6 analog: the pure pushed-filter scan — no join, no "
        "window; four predicates in PushedFilters, a four-column "
        "ReadSchema, and a single-partition gather of per-task partial "
        "aggregates. At 100 TB this query IS the storage layout.",
    ),
    (
        "q_join_full_outer",
        "FULL OUTER preserves both sides, so no broadcast strategy "
        "exists: the plan is a SortMergeJoin FullOuter over exactly one "
        "co-keyed shuffle pair — and the preservation identity (every "
        "customer once, plus one row per event-only user) is the "
        "semantic pin that the reconciliation never drops a side.",
    ),
    (
        "q_unpivot_melt",
        "UNPIVOT/melt: the wide-to-long reshape is a pure in-plan Expand "
        "node — one scan, 4x in-row row generation, zero exchanges, zero "
        "joins. At 100 TB the reshape costs exactly one pass, no "
        "shuffle.",
    ),
    (
        "q_except_all",
        "EXCEPT ALL bag difference: Spark plans exceptAll as the counted "
        "anti-pattern — aggregate multiplicities on both sides, "
        "subtract, regenerate — one shuffle pair on the compared "
        "columns, never a row-by-row anti join of the full bags.",
    ),
    (
        "q_union_schema_evolution",
        "Schema-evolution union (unionByName + allowMissingColumns): "
        "by-NAME projection alignment with NULL fill happens entirely "
        "in-plan — one scan per generation, no shuffle, and a positional "
        "union's silent column misalignment is structurally impossible.",
    ),
    (
        "q_temporal_dim_join",
        "Fact-to-SCD2 temporal join: the versioned dimension derives "
        "from the attribute log via lag/lead windows sharing one "
        "user-keyed exchange; the fact joins its valid-at version "
        "through ONE user-keyed equi-join carrying the interval "
        "predicates — at scale the dimension side broadcasts and the "
        "fact never shuffles twice.",
    ),
    (
        "q_entity_resolution",
        "Entity resolution composite: deletion-variant blocking (never "
        "all-pairs; hot variants capped), edit-distance-1 verify on the "
        "blocked candidates only, then iterative min-label propagation "
        "over (node, label) ID PAIRS — names and payloads never enter "
        "the loop, lineage is truncated per iteration via "
        "localCheckpoint, and the iteration count is bounded.",
    ),
    (
        "q_bootstrap_se",
        "One-pass Poisson bootstrap: B=32 md5-derived Poisson(1) weights "
        "per row feed 2B+2 conditional sums in ONE hash aggregate — "
        "map-side partials do nearly all the work, no second data pass, "
        "no resampling loop; replicate means and the SE compute on the "
        "per-group result row, bit-reproducible across partitionings.",
    ),
    (
        "q_shipping_priority_q3",
        "TPC-H Q3 analog: the segment filter broadcast-prunes orders "
        "BEFORE the fact joins (2 BroadcastHashJoins, zero sort-merge), "
        "one aggregate exchange on the group key, and the global top-10 "
        "plans as TakeOrderedAndProject — no full sort anywhere; both "
        "date predicates push to their scans.",
    ),
    (
        "q_psi_value_drift",
        "PSI drift census: two full-data passes only (pooled min/max, "
        "then ONE map-side-combined (key, bin) census with both periods "
        "as conditional sums); the census is cached for BOTH its "
        "consumers (term rows + per-key totals — uncached each branch "
        "re-scanned the base table), totals join back behind broadcast, "
        "and the 1e-6-grid term sum is order/partition-invariant.",
    ),
    (
        "q_token_entropy",
        "Per-source token-entropy census: one explode + map-side-combined "
        "(source, token) census is the only corpus pass; group totals "
        "ride a window OVER THE CENSUS (vocab x groups rows), each "
        "(c/N)*ln(N/c) term floor-quantizes to the 1e-6 integer grid "
        "before the distributed sum, and the normalization divides "
        "exact-integer-derived doubles.",
    ),
    (
        "q_ks_value_drift",
        "Two-sample KS drift: ONE map-side-combined (key, value) census "
        "is the only full-data pass; the totals window and the running-"
        "sum window share a single hash partitioning on the key (one "
        "exchange over census rows, never corpus rows twice); the "
        "numerator max compares exact DECIMAL(38,0) integers and only "
        "the final per-key ratio divides in double.",
    ),
    (
        "q_heavy_hitters",
        "Misra-Gries phi-heavy hitters: per-partition Arrow sketches "
        "(O(capacity) state) emit a guaranteed candidate SUPERSET, the "
        "exact recount's aggregate is broadcast-semi-filtered to "
        "|candidates| keys — the vocabulary's long tail never enters a "
        "shuffle — and the ceil(phi*N) threshold compares exact "
        "integers, so the sketch-accelerated output is oracle-exact.",
    ),
    (
        "q_decontaminate_containment",
        "Graded containment decontamination: the denominator (distinct "
        "gram count) computes in-row at the scan, benchmark grams hash "
        "to longs and broadcast, only MATCHED (doc, gram) pairs enter "
        "the per-doc aggregate, and the tiny matched-count table "
        "broadcasts back onto the totals — corpus rows are never "
        "shuffled at any stage.",
    ),
    (
        "q_substring_search_trgm",
        "Trigram-accelerated LIKE '%pattern%' (the pg_trgm recipe): the "
        "inverted trigram index prunes to docs containing EVERY pattern "
        "trigram (set-containment via counted semi-join), exact contains "
        "verifies candidates only — byte-equal to the naive full scan "
        "without reading the whole corpus per query.",
    ),
    (
        "q_dedup_survivors",
        "Quality-ranked survivor selection (r12): the per-cluster argmax "
        "is ONE map-side-combinable max_by aggregate over the label "
        "table — no Window partitioned by cluster over corpus rows (the "
        "shape that funnels a mega-cluster through a single task's "
        "sort); the survivor table joins back on cluster_rep unhinted "
        "(worst-case corpus-scale: singletons), and the connected-"
        "components fixpoint reads its localCheckpointed edge table, "
        "never the edge generator plan.",
    ),
    (
        "q_quality_gopher_rules",
        "Gopher-rules composite quality filter (r13): six heuristic rules "
        "as ONE single-pass in-row projection — no Exchange, no Join, no "
        "Python stage anywhere; the documents scan is pruned to "
        "(doc_id, text), so the filter runs at scan speed at any corpus "
        "size.",
    ),
    (
        "q_join_bloom_prefilter",
        "Runtime Bloom-prefiltered semi join (r13): the k=5 xxhash64 "
        "bit-test Filter sits on the fact scan BELOW the exact LeftSemi "
        "join — at 100 TB the join shuffle moves matches plus a false-"
        "positive sliver instead of the whole fact table; the 8 KiB "
        "bitmap is a literal array in codegen, built by one bounded "
        "bit_or aggregate.",
    ),
    (
        "q_er_sorted_neighborhood",
        "Sorted-neighborhood ER blocking (r13): the exact global rank is "
        "DISTRIBUTED — range partition ids + per-partition row_number + a "
        "broadcast offsets table (never a global single-partition window "
        "over the data); pairing is one equi-join on rank-div-window "
        "blocks with the left side duplicated into exactly two probe "
        "buckets, so candidates are linear by construction.",
    ),
    (
        "q_dedup_setjoin_prefix",
        "Prefix-filtered exact set-similarity self-join (late r13): "
        "candidate generation explodes only each set's rarest-token "
        "prefix and equi-joins on (token) — no CartesianProduct, no "
        "nested loop anywhere; the length filter rides the join "
        "condition as exact integer cross-multiplication, and the verify "
        "is an in-row array_intersect after two id-keyed joins.",
    ),
    (
        "q_dsir_importance",
        "DSIR importance weights (late r13): the 256-row bucket-weight "
        "table (census + window totals, computed once and cached) "
        "BROADCASTS back onto the bucket occurrences; the probe scan "
        "prunes to (doc_id, text), the census scan to (text, lang) — "
        "corpus text never shuffles, only (id, int-weight) pairs reach "
        "the final doc aggregate.",
    ),
    (
        "q_ann_hard_negatives",
        "Hard-negative mining (late r13): anchors broadcast into a "
        "nested-loop join whose condition carries the label constraint — "
        "the corpus is scanned once, never shuffled, and same-label rows "
        "are dropped before the per-anchor top-k window.",
    ),
]


def main() -> None:
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.session import get_spark

    spark = get_spark()
    out = io.StringIO()
    out.write(
        "# PLANS — physical plans the engine is designed around\n\n"
        "Generated by `python tools/explain_plans.py` at "
        f"`{SF_DIR}`. These are the plan shapes a 100 TB run depends on; "
        "tests/test_plans.py pins each property.\n"
    )
    for name, why in SHOWCASES:
        df = REGISTRY[name].spark_fn(spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        out.write(f"\n## {name}\n\n{why}\n\n```\n{formatted}```\n")
    sys.stdout.write(out.getvalue())


if __name__ == "__main__":
    main()
