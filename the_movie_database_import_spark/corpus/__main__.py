"""CLI for the training-corpus curation pipeline — the operational front
door a data engineer runs daily ([ext] north star; the reference's only
entry point is the movie ETL, ``loader.py:549-611`` — it has no corpus
surface).

Usage:
    python -m the_movie_database_import_spark.corpus <sf_dir> --out <dir>
        [--bench-mod 97] [--quality 0.6] [--langs en,de]
        [--dedup-threshold 0.8] [--n-shards 8]
        [--span-k 8] [--span-grams-in <dir>]

Reads ``documents.parquet`` from <sf_dir>, runs the curation pipeline
(benchmark decontamination → PII redaction → quality + language filter →
exact dedup → substring-span dedup → leakage-safe split is intentionally
NOT applied here: the CLI produces a single training pool; pass the
output to the split/mix operators for recipe-specific work), then writes:

- ``<out>/shards/`` — the kept corpus in reproducible pseudorandom
  training order, one parquet directory per shard, rows stored in
  training order (``sources.writers.write_training_shards``);
- ``<out>/span_grams/`` — the updated gram-digest side table
  (``--span-grams-in`` side table plus the kept pool's new gram digests,
  VERDICT r07 #6): feed it back via ``--span-grams-in`` on the next run
  and the span stage strips spans already in the accumulated corpus —
  the daily-maintenance loop ``dedup_substring_spans_incremental``
  documents. In production store it bucketed on ``gram_digest``
  (``sources.writers.write_bucketed``) so the probe join never shuffles
  the corpus-scale side;
- one JSON census line on stdout (doc counts per stage, shard count,
  span-stripped token counts) — the artifact a pipeline scheduler logs
  and alerts on.

Every stage is an operator the registry proves against a DuckDB oracle;
the CLI only composes them, so its correctness surface is the composed
plan, exercised end-to-end by ``tests/test_corpus_cli.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m the_movie_database_import_spark.corpus",
        description="curate documents.parquet into sharded training data",
    )
    parser.add_argument("sf_dir", help="directory containing documents.parquet")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument(
        "--bench-mod",
        type=int,
        default=97,
        help="doc_id %% N == 0 marks the held-out benchmark set "
        "(deterministic stand-in for external eval sets)",
    )
    parser.add_argument("--quality", type=float, default=0.6)
    parser.add_argument(
        "--calibrated-keep",
        type=float,
        default=0.0,
        help="after the global quality floor, additionally keep only each "
        "SOURCE's own top fraction by quality score (binary fraction, e.g. "
        "0.25) — per-source calibration keeps the source mixture stable "
        "while dropping each source's worst tail "
        "(operators/curation.calibrated_quality_keep); 0 disables",
    )
    parser.add_argument("--langs", default="en,de")
    parser.add_argument("--n-shards", type=int, default=8)
    parser.add_argument(
        "--span-k",
        type=int,
        default=8,
        help="strip every >= K-token span duplicated within the pool or "
        "already in --span-grams-in (Lee et al. ExactSubstr); 0 disables",
    )
    parser.add_argument(
        "--span-grams-in",
        default=None,
        help="existing gram-digest side table (a previous run's "
        "<out>/span_grams) — spans already in the accumulated corpus are "
        "stripped too, and the written side table extends it",
    )
    parser.add_argument(
        "--compact-mb",
        type=int,
        default=0,
        help="after the sharded write, compact each shard directory to "
        "~N-MiB files (writers.compact_small_files) — the OPTIMIZE pass a "
        "daily pipeline runs so downstream scans never pay the small-file "
        "tax; 0 disables",
    )
    parser.add_argument(
        "--audit",
        action="store_true",
        help="run a data-quality audit on the written shards (not-null "
        "doc_id/text, unique doc_id) and write <out>/audit.json; exit 1 "
        "if any check fails — the load-gate a scheduler keys on",
    )
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from ..functions.text import langid, quality_metrics, redact_pii
    from ..operators.decontam import decontaminate
    from ..operators.dedup import exact_dedup
    from ..session import get_spark, release_caches
    from ..sources.readers import load_table
    from ..sources.writers import write_training_shards

    t0 = time.time()
    spark = get_spark("tmdb-spark-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf_dir, "documents")
    n_in = docs.count()
    bench = docs.filter(F.col("doc_id") % args.bench_mod == 0)
    corpus = docs.filter(
        (F.col("doc_id") % args.bench_mod != 0) & F.col("text").isNotNull()
    ).select("doc_id", "source", "text")

    clean = decontaminate(corpus, bench, n=3)
    red = clean.select(
        "doc_id", "source", redact_pii(F.col("text"))["redacted"].alias("text")
    )
    m = quality_metrics(F.col("text"))
    filtered = red.filter(
        (m["quality_score"] >= args.quality)
        & langid(F.col("text")).isin(*args.langs.split(","))
    )
    n_calibrated = None
    if args.calibrated_keep:
        # Per-source calibrated cut on top of the global floor: the
        # global threshold guards absolute quality, the calibrated stage
        # guards the SOURCE MIXTURE (a systematically high-scoring source
        # would otherwise dominate the survivor pool). Thresholds come
        # from one (source, score-list) aggregate and broadcast back —
        # no per-source window over data rows (the operator's contract).
        from ..operators.curation import calibrated_quality_keep

        cal_ids = calibrated_quality_keep(
            filtered, keep_frac=args.calibrated_keep
        ).select("doc_id")
        filtered = filtered.join(cal_ids, "doc_id")
        n_calibrated = filtered.count()
    keep_ids = exact_dedup(filtered).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept = filtered.join(keep_ids, "doc_id").select("doc_id", "text")

    span_stats = None
    if args.span_k:
        # Substring-span dedup stage (VERDICT r07 #6): whole-document
        # dedup above misses partially-duplicated text. With a side table
        # from a previous run this is the incremental daily loop (corpus
        # text never re-read); without one it still strips within-pool
        # duplicated spans (empty side table == the full operator's
        # semantics). The side table written below appends only the
        # NEW digests via an anti join — never a corpus-scale distinct.
        from ..operators.dedup import (
            dedup_substring_spans_incremental,
            substring_gram_digests,
        )
        from ..session import tracked_cache

        if args.span_grams_in:
            seen = spark.read.parquet(args.span_grams_in)
        else:
            seen = spark.createDataFrame([], "gram_digest string")
        spans = tracked_cache(
            dedup_substring_spans_incremental(kept, seen, k=args.span_k)
        )
        span_stats = spans.agg(
            F.sum("n_tokens").alias("t_in"), F.sum("n_kept").alias("t_kept")
        ).first()
        kept = spans.select("doc_id", "text")
        new_grams = substring_gram_digests(kept, k=args.span_k)
        seen.unionByName(
            new_grams.join(seen, "gram_digest", "left_anti")
        ).write.mode("overwrite").parquet(f"{args.out}/span_grams")

    write_training_shards(kept, f"{args.out}/shards", args.n_shards)
    compaction = None
    if args.compact_mb:
        from ..sources.writers import compact_small_files

        # per-shard compaction preserves the shard=N layout contract;
        # sort_cols=[pos] preserves the sink's TRAINING-ORDER contract
        # (round-robin compaction would scramble rows within files)
        compaction = {"files_before": 0, "files_after": 0}
        for i in range(args.n_shards):
            st = compact_small_files(
                spark,
                f"{args.out}/shards/shard={i}",
                target_file_bytes=args.compact_mb * 2**20,
                sort_cols=["pos"],
            )
            compaction["files_before"] += st["files_before"]
            compaction["files_after"] += st["files_after"]
    shards = spark.read.parquet(f"{args.out}/shards")
    n_kept = shards.count()

    audit_ok = True
    if args.audit:
        from ..operators.quality import audit, check_not_null, numeric_histogram

        report = [
            {
                "check": r["check_name"],
                "violations": r["violations"],
                "total": r["total"],
                "passed": r["passed"],
            }
            for r in audit(
                shards,
                [check_not_null("doc_id"), check_not_null("text")],
                unique_keys=[["doc_id"]],
            ).collect()
        ]
        audit_ok = all(r["passed"] for r in report)
        # Drift profile (VERDICT r06 #6): per-column equi-width histograms
        # over the written pool's profile metrics, so the load-gate
        # artifact doubles as the distribution snapshot a scheduler diffs
        # day-over-day (a sudden shift in length/token-count shape is the
        # classic upstream-crawler-change symptom that per-check booleans
        # can't see). K-row collect per column — report-sized, not data-
        # sized; the histogram itself is one broadcast + one map-side-
        # combined census (operators/quality.numeric_histogram).
        profile = shards.select(
            F.length("text").cast("double").alias("text_chars"),
            F.size(F.split(F.col("text"), " ")).cast("double").alias("n_tokens"),
        )
        histograms = {
            col: [
                {
                    "bin_id": r["bin_id"],
                    "bin_lo": r["bin_lo"],
                    "bin_hi": r["bin_hi"],
                    "n": r["n"],
                }
                for r in numeric_histogram(profile, col, n_bins=20)
                .orderBy("bin_id")
                .collect()
            ]
            for col in ("text_chars", "n_tokens")
        }
        with open(f"{args.out}/audit.json", "w") as f:
            json.dump({"checks": report, "histograms": histograms}, f, indent=1)

    release_caches()
    census = {
        "docs_in": n_in,
        "docs_kept": n_kept,
        "n_shards": args.n_shards,
        "out": args.out,
        "seconds": round(time.time() - t0, 2),
    }
    if n_calibrated is not None:
        census["docs_after_calibrated_keep"] = n_calibrated
    if compaction is not None:
        census["compaction"] = compaction
    if span_stats is not None:
        census["span_tokens_in"] = span_stats["t_in"]
        census["span_tokens_kept"] = span_stats["t_kept"]
        census["span_tokens_stripped"] = span_stats["t_in"] - span_stats["t_kept"]
    if args.audit:
        census["audit_passed"] = audit_ok
    print(json.dumps(census))
    return 0 if audit_ok else 1


if __name__ == "__main__":
    sys.exit(main())
