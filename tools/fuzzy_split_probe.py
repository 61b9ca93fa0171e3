#!/usr/bin/env python
"""Fuzzy-pairs CPU attribution probe (VERDICT r11 #7): `q_fuzzy_name_pairs`
is the extension series' top sf1/sf0.1 wall ratio (9.55× at r11) —
data-shaped (candidate density), not a plan problem, but the ratio needs an
attributable CPU SPLIT on record so a future regression can be localized:

- **candidates** — variant explode + hot-cap anti-join + variant-hash
  equi-join + pair-distinct (cost ∝ n_rows × avg_len for generation plus
  the candidate stream itself);
- **verify** — the two name lookback joins + the exact O(len²) Levenshtein
  DP per surviving candidate (cost ∝ n_candidates × avg_len²).

Method: run the candidate sub-plan alone (same code path — the operator's
join pipeline cut before the name joins), then the full operator, each
measured with the bench's stage-delta CPU accounting, median of
``passes`` timed passes after one warmup; verify CPU = full − candidates.
Caches are released between measurements so each pass pays the true cost.

Run at both tiers:
  PYTHONPATH=/root/repo python tools/fuzzy_split_probe.py testdata_local/sf0.1
  PYTHONPATH=/root/repo python tools/fuzzy_split_probe.py testdata_local/sf1
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def main() -> None:
    from pyspark.sql import functions as F

    from the_movie_database_import_spark import metrics
    from the_movie_database_import_spark.operators.fuzzy import (
        deletion_variants,
        fuzzy_pairs_edit1,
    )
    from the_movie_database_import_spark.session import (
        get_spark,
        maybe_broadcast,
        release_caches,
        tracked_cache,
    )
    from the_movie_database_import_spark.sources.readers import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("fuzzy-split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same inputs as q_fuzzy_name_pairs
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )

    def candidates_only():
        # the operator's candidate pipeline, cut before the name joins —
        # mirrors operators/fuzzy.fuzzy_pairs_edit1 stages 1-3 verbatim
        base = cust.select(
            F.col("id").alias("_id"), F.col("name").alias("_name")
        )
        sides = tracked_cache(
            base.select("_id", deletion_variants("_name").alias("_vars"))
            .select("_id", F.explode("_vars").alias("_v"))
            .select("_id", F.xxhash64("_v").alias("_vh"))
        )
        counts = sides.groupBy("_vh").agg(F.count(F.lit(1)).alias("_n"))
        kept = sides.join(
            maybe_broadcast(counts.filter(F.col("_n") > 64)),
            "_vh",
            "left_anti",
        )
        a = kept.select(F.col("_id").alias("id_a"), "_vh")
        b = kept.select(F.col("_id").alias("id_b"), "_vh")
        return (
            a.join(b, "_vh")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    def full():
        return fuzzy_pairs_edit1(cust, id_col="id", name_col="name")

    def measure(build):
        walls, cpus, rows = [], [], None
        release_caches()
        rows = build().count()  # warmup, uncounted
        for _ in range(PASSES):
            release_caches()
            snap0 = metrics.stage_totals(sc)
            t0 = time.monotonic()
            rows = build().count()
            walls.append(time.monotonic() - t0)
            d = metrics.delta(snap0, metrics.stage_totals(sc))
            cpus.append(d.cpu_ns / 1e9)
        return (
            round(statistics.median(walls), 3),
            round(statistics.median(cpus), 3),
            rows,
        )

    cand_wall, cand_cpu, n_cands = measure(candidates_only)
    full_wall, full_cpu, n_pairs = measure(full)
    out = {
        "sf_dir": sf_dir,
        "passes": PASSES,
        "loadavg": os.getloadavg()[0],
        "n_candidates": n_cands,
        "n_verified_pairs": n_pairs,
        "candidates_wall_sec": cand_wall,
        "candidates_cpu_sec": cand_cpu,
        "full_wall_sec": full_wall,
        "full_cpu_sec": full_cpu,
        "verify_cpu_sec": round(full_cpu - cand_cpu, 3),
        "verify_share_of_cpu": round(
            (full_cpu - cand_cpu) / full_cpu, 3
        ) if full_cpu else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
