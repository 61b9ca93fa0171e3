"""VERDICT r13 #6 experiment: can a runtime-settable config cut the
~40-100 ms/job floor that taxes the orchestration-bound relational
headline queries (flagship/multiway/pricing/rollup) at sf0.1?

Interleaved A/B inside ONE session (so JVM/codegen/footer warmup and the
host-speed window are shared): for each candidate config, each query runs
config-A pass then config-B pass, repeated N times; reports per-query
median wall and task count under each config. Interleaving makes the
comparison robust to the 1.3-1.5x host-speed oscillation documented since
r13 — both arms see the same window.

Candidates:
  B1: spark.sql.adaptive.coalescePartitions.parallelismFirst=false
      (AQE coalesces to advisoryPartitionSizeInBytes instead of stopping
      at defaultParallelism — guide §2.2's size-based coalescing; at
      sf0.1 this shrinks post-shuffle task counts, so a win here is the
      local[32]-only kind VERDICT r13 #6 warns about unless task counts
      stay equal)
  B2: spark.sql.adaptive.enabled=false (information only — AQE is the
      engine's scale-correctness backbone; a win here would still be
      rejected, but it BOUNDS how much of the floor is AQE replanning)

Usage: python tools/ab_job_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q_flagship_star_revenue",
    "q_join_multiway_star",
    "q_pricing_summary",
    "q_agg_rollup",
]

CANDIDATES = {
    "B1_parallelismFirst=false": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "B2_aqe=off": {
        "spark.sql.adaptive.enabled": "false",
    },
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from the_movie_database_import_spark import metrics
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.session import get_spark

    spark = get_spark("ab-job-floor")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    baseline = {
        key: spark.conf.get(key)
        for conf in CANDIDATES.values()
        for key in conf
    }

    def run(name: str) -> tuple[float, int]:
        snap0 = metrics.stage_totals(sc)
        t0 = time.perf_counter()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        d = metrics.delta(snap0, metrics.stage_totals(sc))
        return wall, d.tasks

    for name in QUERIES:  # shared warmup under defaults
        run(name)

    for label, conf in CANDIDATES.items():
        results: dict[str, dict[str, list]] = {
            name: {"A_wall": [], "A_tasks": [], "B_wall": [], "B_tasks": []}
            for name in QUERIES
        }
        # one untimed warmup under B so codegen for any changed plan shape
        # is not charged to B's first timed pass
        for key, val in conf.items():
            spark.conf.set(key, val)
        for name in QUERIES:
            run(name)
        for key, val in baseline.items():
            spark.conf.set(key, val)
        # ABBA per query per round: the host's 1.3-1.5x speed oscillation
        # operates on ~minute timescales, so adjacent A,B,B,A runs of the
        # SAME query see nearly the same window and the round ratio
        # (B1+B2)/(A1+A2) cancels linear drift. Per-round ratios, median
        # over rounds — a plain A-block-then-B-block loop measured drift,
        # not the config (first attempt: pricing A runs 16.9/4.1/6.9 s).
        ratios: dict[str, list[float]] = {name: [] for name in QUERIES}
        for _ in range(6):
            for name in QUERIES:
                sc.setJobDescription(f"A:{name}")
                wa1, ta = run(name)
                for key, val in conf.items():
                    spark.conf.set(key, val)
                sc.setJobDescription(f"B:{name}")
                wb1, tb = run(name)
                wb2, _ = run(name)
                for key, val in baseline.items():
                    spark.conf.set(key, val)
                sc.setJobDescription(f"A:{name}")
                wa2, _ = run(name)
                results[name]["A_wall"] += [wa1, wa2]
                results[name]["B_wall"] += [wb1, wb2]
                results[name]["A_tasks"].append(ta)
                results[name]["B_tasks"].append(tb)
                ratios[name].append((wb1 + wb2) / (wa1 + wa2))
        print(f"\n=== {label} ===")
        for name in QUERIES:
            r = results[name]
            aw, bw = statistics.median(r["A_wall"]), statistics.median(r["B_wall"])
            at, bt = statistics.median(r["A_tasks"]), statistics.median(r["B_tasks"])
            med_ratio = statistics.median(ratios[name])
            print(
                f"  {name}: A {aw:.3f}s/{at:.0f}t  B {bw:.3f}s/{bt:.0f}t  "
                f"median per-round B/A {med_ratio:.3f}  "
                f"round_ratios={[f'{x:.3f}' for x in ratios[name]]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
