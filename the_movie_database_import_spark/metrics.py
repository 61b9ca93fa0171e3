"""Executor-side metric snapshots for benchmarking (VERDICT r06 #4).

Wall-clock medians on a shared host swing ±15-20% with background load,
which makes regressions machine-UNcheckable from the recorded artifact
alone. Executor CPU time is (to first order) load-invariant — contention
stretches wall time but not the cycles the query's own tasks consume — so
bench.py records BOTH: wall medians for the human-comparable headline,
CPU medians as the regression gate BASELINE.md states a band for.

Source: the driver's AppStatusStore (the same store the Spark UI's REST
API serves), read in-process over py4j — no UI server needed. Totals are
summed over completed stage attempts; a (before, after) snapshot pair
brackets one query's execution. Deltas are valid while the store retains
all stages created between the snapshots (spark.ui.retainedStages,
default 1000 — a bench pass creates a few hundred); a long-lived session
sweeping far past that should diff per-stage ids instead.
"""

from __future__ import annotations

from typing import NamedTuple


class StageTotals(NamedTuple):
    cpu_ns: int       # sum of executorCpuTime over completed stages
    run_ms: int       # sum of executorRunTime (task wall) over same
    tasks: int        # completed task count


def stage_totals(sc) -> StageTotals:
    """Snapshot cumulative executor metrics from the AppStatusStore.

    Only COMPLETE stage attempts are summed (ADVICE r07: an empty status
    list means ALL statuses, so ACTIVE/PENDING/FAILED stages — mid-run
    snapshots and CPU from failed or retried attempts — would leak into
    bench deltas and drift between the before/after reads)."""
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    statuses = jvm.java.util.ArrayList()
    statuses.add(jvm.org.apache.spark.status.api.v1.StageStatus.COMPLETE)
    stages = store.stageList(
        statuses,                            # COMPLETE attempts only
        False,                               # details
        False,                               # withSummaries
        sc._gateway.new_array(jvm.double, 0),  # quantiles
        jvm.java.util.ArrayList(),           # task statuses
    )
    cpu = run = tasks = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        cpu += s.executorCpuTime()
        run += s.executorRunTime()
        tasks += s.numCompleteTasks()
    return StageTotals(cpu, run, tasks)


def delta(before: StageTotals, after: StageTotals) -> StageTotals:
    """Per-query delta between two snapshots, clamped at 0: store eviction
    past spark.ui.retainedStages can shrink the cumulative totals between
    snapshots, and a negative "CPU spent" is always a store artifact, not
    a measurement (ADVICE r07)."""
    return StageTotals(
        max(0, after.cpu_ns - before.cpu_ns),
        max(0, after.run_ms - before.run_ms),
        max(0, after.tasks - before.tasks),
    )
