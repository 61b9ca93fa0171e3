#!/usr/bin/env python
"""Rebuild-on-drift showcase: close the loop the recall probe (r11) only
measures. `pq_index_append`'s docstring prescribes the maintenance recipe —
probe each appended batch, rebuild when batch recall crosses the floor —
and this tool RUNS it end to end with planted drift:

1. build a PQ index over a seeded base corpus; probe a base query batch to
   establish the build-time recall (the deployment floor = that − 0.05);
2. append a PLANTED-DRIFT batch (an opposite-orthant cluster the build's
   codebooks have zero support for: its sub-vectors snap to boundary codes,
   so ADC distances stop discriminating inside the cluster and the
   shortlist goes blind exactly the way real embedding drift does);
3. probe the appended batch — watch recall cross the floor;
4. rebuild with `pq_index_build` at the SAME path (snapshot-protocol
   replace: readers bound to the old generation keep their segments until
   vacuum; codes + new codebook sidecar commit atomically);
5. re-probe the drifted batch — recall recovered above the floor;
6. `snapshot_vacuum` reclaims the superseded segments and sidecar.

Serve-identity pin across the rebuild: with shortlist >= corpus the served
top-k is exact brute force by the calibration invariant (recall == 1.0
regardless of codebooks), so unchanged queries must return IDENTICAL
(vec_id, cosine) results from the old and new index — asserted here, the
showcase's correctness gate.

Run: PYTHONPATH=/root/repo python tools/ann_drift_showcase.py
Prints one JSON line with the recall trajectory and vacuum counts.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 12000
N_DRIFT = 3000
DIM = 64
M = 8
N_CENTROIDS = 64
K = 10
SHORTLIST = 200
FLOOR_MARGIN = 0.05


def mean_recall(rows) -> float:
    rows = list(rows)
    return sum(r.recall for r in rows) / len(rows)


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.similarity import (
        pq_index_build,
        pq_index_append,
        pq_index_recall_probe,
        pq_index_topk,
    )
    from the_movie_database_import_spark.session import get_spark
    from the_movie_database_import_spark.sources.writers import (
        snapshot_current,
        snapshot_vacuum,
    )

    spark = get_spark("ann-drift-showcase")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(7)
    # base corpus lives in the POSITIVE orthant, the drift batch in the
    # NEGATIVE one: both have identical internal neighbor geometry (same
    # |N(0,I)| spread, so a retrained index resolves the drifted batch as
    # well as it resolved the base), but the build-time codebooks have
    # zero support where the drifted sub-vectors land — every drift
    # sub-vector snaps to a boundary centroid, ADC distances collapse,
    # and the shortlist goes blind: the frozen-codebook drift failure in
    # its purest form
    base = np.abs(rng.standard_normal((N_BASE, DIM)))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    drift = -np.abs(rng.standard_normal((N_DRIFT, DIM)))
    drift /= np.linalg.norm(drift, axis=1, keepdims=True)

    def to_df(mat: np.ndarray, start_id: int):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(start_id, start_id + len(mat)),
                    "embedding": list(mat.astype(np.float64)),
                }
            )
        )

    base_df = to_df(base, 0)
    drift_df = to_df(drift, N_BASE)
    full_df = base_df.unionByName(drift_df)
    base_queries = base_df.filter(F.col("vec_id") < 100)
    drift_queries = drift_df.filter(F.col("vec_id") < N_BASE + 100)

    workdir = tempfile.mkdtemp(prefix="spark_graft_anndrift_")
    path = os.path.join(workdir, "index")
    out: dict = {}
    try:
        pq_index_build(base_df, path, m=M, n_centroids=N_CENTROIDS)
        out["build_generation"] = snapshot_current(path)["generation"]
        r_build = mean_recall(
            pq_index_recall_probe(
                spark, path, base_df, base_queries, k=K, shortlist=SHORTLIST
            ).collect()
        )
        floor = r_build - FLOOR_MARGIN
        out["recall_base_at_build"] = round(r_build, 4)
        out["deployment_floor"] = round(floor, 4)

        pq_index_append(drift_df, path)
        out["append_generation"] = snapshot_current(path)["generation"]
        # the per-append probe from pq_index_append's recipe: batch
        # vectors as queries, exact side over the FULL covered corpus
        r_drift_before = mean_recall(
            pq_index_recall_probe(
                spark, path, full_df, drift_queries, k=K, shortlist=SHORTLIST
            ).collect()
        )
        out["recall_drift_batch_before_rebuild"] = round(r_drift_before, 4)
        out["floor_crossed"] = bool(r_drift_before < floor)

        # serve-identity gate: shortlist >= corpus → exact by calibration
        # invariant; capture BEFORE the rebuild for unchanged base queries
        def exact_serve():
            rows = pq_index_topk(
                spark, path, full_df, base_queries,
                k=K, shortlist=N_BASE + N_DRIFT,
            ).collect()
            return sorted(
                (r.query_id, r.vec_id, round(r.cosine, 9)) for r in rows
            )

        served_before = exact_serve()

        # the rebuild: same path, codebooks retrained over base ∪ drift,
        # committed as a snapshot REPLACE with a fresh sidecar
        pq_index_build(full_df, path, m=M, n_centroids=N_CENTROIDS)
        out["rebuild_generation"] = snapshot_current(path)["generation"]
        r_drift_after = mean_recall(
            pq_index_recall_probe(
                spark, path, full_df, drift_queries, k=K, shortlist=SHORTLIST
            ).collect()
        )
        out["recall_drift_batch_after_rebuild"] = round(r_drift_after, 4)
        out["recovered_above_floor"] = bool(r_drift_after >= floor)

        served_after = exact_serve()
        out["serve_identical_for_unchanged_queries"] = (
            served_before == served_after
        )

        removed = snapshot_vacuum(path, keep=1)
        out["vacuum_removed"] = removed
        sidecars = [
            f for f in os.listdir(path) if f.startswith("_pqindex-")
        ]
        out["sidecars_after_vacuum"] = len(sidecars)

        ok = (
            out["floor_crossed"]
            and out["recovered_above_floor"]
            and out["serve_identical_for_unchanged_queries"]
            and out["sidecars_after_vacuum"] == 1
        )
        out["ok"] = ok
        print(json.dumps(out))
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
