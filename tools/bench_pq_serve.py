"""Persisted-ANN-index serve-path bench (VERDICT r09 #2): split the cost
of a PQ/IVFPQ similarity query into BUILD (train codebooks + encode corpus
+ snapshot-commit — the pay-once ingest step) and SERVE (ADC scan over
stored codes + exact re-rank — the per-query cost), against the in-query
retrain path the registry's self-contained `q_similarity_*_topk` entries
pay every run.

Usage: python tools/bench_pq_serve.py   # $SPARK_GRAFT_SF_DIR, default sf0.1
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from the_movie_database_import_spark.operators.similarity import (
        ivfpq_topk,
        pq_index_build,
        pq_index_topk,
        pq_topk,
    )
    from the_movie_database_import_spark.session import get_spark
    from the_movie_database_import_spark.sources.readers import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_before = os.getloadavg()
    spark = get_spark("tmdb-spark-bench-pq-serve")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    n_corpus = emb.count()

    def timed(fn, passes=3):
        fn()  # untimed warmup
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 4)

    # in-query paths: retrain + re-encode every call
    inq_pq = timed(
        lambda: pq_topk(
            emb, queries, k=10, m=8, n_centroids=64, shortlist=100
        ).write.format("noop").mode("overwrite").save()
    )
    inq_ivfpq = timed(
        lambda: ivfpq_topk(
            emb, queries, k=10, n_centroids=8, n_probe=3, pq_centroids=64,
            shortlist=100,
        ).write.format("noop").mode("overwrite").save()
    )

    # build once (timed once — it's the pay-once step), then serve
    root = tempfile.mkdtemp(prefix="pq_serve_bench_")
    t0 = time.perf_counter()
    pq_index_build(emb, f"{root}/pq", m=8, n_centroids=64)
    build_pq = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    pq_index_build(emb, f"{root}/ivfpq", m=8, n_centroids=64, ivf_centroids=8)
    build_ivfpq = round(time.perf_counter() - t0, 4)

    serve_pq = timed(
        lambda: pq_index_topk(
            spark, f"{root}/pq", emb, queries, k=10, shortlist=100
        ).write.format("noop").mode("overwrite").save()
    )
    serve_ivfpq = timed(
        lambda: pq_index_topk(
            spark, f"{root}/ivfpq", emb, queries, k=10, shortlist=100,
            n_probe=3,
        ).write.format("noop").mode("overwrite").save()
    )

    print(
        json.dumps(
            {
                "metric": "pq_serve_vs_inquery",
                "unit": "sec",
                "n_corpus": n_corpus,
                "in_query": {"pq": inq_pq, "ivfpq": inq_ivfpq},
                "build_once": {"pq": build_pq, "ivfpq": build_ivfpq},
                "serve": {"pq": serve_pq, "ivfpq": serve_ivfpq},
                "sf_dir": sf_dir,
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
