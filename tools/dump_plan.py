"""Dump .explain('formatted') for registry queries to plans/$SPARK_GRAFT_PLANS_DIR (default r14)/<q>_<tag>.txt.

Usage: python tools/dump_plan.py <before|after> q_a q_b ...
"""
from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from the_movie_database_import_spark.plans import REGISTRY
    from the_movie_database_import_spark.session import get_spark
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted)
        print("wrote", path)
    spark.stop()

if __name__ == "__main__":
    main()
