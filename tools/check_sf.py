#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle at an arbitrary sf dir
(defaults to sf0.01 — the driver's correctness-gate scale). Usage:

    python tools/check_sf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from the_movie_database_import_spark.plans import REGISTRY
from the_movie_database_import_spark.session import get_spark
from the_movie_database_import_spark.sources.readers import TESTDATA_TABLES


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("tmdb-spark-checksf")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            spdf = spec.spark_fn(spark, sf_dir).toPandas()
            if spec.oracle is None:
                print(f"  {name}: rows-only ({len(spdf)} rows)")
                continue
            odf = con.execute(spec.oracle).fetchdf()
            a, b = norm(spdf), norm(odf)
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-6
            )
            print(f"  {name}: OK ({len(a)} rows)")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            msg = str(exc).replace("\n", " | ")[:300]
            print(f"  {name}: FAIL {msg}")
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} OK at {sf_dir}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
