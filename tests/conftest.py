from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from the_movie_database_import_spark.session import get_spark
from the_movie_database_import_spark.sources.readers import TESTDATA_TABLES

# sf0.001 keeps the suite fast for iteration; the driver's gate runs at
# sf0.01 — run `SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest` to
# mirror it exactly before shipping.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tmdb-spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's order-insensitive compare: sort columns by name,
    coerce numerics to float64 / timestamps to us precision, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    # Raw pandas dtypes must agree BEFORE normalize's float64 coercion: the
    # driver's value-hash is dtype-sensitive, so e.g. Spark floor (int64) vs
    # DuckDB floor (float64) is a driver FAIL even when values match (the
    # exact q_math_fns r01 failure). tools/exact_parity.py is the full
    # atol=0 mirror of the driver; this assertion puts the dtype half of it
    # in every suite run.
    sd = {c: str(t) for c, t in spark_pdf.dtypes.items()}
    od = {c: str(t) for c, t in oracle_pdf.dtypes.items()}
    dtype_diffs = {
        c: (sd.get(c), od.get(c)) for c in set(sd) | set(od) if sd.get(c) != od.get(c)
    }
    assert not dtype_diffs, f"{name}: spark-vs-oracle dtype mismatches {dtype_diffs}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != oracle {list(b.columns)}"
    )
    # rtol must stay 0: the driver hashes exact values, and a relative
    # tolerance would mask rounding-boundary flips on large aggregates.
    # atol 1e-6 only absorbs 1-ulp representation noise.
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-6, obj=name
    )
