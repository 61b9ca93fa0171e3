"""Every registered query vs its DuckDB oracle at sf0.001 — the local mirror
of the driver's CORRECTNESS gate (row-count + schema + value parity)."""

from __future__ import annotations

import pytest

from the_movie_database_import_spark.plans import REGISTRY

from conftest import SF_DIR, assert_frames_match

ALL_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check (driver does the same)
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
