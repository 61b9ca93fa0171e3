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


def test_approx_count_distinct_error_bound(spark, duck):
    """The HLL++ sketch has no value oracle (sketches differ across engines),
    but its ESTIMATE must sit within the configured relative error of the
    exact distinct count per group — rsd=0.01, asserted at a loose 5% so the
    bound never flakes while still catching a broken sketch."""
    approx = {
        r.o_orderstatus: r.approx_n_customers
        for r in REGISTRY["q_agg_approx_count_distinct"].spark_fn(spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for status, n_exact in exact.items():
        assert abs(approx[status] - n_exact) <= max(0.05 * n_exact, 2), (
            f"{status}: approx {approx[status]} vs exact {n_exact}"
        )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_approx_percentile_error_bound(spark):
    """percentile_approx(accuracy=10000) guarantees rank error <= n/accuracy;
    on l_quantity (integers 1..50, ~uniform) that is a value error well
    under 1 quantity unit per quartile — asserted at a loose ±1.0 against
    the exact twin so the bound never flakes while catching a broken
    sketch."""
    exact = {
        r.l_returnflag: (r.qty_p25, r.qty_p50, r.qty_p75)
        for r in REGISTRY["q_agg_percentiles"].spark_fn(spark, SF_DIR).collect()
    }
    approx = {
        r.l_returnflag: (r.qty_p25_approx, r.qty_p50_approx, r.qty_p75_approx)
        for r in REGISTRY["q_agg_percentiles_approx"].spark_fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for flag, exact_qs in exact.items():
        for e, a in zip(exact_qs, approx[flag]):
            assert abs(e - a) <= 1.0, (flag, exact_qs, approx[flag])
