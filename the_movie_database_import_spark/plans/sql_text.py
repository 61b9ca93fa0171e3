"""SQL front door: ONE ANSI SQL string executed verbatim by BOTH engines.

The reference has no query language (SURVEY.md §2.1) — its user writes
Python against a hardcoded pipeline. This engine's SQL front door is
``sources.readers.register_views`` + ``spark.sql(...)``: every testdata
table is a temp view over the same pruned parquet scans the DataFrame
plans use, so a user can bring plain SQL instead of the DataFrame API.

The query below is the PROOF: the literal ``SHARED_SQL`` string is both
the Spark plan (``spark.sql(SHARED_SQL)``) and the DuckDB oracle —
zero translation, so the parity gate directly certifies cross-engine ANSI
semantics (correlated EXISTS, interval date arithmetic, grouped count).
It is also the registry's only correlated-subquery coverage: Catalyst
decorrelates the EXISTS into a left-semi hash join on l_orderkey with the
date predicate as join condition — the plan a hand-written semi-join
would produce, confirming the rewrite costs nothing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import register_views
from .registry import register

# TPC-H Q4 shape over the testdata columns: orders with any line shipped
# more than 60 days after the order date, counted by priority. Written in
# the ANSI subset Spark SQL and DuckDB parse identically.
SHARED_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS late_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL '60' DAY
)
GROUP BY o_orderpriority
"""


@register("q_sql_shared_text", oracle=SHARED_SQL, tags=("sql", "subquery"))
def q_sql_shared_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared-text SQL front-door query: see module docstring. The
    DataFrame API never appears — this is exactly what a SQL-only user of
    the engine runs."""
    register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL)


# CTE + join + ranked window in the shared ANSI subset: certifies window
# semantics (partition/order, ties broken deterministically) cross-engine
# with zero translation, complementing SHARED_SQL's correlated-EXISTS
# coverage. ROW_NUMBER() is INTEGER in Spark and BIGINT in DuckDB, so the
# shared text casts it explicitly — the one dtype trap in this subset.
SHARED_SQL_WINDOW = """
WITH ranked AS (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, o_orderkey, o_totalprice,
       CAST(rn AS BIGINT) AS rn
FROM ranked
WHERE rn <= 3
"""


@register("q_sql_shared_window", oracle=SHARED_SQL_WINDOW, tags=("sql", "window"))
def q_sql_shared_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second shared-text front-door query: top-3 orders per market
    segment via a CTE + join + ranked window, the literal string executed
    by both engines (see module docstring). Catalyst plans it as the same
    single segment-keyed exchange + in-partition rank filter the
    DataFrame top-k-per-group plan produces."""
    register_views(spark, sf_dir)
    return spark.sql(SHARED_SQL_WINDOW)
