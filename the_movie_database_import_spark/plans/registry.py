"""Central registry of engine queries.

Each entry pairs a Spark DataFrame plan with (where SQL-expressible) an ANSI
SQL oracle that DuckDB runs against the same parquet tables. The driver's
correctness gate compares row-count + schema + order-insensitive value-hash,
so every computed column is aliased identically on both sides, floating-point
aggregates are rounded on both sides, and derived integers are produced as
BIGINT on both sides (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
