"""Deterministic surrogate-key assignment (ref A8, `loader.py:117-118,
:161-223`).

The reference assigns dense sequential ids to languages/countries in
first-appearance order via mutable counters — irreproducible in a distributed
engine. This module assigns ids by ``dense_rank`` over the natural key
(deviation D1, SURVEY.md §7.5): deterministic, idempotent, and join-stable.

Scale note: ``dense_rank`` over an unpartitioned window serializes on one
task, which is fine because surrogate keys are only ever assigned to
*dimension-sized* distinct key sets (languages, countries: dozens). For
high-cardinality keys use ``monotonically_increasing_id`` + a broadcast
remap, or ``zipWithIndex`` — not needed for reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_surrogate_ids(
    df: DataFrame, natural_key: str, id_col: str = "surrogate_id"
) -> DataFrame:
    """Distinct natural keys → dense 1-based ids ordered by the key."""
    w = Window.orderBy(natural_key)
    return (
        df.select(natural_key)
        .filter(F.col(natural_key).isNotNull())
        .distinct()
        .withColumn(id_col, F.dense_rank().over(w).cast("bigint"))
    )


def attach_surrogate_ids(
    df: DataFrame, natural_key: str, id_col: str = "surrogate_id"
) -> DataFrame:
    """Join surrogate ids back onto the full input. The distinct key set is
    dimension-sized for the intended workloads, but its cardinality is
    DATA-dependent (a near-unique "natural key" would be corpus-sized), so
    the broadcast hint is budget-guarded: within budget the join
    broadcasts, past it the join shuffles on the key — same result, and
    the guard's count materializes the cached id map the join reads
    (EAGER: the id-map job runs at construction time, ADVICE r07)."""
    from ..session import maybe_broadcast

    ids = assign_surrogate_ids(df, natural_key, id_col)
    return df.join(maybe_broadcast(ids), natural_key, "left")
