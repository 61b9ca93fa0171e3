"""Declarative data-quality audit ([ext]): evaluate a set of column
constraints — not-null, value range, accepted values, non-negativity,
composite-key uniqueness — in (at most) ONE pass over the table and emit
one row per check with its violation count, the Deequ/Great-Expectations
shape every warehouse load gate needs. The reference enforces integrity
only via PostgreSQL FK triggers flipped off during load
(`loader.py:67-78`); this is the engine-side generalization.

Scale design: every predicate check compiles to a conditional SUM inside
a single global aggregate — one partial+final agg, no shuffle of data
rows, however many checks run. Uniqueness checks need distinct counting,
which Spark plans as an Expand over the same scan (one shuffle on the
key); violations = total - distinct. The audit result is K rows (K =
number of checks), built in-row from the one-row aggregate — nothing
ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def check_not_null(column: str) -> tuple[str, Column]:
    return f"not_null({column})", F.col(column).isNull()

def check_range(column: str, lo, hi) -> tuple[str, Column]:
    """Violated when the value is NULL or outside [lo, hi]."""
    c = F.col(column)
    return (
        f"range({column},{lo},{hi})",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )

def check_non_negative(column: str) -> tuple[str, Column]:
    c = F.col(column)
    return f"non_negative({column})", c.isNull() | (c < F.lit(0))

def check_accepted_values(column: str, values: Sequence) -> tuple[str, Column]:
    c = F.col(column)
    vals = ",".join(str(v) for v in values)
    return f"accepted_values({column},[{vals}])", c.isNull() | ~c.isin(list(values))


def audit(
    df: DataFrame,
    predicate_checks: Sequence[tuple[str, Column]],
    unique_keys: Sequence[Sequence[str]] = (),
) -> DataFrame:
    """Run ``predicate_checks`` (name, violation-condition) pairs and
    ``unique_keys`` (column lists that must be jointly unique) over ``df``;
    returns ``(check_name STRING, violations BIGINT,
    total BIGINT, passed BOOLEAN)`` — one row per check, ``passed = violations == 0``.

    All predicate checks share ONE aggregate (conditional sums over a
    single scan). Each uniqueness check adds a count-distinct over the key
    struct to the same aggregate — duplicate rows count as
    ``total - n_distinct`` violations. The K-row result explodes from the
    one-row aggregate in-row; no driver-side loop.
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    names: list[str] = []
    for i, (name, cond) in enumerate(predicate_checks):
        aggs.append(F.sum(cond.cast("long")).alias(f"_v{i}"))
        names.append(name)
    for j, key in enumerate(unique_keys):
        aggs.append(
            F.count_distinct(F.struct(*[F.col(k) for k in key])).alias(f"_u{j}")
        )
    one = df.agg(*aggs)

    entries = [
        F.struct(
            F.lit(name).alias("check_name"),
            # empty input: SUM is NULL -> zero violations, checks pass
            F.coalesce(F.col(f"_v{i}"), F.lit(0).cast("long")).alias("violations"),
        )
        for i, name in enumerate(names)
    ]
    entries += [
        F.struct(
            F.lit(f"unique({','.join(key)})").alias("check_name"),
            (F.col("_total") - F.col(f"_u{j}")).alias("violations"),
        )
        for j, key in enumerate(unique_keys)
    ]
    return (
        one.select(F.col("_total"), F.explode(F.array(*entries)).alias("_e"))
        .select(
            F.col("_e.check_name").alias("check_name"),
            F.col("_e.violations").cast("long").alias("violations"),
            F.col("_total").cast("long").alias("total"),
            (F.col("_e.violations") == 0).alias("passed"),
        )
    )


def numeric_histogram(
    df: DataFrame, column: str, n_bins: int = 20
) -> DataFrame:
    """Equi-width histogram — the numeric-profiling companion of
    :func:`audit`: ``(bin_id BIGINT, bin_lo DOUBLE, bin_hi DOUBLE,
    n BIGINT)`` over ``n_bins`` equal-width bins spanning [min, max],
    NULLs excluded, the max value folded into the last bin. Empty bins
    are absent (sparse form).

    One tiny min/max aggregate broadcasts back in-plan (the zorder /
    bm25 one-row-stats pattern — data never moves for statistics); the
    bin id is pure +,-,*,/ floor arithmetic — IEEE-identical across
    engines when written in the same shape, so the oracle needs NO
    quantization grid (unlike the ln/pow-based scores) — and the census
    is one map-side-combined aggregate on the bin id. Degenerate input
    (min == max) lands everything in bin 0 with a zero-width edge pair.
    """
    c = F.col(column)
    stats = df.filter(c.isNotNull()).agg(
        F.min(c).cast("double").alias("_lo"), F.max(c).cast("double").alias("_hi")
    )
    lo, hi = F.col("_lo"), F.col("_hi")
    width_bin = F.least(
        F.lit(n_bins - 1),
        F.floor((c.cast("double") - lo) * F.lit(n_bins) / (hi - lo)),
    )
    bin_id = F.when(hi > lo, width_bin).otherwise(F.lit(0)).cast("long")
    return (
        df.filter(c.isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(bin_id.alias("bin_id"), "_lo", "_hi")
        .groupBy("bin_id", "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin_id",
            (lo + F.col("bin_id") * (hi - lo) / F.lit(n_bins)).alias("bin_lo"),
            (lo + (F.col("bin_id") + 1) * (hi - lo) / F.lit(n_bins)).alias(
                "bin_hi"
            ),
            "n",
        )
    )
