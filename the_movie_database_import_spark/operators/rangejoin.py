"""Binned interval join ([ext]): a pure range join (no equi key) expressed
as an equi-join on time bins plus a residual predicate.

Vanilla Spark plans a keyless range join as BroadcastNestedLoopJoin (or a
cartesian product) — O(|L| x |R|) comparisons, fatal at 100 TB. Binning is
the standard rewrite (the same idea as Databricks' range-join bin hints):

- each LEFT row owns the interval [ts + lower, ts + upper);
- each RIGHT row is the point at its ts;
- with bin width w, the left row explodes over the ceil(width/w)+1 bins its
  interval overlaps, the right row hashes to the single bin floor(ts/w);
- the join is then a plain shuffled equi-join on the bin id — partitionable,
  AQE-skew-splittable — and the exact range predicate runs as a residual on
  the matched rows only.

Each qualifying (left, right) pair matches in exactly ONE bin (the right
point's), so no post-join dedup is needed. All arithmetic is integer
microseconds, so bin coverage and the residual are exact (no second
truncation slop against microsecond timestamps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICROS_PER_SECOND = 1_000_000


def _micros(ts_col: Column) -> Column:
    # TIMESTAMP_NTZ → TIMESTAMP is a wall-clock no-op under the engine's
    # pinned UTC session timezone.
    return F.unix_micros(ts_col.cast("timestamp"))


def interval_point_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    extra_pred: Column | None = None,
    bin_width_s: float | None = None,
) -> DataFrame:
    """Join every left row to the right rows whose ``right_ts`` falls in
    [left_ts + lower_s, left_ts + upper_s). Column names must be disjoint
    between the two sides (pre-alias in the caller)."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    w_us = int((bin_width_s or (upper_s - lower_s)) * MICROS_PER_SECOND)
    lo_us = int(lower_s * MICROS_PER_SECOND)
    hi_us = int(upper_s * MICROS_PER_SECOND)

    l_us = _micros(F.col(left_ts))
    left_b = left.withColumn("_l_us", l_us).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((F.col("_l_us") + F.lit(lo_us)) / F.lit(w_us)),
                # end-exclusive: the last covered microsecond is hi_us - 1
                F.floor((F.col("_l_us") + F.lit(hi_us) - F.lit(1)) / F.lit(w_us)),
            )
        ),
    )
    right_b = right.withColumn("_r_us", _micros(F.col(right_ts))).withColumn(
        "_bin", F.floor(F.col("_r_us") / F.lit(w_us))
    )
    residual = (F.col("_r_us") >= F.col("_l_us") + F.lit(lo_us)) & (
        F.col("_r_us") < F.col("_l_us") + F.lit(hi_us)
    )
    if extra_pred is not None:
        residual = residual & extra_pred
    joined = left_b.join(right_b, on=(left_b["_bin"] == right_b["_bin"]) & residual)
    return joined.drop("_bin", "_l_us", "_r_us")
