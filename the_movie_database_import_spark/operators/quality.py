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


def value_outliers(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group Tukey-fence outlier census ([ext] profiling, the robust
    companion of :func:`numeric_histogram`): for every group, the exact
    linear-interpolated quartiles of ``value_col``, the 1.5-IQR fences,
    and how many values fall below/above them — the standard
    anomaly-screening report a load gate runs before training on a new
    batch. NULL values are excluded (they are not orderable).

    Determinism without a grid: Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` interpolate with different internal expression
    shapes (1-ulp wobble — ``q_agg_percentiles`` has to round to absorb
    it), which would make fence COMPARISONS flip. So the quartiles here
    are computed from ORDER STATISTICS with an explicit interpolation
    formula — ``v_lo + (v_hi - v_lo) * frac`` where ``h = q*(n-1)`` is
    exact binary arithmetic for q ∈ {0.25, 0.75} — that the oracle
    replays with the identical expression tree. Order statistics are
    exact data values and every subsequent op is a single correctly-
    rounded IEEE +,-,* in the same order on both engines, so quartiles,
    fences, and comparisons are bit-identical with NO quantization
    (the numeric_histogram / edit-distance lane of the determinism
    taxonomy, not the ln/pow lane).

    Scale design: one ``(group)`` aggregate collects each group's sorted
    values into the agg buffer — the exact-percentile memory profile
    (right for bounded-cardinality profiling groups; for unbounded
    groups use ``percentile_approx``, see ``q_agg_percentiles``'s scale
    note). The per-group fence table is tiny and BROADCASTS back; the
    census is one more map-side-combined aggregate. Data rows shuffle
    once, as (group, value) pairs.
    """
    c = F.col(value_col).cast("double")
    vals = df.filter(c.isNotNull()).select(F.col(group_col), c.alias("_v"))
    g = vals.groupBy(group_col).agg(
        F.sort_array(F.collect_list("_v")).alias("_vs"),
        F.count(F.lit(1)).alias("n"),
    )

    def interp(q: float) -> Column:
        # h is exact (q is a binary fraction, n-1 a small integer), so
        # floor/frac are exact; element_at is 1-based.
        h = F.lit(q) * (F.col("n") - 1).cast("double")
        lo = F.floor(h)
        v_lo = F.element_at("_vs", (lo + 1).cast("int"))
        v_hi = F.element_at(
            "_vs", F.least(lo + 2, F.col("n")).cast("int")
        )
        return v_lo + (v_hi - v_lo) * (h - F.floor(h))

    iqr_scale = 1.5
    fences = g.select(
        group_col,
        "n",
        interp(0.25).alias("q1"),
        interp(0.75).alias("q3"),
    ).select(
        group_col,
        "n",
        "q1",
        "q3",
        (F.col("q1") - F.lit(iqr_scale) * (F.col("q3") - F.col("q1"))).alias(
            "lo_fence"
        ),
        (F.col("q3") + F.lit(iqr_scale) * (F.col("q3") - F.col("q1"))).alias(
            "hi_fence"
        ),
    )
    return (
        vals.join(F.broadcast(fences), group_col)
        .groupBy(group_col, "n", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count(F.when(F.col("_v") < F.col("lo_fence"), F.lit(1))).alias(
                "n_low"
            ),
            F.count(F.when(F.col("_v") > F.col("hi_fence"), F.lit(1))).alias(
                "n_high"
            ),
        )
        .withColumn("n_outliers", F.col("n_low") + F.col("n_high"))
    )


def fk_orphan_audit(
    specs: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each declared FK relationship
    ``(name, child, fk_col, parent, pk_col)``, one row with the child's
    row count, its NULL-FK count, and its ORPHAN count (non-null FK with
    no matching parent key). This is the engine-side generalization of
    the reference's PostgreSQL FK constraints — `loader.py:67-78` flips
    triggers off during load and back on after, trusting the data; a
    Spark pipeline has no database to enforce them, so the audit makes
    the same contract CHECKABLE as a load gate (the FK companion of
    :func:`audit`'s per-column checks).

    Scale design: each spec is an independent subtree — the child's
    (fk) column LEFT-joins the parent's distinct key set (map-side-
    combinable distinct; the join is left UNHINTED: AQE broadcasts
    dimension-sized parents and shuffle-joins fact-sized ones), and all
    three counts are conditional aggregates of that one pass. K specs =
    K one-row aggregates unioned in-plan; nothing collects to the
    driver, and the Python loop below builds the PLAN, not the result.
    NULL FKs never join (SQL null semantics) and are counted as their
    own category — a NULL FK is a not-null-check violation, not an
    orphan.
    """
    frames = []
    for name, child, fk_col, parent, pk_col in specs:
        joined = child.select(F.col(fk_col).alias("_fk")).join(
            parent.select(F.col(pk_col).alias("_pk")).distinct(),
            F.col("_fk") == F.col("_pk"),
            "left",
        )
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(F.col("_fk").isNull(), F.lit(1))).alias(
                    "n_null_fk"
                ),
                F.count(
                    F.when(
                        F.col("_fk").isNotNull() & F.col("_pk").isNull(),
                        F.lit(1),
                    )
                ).alias("n_orphans"),
            ).select(
                F.lit(name).alias("fk"),
                "n_rows",
                "n_null_fk",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


# Benford's law first-digit probabilities, log10(1 + 1/d), rendered once
# in Python and baked into BOTH plans as literals (the BM25 repr()-
# constant discipline) — no runtime log10 anywhere, so no soft-fn wobble.
import math as _math

BENFORD_P = {d: _math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_census(
    df: DataFrame, value_col: str, decimals: int = 2
) -> DataFrame:
    """First-significant-digit census vs Benford's law — the classic
    fabricated-/degenerate-data screen for positive numeric columns
    spanning magnitudes (amounts, prices, populations): per digit 1-9,
    the observed count, observed fraction, Benford's expected
    probability, and the signed excess.

    Digit extraction is EXACT integer arithmetic, no log10: the column
    is contract-``decimals`` fixed-point (the testdata's money columns
    are 2-decimal), so ``round(v·10^decimals)`` recovers the exact
    integer (the product sits within 1e-10 of it — rounding can never
    be ambiguous), and the first digit is the first character of that
    integer's decimal string — identical on any engine, unlike
    ``floor(v / 10^floor(log10 v))`` whose soft log10/pow can flip a
    power-of-ten boundary. Expected probabilities are Python-rendered
    literals in both plans. NULL and non-positive values are excluded
    (Benford is defined on positive magnitudes).

    Scale: one scan, one 9-group map-side-combined census, a one-row
    total broadcast back in-plan. The fraction is a single division of
    exact integers — bit-identical, no grid.
    """
    scale = 10 ** int(decimals)
    c = F.col(value_col)
    digits = (
        df.filter(c.isNotNull() & (c > 0))
        .select(
            F.substring(
                F.round(c * F.lit(float(scale)), 0).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = digits.agg(F.sum("n_obs").alias("total"))
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(F.col("digit") == d, F.lit(BENFORD_P[d])).otherwise(
            expected
        )
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs").cast("double") / F.col("total")).alias("frac"),
            expected.alias("expected_p"),
        )
        .withColumn("excess", F.col("frac") - F.col("expected_p"))
    )
