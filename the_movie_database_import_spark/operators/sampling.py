"""Deterministic hash sampling / stratified sampling / corpus splits
([ext] training-data pipeline, north star).

Reproducible membership is a first-class need when curating a 100 TB
corpus: ``df.sample()`` draws from a per-partition RNG, so membership
changes with partitioning, retries, and re-runs, and a backfill can't
reconstruct yesterday's split. Hashing a STABLE KEY instead makes
membership a pure row-local function — a re-run, an incremental append,
or a different cluster all agree on which side every document lands, and
train/val/test assignment survives re-partitioning by construction.

Mechanics: ``md5(key)``'s first 8 hex chars are a uniform draw from
[0, 16^8); comparing that lowercase-hex string against the hex encoding
of ``floor(rate * 16^8)`` keeps an expected ``rate`` fraction. The whole
predicate is built-in-function codegen directly on top of the scan — no
shuffle, no state, no Python; at any scale the cost is the scan itself.
Lexicographic comparison of fixed-width lowercase-hex strings equals
numeric comparison, so the same predicate is expressible verbatim in
ANSI SQL (the DuckDB oracles in plans/sampling.py use it).

The reference (a load-everything ETL, `loader.py`) has no sampling
surface; this module is part of the north-star extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_SPACE = 16**8  # first 8 md5 hex chars


def hex_threshold(rate: float) -> str:
    """``floor(rate * 16^8)`` as 8 lowercase hex chars — the string a row's
    hash bucket must stay below to be kept.

    rate=1.0 returns ``"g"``: 'g' sorts above every hex char in both Spark
    and DuckDB, so ``bucket < 'g'`` is keep-ALL. Clamping to 'ffffffff'
    instead would strictly-exclude the 1-in-2^32 rows whose bucket is
    exactly 'ffffffff' — making rate-1.0 not keep-all and sum-to-1 splits
    not exhaustive (essentially certain to bite in a multi-billion-row
    corpus)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    n = int(rate * HASH_SPACE)
    if n >= HASH_SPACE:
        return "g"
    return format(n, "08x")


def hash_bucket(key: Column) -> Column:
    """Uniform per-row draw: first 8 hex chars of md5 of the key rendered as
    a decimal string. Stringifying first keeps the draw portable — every
    engine hashes the same UTF-8 bytes, so oracles can replay it.

    The key must be an INTEGER or STRING column: engines agree on those
    renderings, but float/decimal/timestamp cast-to-string formats diverge
    (Spark '1.0E7' vs DuckDB '10000000.0'), which would silently break
    cross-engine reproducibility. Normalize such keys to a string yourself
    before hashing."""
    return F.md5(key.cast("string")).substr(1, 8)


def hash_sample(df: DataFrame, key: Column, rate: float) -> DataFrame:
    """Keep an expected ``rate`` fraction, deterministically in the key.

    Same key => same verdict, forever: re-runs are idempotent and appends
    sample consistently with history (the property Bernoulli ``sample()``
    lacks). Rows with a NULL key are dropped (md5(NULL) is NULL and the
    comparison is non-true), matching SQL filter semantics.
    """
    return df.filter(hash_bucket(key) < F.lit(hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key: Column,
    strata: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep rates (e.g. downsample dominant languages, keep all
    of rare ones). The per-row threshold is a literal CASE over the stratum
    value — still pure codegen on the scan, no join and no shuffle, because
    ``rates`` is a driver-side constant (it is a CURATION PARAMETER, not
    data; for data-driven rates join a broadcast rate table instead).
    Strata absent from ``rates`` fall back to ``default_rate``.
    """
    threshold = F.lit(hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = F.when(strata == F.lit(value), F.lit(hex_threshold(rate))).otherwise(
            threshold
        )
    return df.filter(hash_bucket(key) < threshold)


def split_column(
    key: Column,
    splits: dict[str, float],
    otherwise: str | None = None,
) -> Column:
    """Label each row with a split name ('train'/'val'/'test', ...) by
    cutting the hash space into consecutive fractions — disjoint and
    exhaustive when the fractions sum to 1 (the leftover, if any, gets
    ``otherwise``, NULL by default so downstream filters drop it loudly).

    Insertion order of ``splits`` fixes the interval layout, so growing one
    split only re-labels rows at its boundary — shrinking val from 0.2 to
    0.1 never moves a training row into val (no train/test leakage on
    re-splits).
    """
    # Chain inside-out so the FIRST (smallest-threshold) split wins the CASE.
    bucket = hash_bucket(key)
    expr: Column = F.lit(otherwise)
    for name, threshold in reversed(_split_thresholds(splits)):
        expr = F.when(bucket < F.lit(threshold), F.lit(name)).otherwise(expr)
    return expr


def _split_thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """Validated (name, cumulative hex threshold) pairs — the single source
    of the interval layout for both :func:`split_column` and its SQL twin
    :func:`split_case_sql` (drift between the two would silently break
    Spark/oracle parity)."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    if any(frac < 0 for frac in splits.values()):
        raise ValueError(f"negative split fraction in {splits}")
    cumulative = 0.0
    conditions: list[tuple[str, str]] = []
    for name, frac in splits.items():
        cumulative += frac
        # Snap to exactly 1.0 inside the same tolerance the sum>1 validation
        # uses: {0.7, 0.2, 0.1} accumulates to 0.9999999999999999, and without
        # the snap the final threshold would be 'ffffffff' instead of the
        # keep-all 'g' — dropping the 1-in-2^32 rows whose bucket is exactly
        # 'ffffffff' and silently breaking sum-to-1 exhaustiveness (the same
        # edge hex_threshold pins for rate=1.0).
        snapped = 1.0 if cumulative >= 1.0 - 1e-9 else cumulative
        conditions.append((name, hex_threshold(snapped)))
    return conditions


def sample_fixed_k(
    df: DataFrame,
    key: Column,
    strata: Column,
    k: int,
) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum, deterministically:
    the k smallest hash buckets win (ties broken by the key itself, so the
    result is unique even under a hash collision). The fixed-size complement
    of :func:`stratified_sample`'s fixed-rate draw — what an eval-set or
    labeling budget wants ("500 docs per language, same 500 every run").

    Adds ``_rk`` (1-based rank within the stratum) so callers can
    sub-slice consistently (e.g. first 100 for pass 1).

    Scale: one shuffle on the stratum key + a per-stratum sort — fine while
    no single stratum is monstrous. For a dominant stratum at 100 TB,
    pre-thin with ``hash_sample(df, key, c*k/n_stratum)`` (the uniform
    bucket means the true top-k survives a rate comfortably above k/n with
    overwhelming probability), then run this on the survivors.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if "_rk" in df.columns:
        raise ValueError(
            "sample_fixed_k writes reserved output column '_rk' which already "
            "exists in the input — rename it before calling"
        )
    w = Window.partitionBy(strata).orderBy(hash_bucket(key), key)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumn("_rk", F.col("_rk").cast("bigint"))
    )


def split_case_sql(key_sql: str, splits: dict[str, float], otherwise: str | None = None) -> str:
    """The ANSI-SQL twin of :func:`split_column`, for oracle queries: a CASE
    over the same hex thresholds on ``substr(md5(CAST(key AS VARCHAR)),1,8)``."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    bucket = f"substr(md5(CAST({key_sql} AS VARCHAR)),1,8)"
    arms = [
        f"WHEN {bucket} < {q(threshold)} THEN {q(name)}"
        for name, threshold in _split_thresholds(splits)
    ]
    tail = "NULL" if otherwise is None else q(otherwise)
    return "CASE " + " ".join(arms) + f" ELSE {tail} END"


def weighted_sample_key(
    key: Column, weight: Column, salt: str = "wk", grid: float = 1e9
) -> Column:
    """Efraimidis–Spirakis A-ES sampling key, grid-quantized: rank rows by
    ``u^(1/w)`` (u = the row's salted md5 uniform) and the top-k are a
    weighted sample WITHOUT replacement — selection probability
    proportional to weight, deterministic in the key, one expression on
    the scan. The salt decorrelates this draw from every other
    hash-sampling use of the same key.

    ``pow`` is the one primitive here without a cross-engine bit-exactness
    guarantee (Java Math.pow vs libm may differ in the last ulps), so the
    key is floor-quantized onto a 1e9 integer grid before ranking — the
    unigram-NLL/BM25 discipline; realized-value margins are pinned at
    every SF by tests/test_analytics.py::test_weighted_sample_grid_safety,
    and ranking ties on the grid break by the row key.
    """
    bucket = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string"))).substr(1, 8)
    u = (F.conv(bucket, 16, 10).cast("long") + F.lit(0.5)) / F.lit(float(HASH_SPACE))
    return F.floor(F.lit(grid) * F.pow(u, F.lit(1.0) / weight.cast("double"))).cast(
        "long"
    )


def sample_weighted_k(
    df: DataFrame,
    k: int,
    weight: Column,
    key: Column,
    salt: str = "wk",
) -> DataFrame:
    """Top-``k`` weighted sample without replacement (A-ES): deterministic,
    partition-independent, and idempotent like every sampler in this
    module — the weighted counterpart of ``sample_fixed_k`` (e.g. draw an
    eval set biased toward long or high-quality documents). Rows with
    non-positive or NULL weight are excluded (they have probability 0).
    Runs as TakeOrderedAndProject on a scan-side expression — per-partition
    heaps, no shuffle, no global sort."""
    return (
        df.filter(weight > 0)
        .withColumn("wkey_q", weighted_sample_key(key, weight, salt))
        .orderBy(F.col("wkey_q").desc(), key)
        .limit(k)
    )


def sample_weighted_k_per_group(
    df: DataFrame,
    k: int,
    weight: Column,
    key: Column,
    group_col: str,
    salt: str = "wg",
) -> DataFrame:
    """Top-``k`` weighted sample without replacement WITHIN EVERY GROUP
    ([ext] the stratified counterpart of :func:`sample_weighted_k` — the
    draw a mixture builder actually needs: "k quality-biased exemplars
    from EACH source", where a global weighted draw would let one heavy
    domain swallow the budget). Same A-ES key (``u^(1/w)`` on the salted
    md5 uniform, 1e9 floor grid under the cross-engine-soft ``pow``,
    ties broken by the row key), ranked by ``row_number`` per group;
    emits the surviving rows with their ``sample_rank`` (1 = strongest
    draw) so downstream budget trims are a filter, not a re-draw.
    Deterministic in (salt, key), partition-invariant, idempotent —
    the module contract. Rows with non-positive/NULL weight are excluded
    (probability 0).

    Scale shape: the A-ES key is a scan-side expression; the only
    exchange is one hash partitioning on the group for the window
    row_number (map-side nothing to combine — rank needs the group
    together), and groups stream independently. A skewed group costs its
    own size, never the corpus."""
    w = Window.partitionBy(group_col).orderBy(
        F.col("_wkq").desc(), key
    )
    return (
        df.filter(weight > 0)
        .withColumn("_wkq", weighted_sample_key(key, weight, salt))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_wkq")
    )
