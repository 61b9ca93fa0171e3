"""Statistical-census operators ([ext]): per-key OLS trend, lag-1
autocorrelation, chi-squared independence, and Welch's two-sample t —
the "is this data drifting / dependent / different" toolkit a corpus
curation pipeline runs alongside the distribution censuses
(`vocab.token_kl_divergence`, `quality.benford_audit`, Tukey fences).

The reference pipeline (`loader.py`) has no statistics surface at all —
this is north-star extension territory, same as the dedup/quality
families. Every operator here is a pure AGGREGATE composition:

- All four reduce to map-side-combinable moments (sums, co-moments,
  counts) over the fact table — ONE shuffle keyed by the group column,
  partial aggregation on the scan side, result cardinality = number of
  groups. That shape is invariant under 1000x row growth: only the
  pre-combine scan scales, the shuffle carries (key, moment-vector)
  rows.
- Spark's `regr_slope/intercept/r2` and `corr/var_samp` ARE those
  moment aggregates (Welford-style co-moment accumulation inside the
  JVM hash aggregate) — no window, no join, no UDF in the hot path.
- The chi-squared and Welch compositions join only POST-aggregate
  frames (contingency cells, two group-moment rows) — each at most a
  few dozen rows, always behind `F.broadcast`.

Everything is SQL-expressible, so every query built on this module is
oracle-checked against DuckDB's identical regr_*/corr/var_samp
aggregates (floating outputs rounded identically on both sides, counts
emitted as BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def regr_trend_per_key(
    df: DataFrame,
    key_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-key ordinary-least-squares trend of ``y`` against ``x``:
    ``(key, n_obs, slope, intercept, r2)`` — the "which segments are
    drifting, how fast, and how linearly" census (e.g. metric value
    against event time per event type; document quality against crawl
    date per source).

    One hash aggregate: `regr_count/slope/intercept/r2` are co-moment
    aggregates (sum, sum x, sum y, sum xy, sum x^2, sum y^2 folded in
    one pass), so partial aggregation combines map-side and the shuffle
    carries one moment vector per (partition, key). Rows where either
    operand is NULL are excluded pairwise by the regr_* contract on
    both engines — no explicit filter needed.

    Keys with a single observation (or zero x-variance) yield NULL
    slope/r2 on both engines; they stay in the output so the census
    also surfaces "too thin to fit" segments.
    """
    return df.groupBy(key_col).agg(
        F.regr_count(y, x).alias("n_obs"),
        F.regr_slope(y, x).alias("slope"),
        F.regr_intercept(y, x).alias("intercept"),
        F.regr_r2(y, x).alias("r2"),
    )


def autocorr_lag1(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    val_col: str,
) -> DataFrame:
    """Per-key lag-1 serial correlation of ``val_col`` in ``order_cols``
    order: ``(key, n_pairs, autocorr)`` — the "is this series momentum
    or noise" census (near +1: trending/sticky; near 0: independent
    draws; near -1: oscillating), the cheap screen run before paying
    for a full trend fit or a changepoint pass.

    Plan: one key-partitioned WINDOW pairs each value with its
    predecessor (the same single user/key-keyed exchange every
    sequential operator in this engine rides — sessionize, EWMA,
    funnel), then `corr` collapses the pairs in one hash aggregate that
    reuses the window's partitioning (no second exchange: the aggregate
    key equals the window partition key, so Catalyst folds them into
    one shuffle). ``order_cols`` must be a deterministic total order
    within each key (include a unique id as tie-break — timestamps
    alone can collide, and lag under ties is engine-defined).

    Pairs where either side is NULL drop out of the statistic on both
    engines (each key's first row has no predecessor); keys with < 3
    rows or zero variance yield NULL autocorr and stay in the census.
    The statistic is assembled from covar_samp/stddev_samp moments
    behind a positive-variance guard rather than `corr` directly:
    Spark's `corr` under ANSI mode (the 4.x default this engine runs)
    raises DIVIDE_BY_ZERO on a zero-variance series — a constant stream
    is a routine input at corpus scale, and the SQL-standard answer
    (DuckDB, PostgreSQL) is NULL, not an error. Identical Pearson
    value where defined (same co-moments, one division).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev = F.lag(val_col).over(w)
    paired = df.select(key_col, F.col(val_col).alias("_v"), prev.alias("_prev"))
    both = F.col("_v").isNotNull() & F.col("_prev").isNotNull()
    pv = F.when(both, F.col("_v"))
    pp = F.when(both, F.col("_prev"))
    m = paired.groupBy(key_col).agg(
        F.count("_prev").alias("n_pairs"),
        F.covar_samp(pv, pp).alias("_cov"),
        F.stddev_samp(pv).alias("_sv"),
        F.stddev_samp(pp).alias("_sp"),
    )
    return m.select(
        key_col,
        "n_pairs",
        F.when(
            (F.col("_sv") > 0) & (F.col("_sp") > 0),
            F.col("_cov") / (F.col("_sv") * F.col("_sp")),
        ).alias("autocorr"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: one row ``(n_rows, n_cells, dof, chi2)`` — the "are these
    two labels entangled" audit (language x source in a crawl corpus:
    a large statistic means sources are language-skewed and per-source
    sampling will shift the language mix).

    Plan: ONE hash aggregate over the fact table produces the
    contingency cells (cardinality = |A| x |B|, tiny); row totals,
    column totals, and the grand total are three more aggregates OF THE
    CELLS, joined back cell-wise behind `F.broadcast` — at 100 TB the
    only full-data cost is the single cell census, everything after is
    constant-size. The cell table is tracked_cache'd because FOUR plan
    branches consume it (cells + three margin aggregates) — without the
    cache each branch re-scans the base table (measured: 4 parquet
    scans in the physical plan), which is exactly the 100 TB cost this
    shape exists to avoid; the cached frame is |A| x |B| rows. NULL
    categories count as ordinary levels (they form real cells; dropping
    them would silently bias the margins).

    chi2 = sum over cells of (obs - exp)^2 / exp with
    exp = row_total * col_total / n; dof = (|A|-1) * (|B|-1) where |A|
    and |B| COUNT a NULL level when one exists — dof and chi2 see the
    same level grid (countDistinct alone would exclude NULL, yielding
    chi2 > 0 with dof = 0 on a table whose dependence runs through the
    NULL column, and any p-value from that pair would be wrong).
    """
    from ..session import tracked_cache

    cells = tracked_cache(
        df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_obs"))
    )
    row_tot = cells.groupBy(col_a).agg(F.sum("_obs").alias("_ra")).select(
        F.col(col_a).alias("_a2"), "_ra"
    )
    col_tot = cells.groupBy(col_b).agg(F.sum("_obs").alias("_cb")).select(
        F.col(col_b).alias("_b2"), "_cb"
    )
    # countDistinct ignores NULL; the max(when isNull) flag adds the NULL
    # level back so dof ranges over the SAME grid the chi2 sum does.
    null_a = F.max(F.when(F.col(col_a).isNull(), 1).otherwise(0))
    null_b = F.max(F.when(F.col(col_b).isNull(), 1).otherwise(0))
    grand = cells.agg(
        F.sum("_obs").alias("_n"),
        F.count(F.lit(1)).alias("n_cells"),
        (F.countDistinct(col_a) + null_a).alias("_ka"),
        (F.countDistinct(col_b) + null_b).alias("_kb"),
    )
    exp = F.col("_ra") * F.col("_cb") / F.col("_n")
    # NULL-SAFE margin joins: a NULL category forms a real cell with real
    # margins — a plain equality join would silently drop it from the
    # statistic while n_cells still counted it (the docstring's "NULL
    # levels are ordinary levels" contract would be a lie).
    return (
        cells.join(
            F.broadcast(row_tot), F.col(col_a).eqNullSafe(F.col("_a2"))
        )
        .join(F.broadcast(col_tot), F.col(col_b).eqNullSafe(F.col("_b2")))
        .crossJoin(F.broadcast(grand))
        .agg(
            F.first("_n").alias("n_rows"),
            F.first("n_cells").alias("n_cells"),
            ((F.first("_ka") - 1) * (F.first("_kb") - 1)).alias("dof"),
            F.sum((F.col("_obs") - exp) * (F.col("_obs") - exp) / exp).alias(
                "chi2"
            ),
        )
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_cells").cast("bigint").alias("n_cells"),
            F.col("dof").cast("bigint").alias("dof"),
            "chi2",
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t between ``group_a`` and
    ``group_b``'s ``val_col``: one row ``(n_a, n_b, mean_a, mean_b,
    t_stat, df_welch)`` — the A/B answer ("did the metric move between
    these two segments, beyond noise") with the Welch-Satterthwaite
    degrees of freedom, the variant that stays valid when the groups'
    variances differ (they always do in telemetry).

    Plan: conditional aggregation in ONE pass over the (pre-filtered)
    fact table — count/avg/var_samp per group come from the same hash
    aggregate via `when(group = a, value)` branches, so there is no
    per-group scan, no join, and the shuffle carries one moment vector
    per input partition (global aggregate: partial combine does nearly
    all the work map-side). The scalar t and df arithmetic runs on the
    single result row.

    t = (mean_a - mean_b) / sqrt(va/na + vb/nb);
    df = (va/na + vb/nb)^2 / ((va/na)^2/(na-1) + (vb/nb)^2/(nb-1)).
    NULL values are ignored by count/avg/var_samp on both engines; a
    group with < 2 observations yields NULL t and df (var_samp NULL,
    which propagates), and TWO CONSTANT arms (both variances exactly 0)
    also yield NULL behind an explicit guard — under Spark's ANSI mode
    the bare division would raise DIVIDE_BY_ZERO, where the statistics
    answer is "undefined", not an error.
    """
    in_a = F.when(F.col(group_col) == group_a, F.col(val_col))
    in_b = F.when(F.col(group_col) == group_b, F.col(val_col))
    m = df.filter(F.col(group_col).isin(group_a, group_b)).agg(
        F.count(in_a).alias("n_a"),
        F.count(in_b).alias("n_b"),
        F.avg(in_a).alias("mean_a"),
        F.avg(in_b).alias("mean_b"),
        F.var_samp(in_a).alias("_va"),
        F.var_samp(in_b).alias("_vb"),
    )
    sa = F.col("_va") / F.col("n_a")
    sb = F.col("_vb") / F.col("n_b")
    se2 = sa + sb
    defined = se2 > 0
    return m.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "mean_a",
        "mean_b",
        F.when(
            defined, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
        ).alias("t_stat"),
        F.when(
            defined,
            (se2 * se2)
            / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)),
        ).alias("df_welch"),
    )


def twap_per_key(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average of ``val_col`` per key — each observation
    weighted by how long it REMAINED the latest value (the TWAP/TWA of
    finance and telemetry: a metric sampled irregularly must not let
    burst-sampled moments dominate the mean). Returns ``(key, n_obs,
    span_us, twap)``; the last observation of each key carries no
    duration and keys whose observations all share one timestamp have
    zero span -> NULL twap (guarded — ANSI would raise).

    Determinism: a distributed sum of ``v * dt`` doubles is
    addition-order-dependent, so the value is FLOOR-QUANTIZED to a 1e-6
    grid (one IEEE multiply + floor — identical on any engine; no
    transcendentals, so no grid-boundary ulp hazard) and the
    ``v_q * dt_us`` products are summed as EXACT decimal integers
    (microsecond durations are exact int64) — partition-count- and
    order-INVARIANT by construction. The one residual cross-ENGINE
    wobble is the final 128-bit-integer -> double conversion itself
    (DuckDB's hugeint cast is not always correctly rounded, measured 1
    ulp at sf0.01), so oracle-compared outputs round the final ratio;
    within Spark the value is bit-stable at any parallelism.

    Scale shape: ONE key-keyed exchange (the lead window); the
    aggregate that follows groups on the window's partition key, so
    Catalyst reuses the exchange — map-side combine collapses each
    partition to one (key, decimal-sum, span) row. Decimal(38,0) sums
    hold ~1e38: a century of microseconds times a 1e12-scaled value per
    row leaves ~1e8 rows of headroom per key before overflow — document
    lengths beyond that want a coarser value grid.
    """
    from .analytics import _epoch_us

    us = _epoch_us(events, ts_col)
    w = Window.partitionBy(key_col).orderBy("_us", tiebreak_col)
    rows = (
        events.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(tiebreak_col),
            us.alias("_us"),
            F.floor(F.col(val_col) * F.lit(1e6))
            .cast("decimal(20,0)")
            .alias("_vq"),
        )
        # same-us ties contribute dt = 0 whatever their tiebreak order,
        # so the lead is order-insensitive where it matters; the tiebreak
        # still makes the window's order total (deterministic plans).
        .withColumn("_dt", F.lead("_us").over(w) - F.col("_us"))
    )
    agg = rows.filter(F.col("_dt").isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n_gaps"),
        F.sum(F.col("_vq") * F.col("_dt").cast("decimal(18,0)")).alias("_num"),
        F.sum("_dt").alias("span_us"),
    )
    return agg.select(
        key_col,
        (F.col("_n_gaps") + 1).cast("bigint").alias("n_obs"),
        F.col("span_us").cast("bigint").alias("span_us"),
        F.when(
            F.col("span_us") > 0,
            F.col("_num").cast("double")
            / F.lit(1e6)
            / F.col("span_us").cast("double"),
        ).alias("twap"),
    )


def gap_quantiles(
    events: DataFrame,
    type_col: str = "event_type",
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Inter-event-gap quantile census: for each event type, the exact
    linear-interpolated quartiles of the gaps (in seconds) between a
    user's CONSECUTIVE events of that type — the recurrence-interval
    report behind repurchase cycles, crash periodicity, and retention
    modeling ("how long until the next purchase, typically?").

    Gaps are integer microseconds (exact), quartiles come from ORDER
    STATISTICS with the explicit ``v_lo + (v_hi - v_lo) * frac``
    interpolation tree (the `value_outliers` determinism lane: exact h
    = q*(n-1) for binary-fraction q, every later op one correctly-
    rounded IEEE step in the same order on both engines — bit-identical
    with NO grid). Seconds = µs / 1e6, one exact-input division.

    Scale shape: ONE (user, type)-keyed window computes the gaps; the
    per-type collect is the exact-percentile memory profile (right for
    bounded type cardinality — this is a census over event TYPES, not
    users; unbounded groups want percentile_approx instead, the
    q_agg_percentiles trade).
    """
    from .analytics import _epoch_us

    # order by the derived _us (+ tiebreak): equivalent to ts order
    # (epoch microseconds are monotone in ts) and still in scope after
    # the projection below drops the raw timestamp.
    w = Window.partitionBy(key_col, type_col).orderBy("_us", tiebreak_col)
    us = _epoch_us(events, ts_col)
    gaps = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(type_col), F.col(key_col), us.alias("_us"),
                F.col(tiebreak_col))
        .withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
        .filter(F.col("_gap").isNotNull())
        .select(type_col, (F.col("_gap").cast("double") / F.lit(1e6)).alias("_g"))
    )
    g = gaps.groupBy(type_col).agg(
        F.sort_array(F.collect_list("_g")).alias("_gs"),
        F.count(F.lit(1)).alias("n_gaps"),
    )

    def interp(q: float) -> Column:
        h = F.lit(q) * (F.col("n_gaps") - 1).cast("double")
        lo = F.floor(h)
        v_lo = F.element_at("_gs", (lo + 1).cast("int"))
        v_hi = F.element_at("_gs", F.least(lo + 2, F.col("n_gaps")).cast("int"))
        return v_lo + (v_hi - v_lo) * (h - F.floor(h))

    return g.select(
        type_col,
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        interp(0.25).alias("p25_secs"),
        interp(0.5).alias("median_secs"),
        interp(0.75).alias("p75_secs"),
    )


def cusum_per_key(
    events: DataFrame,
    target: float,
    slack: float,
    threshold: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str = "event_id",
    grid: float = 1e6,
) -> DataFrame:
    """One-sided upper CUSUM change-point statistic per key — the
    sequential drift detector (Page 1954): accumulate
    ``s_i = max(0, s_{i-1} + (x_i - target - slack))`` along each key's
    time-ordered stream; a sustained upward shift past ``target + slack``
    grows s linearly while in-control noise resets it. Returns
    ``(key, n_obs, cusum_final_q, cusum_peak_q, alarm)`` with the
    statistic in integer GRID units (divide by ``grid`` for value units)
    and ``alarm = peak >= threshold`` — the "which entities drifted high,
    and when did the evidence peak" census behind telemetry paging and
    data-drift gates.

    NOT a fold: the recurrence has the prefix-minimum closed form
    ``s_i = P_i - min(0, min_{j<=i} P_j)`` with ``P_i = sum_{t<=i}
    (x_t - k)``, so it runs as two ordered WINDOW aggregates instead of
    an in-row list fold — unlike the EWMA (whose multiplicative
    recurrence has no such form and must fold), CUSUM distributes over
    Spark's native running aggregates. Both windows share ONE key-keyed
    exchange with the final per-key aggregate.

    Determinism: running SUM frames are engine-internal (DuckDB
    evaluates general frames with segment trees — a different addition
    ORDER than Spark's sequential accumulation), so the fold-replay
    argument that makes EWMA bit-exact does NOT apply; instead ``x - k``
    floor-quantizes to the integer ``grid`` BEFORE the windows and every
    subsequent op (running sum, running min, subtract, max) is exact
    64-bit integer arithmetic — order-free, bit-identical on any engine
    and any partitioning. ``threshold`` compares in grid units:
    exact."""
    kq = int(target * grid) + int(slack * grid)
    hq = int(threshold * grid)
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xq = (
        F.floor(F.col(val_col) * F.lit(grid)).cast("bigint") - F.lit(kq)
    ).alias("_xq")
    rows = (
        events.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .select(F.col(key_col), F.col(ts_col), F.col(tiebreak_col), xq)
        .withColumn("_p", F.sum("_xq").over(run))
        .withColumn("_s", F.col("_p") - F.least(F.lit(0), F.min("_p").over(run)))
    )
    g = rows.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max(F.struct(ts_col, tiebreak_col, F.col("_s").alias("_v")))[
            "_v"
        ].alias("cusum_final_q"),
        F.max("_s").alias("cusum_peak_q"),
    )
    return g.select(
        key_col,
        "n_obs",
        "cusum_final_q",
        "cusum_peak_q",
        (F.col("cusum_peak_q") >= F.lit(hq)).alias("alarm"),
    )


# Poisson(1) CDF thresholds as 8-hex-char strings over md5's 16^8 space
# (the sampling-family hash-bucket convention): a replicate weight is the
# count of thresholds the row's bucket clears — P(0)=e^-1, P(<=1)=2e^-1,
# ... truncated at 5 (P(>5) ~ 0.06%, negligible bootstrap-weight mass).
# Python-rendered literals so the DuckDB oracle embeds the SAME strings.
_POISSON1_HEX = ("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5")


def _poisson1_weight(bucket: Column) -> Column:
    """Deterministic Poisson(1) draw from a uniform hex bucket: 0 below
    the first threshold, else the number of thresholds cleared (capped
    at 5). Lexicographic compare of fixed-width lowercase hex == numeric
    compare — identical in any engine. A short-circuiting when-chain
    (r13): the draw is the index of the FIRST threshold above the
    bucket, so codegen stops at the matching branch — expected ~1.7
    compares per draw instead of always-5 with the additive ladder
    (P(w=0)=e^-1 alone resolves 37% of draws in one compare). Same
    function of the bucket, so oracle weights are unchanged."""
    w: Column = F.lit(len(_POISSON1_HEX))
    chain = F.when(bucket < F.lit(_POISSON1_HEX[0]), 0)
    for i, t in enumerate(_POISSON1_HEX[1:], 1):
        chain = chain.when(bucket < F.lit(t), i)
    return chain.otherwise(w)


def bootstrap_se_mean(
    df: DataFrame,
    key_col: str,
    val_col: str,
    id_col: str,
    n_replicates: int = 32,
    grid: float = 1e6,
) -> DataFrame:
    """ONE-PASS Poisson-bootstrap standard error of the per-key mean
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams"
    — the Google-scale bootstrap): instead of resampling the data B
    times (B full passes, impossible at 100 TB), every row carries B
    DETERMINISTIC Poisson(1) weights derived from md5(id, b); replicate
    b's mean is sum(w_b * v) / sum(w_b), and the bootstrap SE is the
    sample standard deviation of the B replicate means. Returns
    ``(key, n_rows, mean, bootstrap_se)`` — the error bar every census
    in this engine can now wear.

    Engine shape: 2B + 2 conditional sums in ONE hash aggregate (B
    weighted value sums + B weight sums, codegen branches — no explode,
    no join, no second pass); the B replicate means and their stddev
    compute IN-ROW on the one-row-per-key result.

    Determinism — three lanes composed: hash weights are exact integers
    from the sampling family's md5-hex convention (engine-identical);
    one md5 yields FOUR independent 32-bit buckets (the 32-hex digest
    byte-sliced into 8-hex windows), so B=32 weights cost ceil(B/4)=8
    digests per row instead of 32 — the r12 verdict's scan-CPU fix
    (#3; xxhash64 would pack 8 weights per call but DuckDB has no
    xxhash64, and the oracle must replay the identical derivation);
    values floor-quantize to the integer ``grid`` before the weighted
    sums (order-invariant exact sums, the unigram_nll lane); the
    replicate-mean divisions and the stddev tree run on exact inputs in
    replicate order on both engines (the interpolation lane's argument)
    — so the SE is bit-identical cross-engine before any rounding.
    Replicates with zero total weight (possible only for tiny keys)
    drop out of the SE via NULL means; keys need >= 2 live replicates
    for a non-NULL SE.
    """
    from ..sources.readers import fan_out

    vq = F.floor(F.col(val_col) * F.lit(grid)).cast("bigint")
    # Project to the 3 needed columns BEFORE fan_out: the weight derivation
    # is the scan-side CPU (8 digests + 32 when-chains per row), and a
    # single local parquet file arrives as a handful of splits — fan_out
    # spreads the narrow (key, vq, id) rows across cores first (a metadata
    # no-op on a real thousands-of-splits scan; weights are a pure hash of
    # the id, so the repartition cannot change any value).
    narrow = fan_out(
        df.filter(F.col(val_col).isNotNull()).select(
            F.col(key_col), vq.alias("_vq"), F.col(id_col).alias("_bid")
        )
    )
    cols = [F.col(key_col), F.col("_vq")]
    for g in range((n_replicates + 3) // 4):
        digest = F.md5(F.concat(F.col("_bid").cast("string"), F.lit(f":{g}")))
        for j in range(min(4, n_replicates - 4 * g)):
            bucket = digest.substr(1 + 8 * j, 8)
            b = 4 * g + j
            cols.append(_poisson1_weight(bucket).cast("bigint").alias(f"_w{b}"))
    rows = narrow.select(*cols)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_vq").alias("_sv"),
    ]
    for b in range(n_replicates):
        aggs.append(F.sum(F.col(f"_w{b}") * F.col("_vq")).alias(f"_ws{b}"))
        aggs.append(F.sum(f"_w{b}").alias(f"_wn{b}"))
    g = rows.groupBy(key_col).agg(*aggs)
    means = F.array(
        *[
            F.when(
                F.col(f"_wn{b}") > 0,
                F.col(f"_ws{b}").cast("double")
                / (F.col(f"_wn{b}").cast("double") * F.lit(grid)),
            )
            for b in range(n_replicates)
        ]
    )
    live = F.filter(means, lambda m: m.isNotNull())
    k = F.size(live)
    mbar = F.aggregate(live, F.lit(0.0), lambda a, m: a + m) / k
    ss = F.aggregate(
        live, F.lit(0.0), lambda a, m: a + (m - mbar) * (m - mbar)
    )
    return g.select(
        key_col,
        "n_rows",
        (F.col("_sv").cast("double") / (F.col("n_rows") * F.lit(grid))).alias(
            "mean"
        ),
        F.when(k >= 2, F.sqrt(ss / (k - 1).cast("double"))).alias(
            "bootstrap_se"
        ),
    )


def ab_funnel_lift(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """A/B funnel-lift readout — the composite an experimentation
    platform computes at scale: split users 50/50 by hash (the sampling
    family's deterministic interval assignment — stable under reruns
    and repartitioning, no stored assignment table), measure each arm's
    first-``from_type`` -> later-``to_type`` conversion rate, and emit
    the lift with a two-proportion pooled z statistic. One row:
    ``(n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift, z_stat)``.

    This composes three proven pieces: `split_column`'s md5 intervals
    (assignment never shuffles), the conversion logic of
    `conversion_by_deadline` (conditional-MIN window + per-user
    aggregate, one user exchange), and the conditional-aggregation
    pattern of `welch_ttest` (both arms from ONE global aggregate).
    z = (pa - pb) / sqrt(p(1-p)(1/na + 1/nb)) with p the pooled rate;
    guarded NULL when a degenerate pool (p = 0 or 1) zeroes the
    denominator (the ANSI divide-by-zero discipline). All inputs to the
    arithmetic are exact counts — the z tree is deterministic IEEE.
    """
    from .sampling import split_column

    us = _epoch_us_events(events, ts_col)
    w = Window.partitionBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    first_from = F.min(F.when(F.col(type_col) == from_type, us)).over(w)
    base = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col),
        F.col(type_col),
        us.alias("_us"),
        first_from.alias("_ff"),
    )
    per_user = (
        base.groupBy(key_col)
        .agg(
            F.max(F.col("_ff").isNotNull()).alias("_eligible"),
            F.max(
                (F.col(type_col) == to_type)
                & F.col("_ff").isNotNull()
                & (F.col("_us") > F.col("_ff"))
            ).alias("_converted"),
        )
        .filter(F.col("_eligible"))
        .select(
            split_column(F.col(key_col), {"A": 0.5, "B": 0.5}).alias("_arm"),
            F.col("_converted"),
        )
    )
    in_a, in_b = F.col("_arm") == "A", F.col("_arm") == "B"
    m = per_user.agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.count(F.when(in_a & F.col("_converted"), 1)).alias("conv_a"),
        F.count(F.when(in_b & F.col("_converted"), 1)).alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return m.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (ra - rb).alias("lift"),
        F.when(se > 0, (ra - rb) / se).alias("z_stat"),
    )


def _epoch_us_events(df: DataFrame, ts_col: str) -> Column:
    from .analytics import _epoch_us

    return _epoch_us(df, ts_col)


def psi_drift(
    df: DataFrame,
    key_col: str,
    val_col: str,
    baseline_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per key ([ext] the ML-monitoring
    drift statistic — the numeric-feature sibling of
    `vocab.token_kl_divergence`): bin ``val_col`` into ``n_bins``
    equal-width bins spanning the POOLED [min, max], split rows by the
    boolean ``baseline_col``, and score
    ``PSI = sum_bins (p_cur - p_base) * ln(p_cur / p_base)`` — the
    symmetrized-KL-shaped census behind "did this feature's
    distribution move between training and serving" gates (industry
    folklore thresholds: <0.1 stable, 0.1-0.25 shifting, >0.25 drifted).
    Returns ``(key, n_baseline, n_current, psi)``.

    Bin proportions use add-one (Laplace) smoothing over the bin count
    — ``p = (cnt + 1) / (tot + n_bins)`` — so empty bins contribute a
    finite, deterministic term instead of an infinity (the standard PSI
    practice of flooring proportions, in its exactly-reproducible
    form).

    Plan: ONE pass over the fact table for the pooled min/max (tiny
    one-row broadcast, the numeric_histogram lane), ONE map-side-
    combined (key, bin) census with both sides' counts as conditional
    sums — no per-side scan — then per-key totals aggregate OVER THE
    CENSUS (cardinality keys x bins) broadcast-joined back. At 100 TB
    the only full-data costs are the stats pass and the census pass.

    Determinism: p_cur/p_base is computed as a ratio of exact integer
    PRODUCTS ((cnt_c+1)*(tot_b+n_bins) etc., < 2^53 — both engines form
    the identical double), and each bin's term floor-quantizes onto the
    1e-6 integer grid BEFORE the per-key sum (the unigram_nll ln lane:
    ln differs by 1 ulp across libms, the grid absorbs it and integer
    sums are order/partition-invariant). Output rounds to 1e-6.
    """
    from ..session import tracked_cache

    c = F.col(val_col).cast("double")
    base = df.filter(c.isNotNull())
    stats = base.agg(
        F.min(c).alias("_lo"), F.max(c).alias("_hi")
    )
    lo, hi = F.col("_lo"), F.col("_hi")
    width_bin = F.least(
        F.lit(n_bins - 1), F.floor((c - lo) * F.lit(n_bins) / (hi - lo))
    )
    bin_id = F.when(hi > lo, width_bin).otherwise(F.lit(0)).cast("long")
    is_base = F.col(baseline_col)
    # tracked_cache: TWO plan branches consume the census (the term rows
    # and the per-key totals) — uncached, each branch re-runs the full
    # min/max + census pipeline from the base table (measured: 4 parquet
    # scans), exactly the 100 TB cost this shape avoids; the cached frame
    # is keys x bins rows (the chi2 cells pattern).
    census = tracked_cache(
        base.crossJoin(F.broadcast(stats))
        .select(F.col(key_col), bin_id.alias("_bin"), is_base.alias("_b"))
        .groupBy(key_col, "_bin")
        .agg(
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("_cb"),
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).alias("_cc"),
        )
    )
    totals = census.groupBy(key_col).agg(
        F.sum("_cb").alias("_tb"), F.sum("_cc").alias("_tc")
    ).select(F.col(key_col).alias("_k2"), "_tb", "_tc")
    # exact-integer smoothed proportions: ratio formed from < 2^53 products
    num = (F.col("_cc") + 1) * (F.col("_tb") + n_bins)
    den = (F.col("_cb") + 1) * (F.col("_tc") + n_bins)
    p_c = (F.col("_cc") + 1) / (F.col("_tc") + F.lit(n_bins))
    p_b = (F.col("_cb") + 1) / (F.col("_tb") + F.lit(n_bins))
    term = (p_c - p_b) * F.log(
        num.cast("double") / den.cast("double")
    )
    # eqNullSafe (ADVICE r09): a NULL-key group survives the census
    # groupBy, so the census-to-totals join must not drop it — the same
    # null-safe margin-join convention as chi2_independence (the oracle
    # mirrors with IS NOT DISTINCT FROM)
    return (
        census.join(
            F.broadcast(totals), F.col(key_col).eqNullSafe(F.col("_k2"))
        )
        .select(
            F.col(key_col),
            "_tb",
            "_tc",
            F.floor(term * F.lit(1_000_000.0)).cast("bigint").alias("_tq"),
        )
        .groupBy(key_col)
        .agg(
            F.first("_tb").alias("n_baseline"),
            F.first("_tc").alias("n_current"),
            F.round(F.sum("_tq") / F.lit(1_000_000.0), 6).alias("psi"),
        )
        .select(
            key_col,
            F.col("n_baseline").cast("bigint").alias("n_baseline"),
            F.col("n_current").cast("bigint").alias("n_current"),
            "psi",
        )
    )


def seasonal_zscore_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    grid: int = 100,
) -> DataFrame:
    """Day-of-week seasonal residual z-scores per key ([ext] the
    telemetry anomaly screen): per (key, date), the day's value total
    scored against the MEAN and SD of the same key's same-weekday totals
    — the seasonal-naive baseline that keeps a quiet Sunday from paging
    as an anomaly and a quiet Tuesday from hiding as one. Returns
    ``(key, day, dow, day_total, dow_mean, dow_sd, z_score)``; the
    consumer thresholds ``z_score`` (emitting the score instead of a
    verdict keeps every comparison on identically-rounded values —
    cross-engine safe). The day participates in its own baseline
    (standard seasonal-naive; leave-one-out is a rank-1 update the
    caller can apply to the emitted moments).

    Determinism: daily totals sum ``value`` floor-quantized to an
    integer ``grid`` as decimal — exact, order/partition-invariant (the
    TWAP lane); weekday moments over the ~4-5 exact totals per (key,
    dow) use avg/stddev_samp (the moment lane — both engines' one-pass
    co-moments agree far inside 1e-6) and everything emitted rounds to
    1e-6. ``dow`` computes arithmetically as days-since-epoch mod 7
    (0 = Thursday) — the one weekday encoding both engines share
    exactly (DATE_FORMAT/strftime weekday conventions differ).

    Plan: ONE (key, date) hash aggregate over the fact table (map-side
    combined) is the only full-data pass; the weekday moments are a
    window over the tiny daily census sharing its (key,)-prefixed
    partitioning; cardinality = keys x days thereafter.
    """
    day = F.col(ts_col).cast("date")
    vq = F.floor(F.col(val_col) * F.lit(grid)).cast("decimal(20,0)")
    daily = (
        df.filter(F.col(ts_col).isNotNull() & F.col(val_col).isNotNull())
        .groupBy(F.col(key_col), day.alias("day"))
        .agg((F.sum(vq) / F.lit(grid)).cast("double").alias("day_total"))
        .withColumn(
            "dow",
            (F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7)
            .cast("int"),
        )
    )
    w = Window.partitionBy(key_col, "dow")
    scored = daily.select(
        key_col,
        "day",
        "dow",
        "day_total",
        F.avg("day_total").over(w).alias("_mean"),
        F.stddev_samp("day_total").over(w).alias("_sd"),
    )
    return scored.select(
        key_col,
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        F.round("day_total", 6).alias("day_total"),
        F.round("_mean", 6).alias("dow_mean"),
        F.round("_sd", 6).alias("dow_sd"),
        F.round(
            F.when(
                F.col("_sd") > 0,
                (F.col("day_total") - F.col("_mean")) / F.col("_sd"),
            ),
            6,
        ).alias("z_score"),
    )


def psi_baseline(
    df: DataFrame,
    key_col: str,
    val_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Freeze a PSI reference distribution as a DATAFRAME census (r13,
    VERDICT r12 #5 — no ``.collect()`` on the batch path): one row per
    observed ``(key, bin)`` with the baseline count, plus the pooled
    [lo, hi] bin range and ``n_bins`` carried on every row (the census is
    keys x bins — KB-scale at any data size, so the constant columns cost
    nothing and keep the artifact self-describing/persistable as a plain
    table). Consumed in-plan by :func:`psi_against_baseline` (batch) and,
    via :func:`psi_baseline_dict`, by `streaming/windows.stream_psi`
    (the applyInPandasWithState twin, whose per-key state genuinely is a
    driver-side python dict)."""
    c = F.col(val_col).cast("double")
    base = df.filter(c.isNotNull())
    stats = base.agg(F.min(c).alias("_lo"), F.max(c).alias("_hi"))
    lo, hi = F.col("_lo"), F.col("_hi")
    width_bin = F.least(
        F.lit(n_bins - 1), F.floor((c - lo) * F.lit(n_bins) / (hi - lo))
    )
    bin_id = F.when(hi > lo, width_bin).otherwise(F.lit(0)).cast("int")
    return (
        base.crossJoin(F.broadcast(stats))
        .groupBy(F.col(key_col), bin_id.alias("_bin"))
        .agg(
            F.count(F.lit(1)).alias("_n_base"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
        )
        .withColumn("_n_bins", F.lit(n_bins))
    )


def psi_baseline_dict(baseline: DataFrame) -> dict:
    """Collect a :func:`psi_baseline` census into the streaming-state
    artifact ``{lo, hi, n_bins, keys: {key: [bin counts]}}`` — the ONLY
    collect in the PSI family, sized keys x (2 + n_bins) numbers, and
    needed precisely because `stream_psi`'s cross-batch state lives in
    python inside ``applyInPandasWithState``."""
    rows = baseline.collect()
    if not rows:
        return {"lo": None, "hi": None, "n_bins": 0, "keys": {}}
    key_name = baseline.columns[0]
    n_bins = rows[0]["_n_bins"]
    out: dict = {
        "lo": rows[0]["_lo"],
        "hi": rows[0]["_hi"],
        "n_bins": n_bins,
        "keys": {},
    }
    for r in rows:
        k = out["keys"].setdefault(r[key_name], [0] * n_bins)
        k[r["_bin"]] = r["_n_base"]
    return out


def _psi_from_counts(base_counts, cur_counts, grid: int = 1_000_000) -> float:
    """The shared PSI formula over two integer bin-count vectors —
    Laplace-smoothed proportions as exact integer ratios, each term
    floor-quantized to the integer grid before summing (identical math to
    `psi_drift`'s distributed form; used by the streaming twin and its
    parity test, so stream and batch agree bit-for-bit)."""
    import math

    nb = len(base_counts)
    tb, tc = sum(base_counts), sum(cur_counts)
    tq = 0
    for cb, cc in zip(base_counts, cur_counts):
        if cb == 0 and cc == 0:
            continue  # sparse-census convention (matches psi_drift)
        p_c = (cc + 1) / (tc + nb)
        p_b = (cb + 1) / (tb + nb)
        t = (p_c - p_b) * math.log(
            ((cc + 1) * (tb + nb)) / ((cb + 1) * (tc + nb))
        )
        tq += math.floor(t * grid)
    return round(tq / grid, 6)


def psi_against_baseline(
    df: DataFrame,
    baseline: DataFrame,
    key_col: str,
    val_col: str,
) -> DataFrame:
    """Batch PSI of ``df`` against a FROZEN :func:`psi_baseline` census
    (production drift-gate semantics: bins and reference counts fixed at
    training time — serving-side data outside [lo, hi] clamps into the
    edge bins). Fully in-plan (r13, VERDICT r12 #5 — the old form
    collected the (key, bin) census and assembled python dicts, a driver
    bottleneck for high-cardinality keys): ONE map-side-combined (key,
    bin) census over the data, a full-outer census-to-census join (keys x
    bins rows on both sides), per-key totals aggregated over the joined
    census and broadcast back, and psi_drift's exact integer-grid term
    math — bins empty on BOTH sides have no row on either side, which is
    precisely `_psi_from_counts`' sparse-skip convention, so the
    streaming twin still agrees bit-for-bit. Returns
    ``(key, n_current, psi)``; keys absent from the baseline are omitted
    (no reference to score against) — keys with no current rows emit
    ``n_current = 0`` scored against all-empty current bins."""
    params = F.broadcast(
        baseline.select("_lo", "_hi", "_n_bins").limit(1)
    )
    c = F.col(val_col).cast("double")
    lo, hi, nb = F.col("_lo"), F.col("_hi"), F.col("_n_bins")
    raw = F.floor((c - lo) * nb / (hi - lo))
    bin_id = (
        F.when(hi > lo, F.greatest(F.lit(0), F.least(nb - 1, raw)))
        .otherwise(F.lit(0))
        .cast("int")
    )
    cur = (
        df.filter(c.isNotNull())
        .crossJoin(params)
        .groupBy(F.col(key_col).alias("_ck"), bin_id.alias("_cbin"))
        .agg(F.count(F.lit(1)).alias("_n_cur"))
    )
    from ..session import tracked_cache

    # full-outer on (key, bin): a bin seen only at serve time scores with
    # baseline count 0, a baseline bin with no current rows scores with
    # current count 0 — then keep only keys the baseline knows (left-semi
    # against the baseline key list, broadcast: it is keys-sized).
    joined = tracked_cache(
        baseline.join(
            cur,
            F.col(key_col).eqNullSafe(F.col("_ck"))
            & (F.col("_bin") == F.col("_cbin")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col(key_col), F.col("_ck")).alias("_k"),
            F.coalesce("_n_base", F.lit(0)).alias("_cb"),
            F.coalesce("_n_cur", F.lit(0)).alias("_cc"),
        )
        .join(
            F.broadcast(baseline.select(F.col(key_col).alias("_bk")).distinct()),
            F.col("_k").eqNullSafe(F.col("_bk")),
            "left_semi",
        )
    )
    n_bins_lit = F.broadcast(baseline.agg(F.first("_n_bins").alias("_nb")))
    totals = (
        joined.groupBy("_k")
        .agg(F.sum("_cb").alias("_tb"), F.sum("_cc").alias("_tc"))
        .select(F.col("_k").alias("_k2"), "_tb", "_tc")
    )
    num = (F.col("_cc") + 1) * (F.col("_tb") + F.col("_nb"))
    den = (F.col("_cb") + 1) * (F.col("_tc") + F.col("_nb"))
    p_c = (F.col("_cc") + 1) / (F.col("_tc") + F.col("_nb"))
    p_b = (F.col("_cb") + 1) / (F.col("_tb") + F.col("_nb"))
    term = (p_c - p_b) * F.log(num.cast("double") / den.cast("double"))
    return (
        joined.join(F.broadcast(totals), F.col("_k").eqNullSafe(F.col("_k2")))
        .crossJoin(n_bins_lit)
        .select(
            F.col("_k").alias(key_col),
            "_tc",
            F.floor(term * F.lit(1_000_000.0)).cast("bigint").alias("_tq"),
        )
        .groupBy(key_col)
        .agg(
            F.first("_tc").cast("bigint").alias("n_current"),
            F.round(F.sum("_tq") / F.lit(1_000_000.0), 6).alias("psi"),
        )
    )


def mad_per_key(
    df: DataFrame,
    key_col: str,
    val_col: str,
) -> DataFrame:
    """Median absolute deviation per key ([ext] the ROBUST dispersion
    census — the building block of robust z-scores, next to the Tukey
    fences): ``(key, n_obs, median, mad)`` with
    ``mad = median(|x - median(x)|)`` — unlike stddev, one wild outlier
    cannot inflate the yardstick used to judge outliers.

    Plan: ONE (key)-keyed aggregate collects each key's sorted values
    (the exact-percentile memory profile — right for bounded-cardinality
    census keys); BOTH medians compute in-row from that single sorted
    array (deviations re-sort in-row — no second shuffle, no second
    scan).

    Determinism: medians use the explicit order-statistic interpolation
    (``v_lo + (v_hi - v_lo) * frac`` with h = 0.5*(n-1) — 0.5 is a
    binary fraction, the value_outliers lane: bit-exact cross-engine, NO
    grid); |x - m| of exact inputs is a single correctly-rounded IEEE op
    replayed identically by the oracle. Output rounds to 1e-6 as the
    standard emission convention. NULL values are excluded; empty keys
    do not appear."""
    c = F.col(val_col).cast("double")
    base = df.filter(c.isNotNull()).groupBy(key_col).agg(
        F.sort_array(F.collect_list(c)).alias("_xs")
    )

    def interp_median(arr):
        n = F.size(arr)
        h = (n.cast("double") - F.lit(1.0)) * F.lit(0.5)
        lo = F.floor(h).cast("int")
        frac = h - lo.cast("double")
        v_lo = F.element_at(arr, lo + 1)
        v_hi = F.element_at(arr, F.least(lo + 2, n))
        return v_lo + (v_hi - v_lo) * frac

    med = interp_median(F.col("_xs"))
    with_m = base.withColumn("_m", med).withColumn(
        "_devs",
        F.sort_array(
            F.transform(F.col("_xs"), lambda x: F.abs(x - F.col("_m")))
        ),
    )
    return with_m.select(
        key_col,
        F.size("_xs").cast("bigint").alias("n_obs"),
        F.round("_m", 6).alias("median"),
        F.round(interp_median(F.col("_devs")), 6).alias("mad"),
    )


def source_concentration(
    df: DataFrame,
    group_col: str,
    weight: Column,
) -> DataFrame:
    """Corpus-concentration census over ``group_col`` ([ext] the "is my
    training mix dominated by a few sources" audit run before fixing
    mixture weights): ONE row ``(n_groups, total, top_share, hhi, gini)``
    over the per-group totals of ``weight`` —
    top_share = largest group's fraction; HHI = sum of squared shares
    (the antitrust concentration index, 1/n_groups for uniform);
    Gini = (2*sum(i*x_i))/(n*sum(x)) - (n+1)/n over ascending-sorted
    totals (0 = uniform, ->1 = one group holds everything).

    Plan: one map-side-combined (group) aggregate over the fact table is
    the only full-data pass; the group-total table (|groups| rows)
    collapses through a second tiny aggregate whose sorted-fold
    statistics compute in-row. The plain sums (group totals, grand
    total) stay exact integers; the SQUARED/index-weighted folds and the
    ratio denominators compute in DOUBLE (ADVICE r09: ``x*x`` and
    ``tot*tot`` in int64 overflow once total weight passes ~3e9 — a
    100 TB corpus holds ~1e13 tokens). At test scale every partial stays
    under 2^53, so the double folds are still exact integers and
    cross-engine bit-equal; at 100 TB the 1e-6 rounding absorbs the
    ~1e-16·n relative double error."""
    totals = df.groupBy(group_col).agg(
        F.sum(weight).cast("bigint").alias("_w")
    )
    one = totals.agg(F.sort_array(F.collect_list("_w")).alias("_ws"))
    n = F.size("_ws").cast("bigint")
    tot = F.aggregate(F.col("_ws"), F.lit(0).cast("bigint"), lambda a, x: a + x)
    # sum of i * x_i (1-indexed over the ascending sort), double fold
    iweighted = F.aggregate(
        F.zip_with(
            F.col("_ws"),
            F.sequence(F.lit(1).cast("bigint"), n),
            lambda x, i: x.cast("double") * i.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    hhi = F.aggregate(
        F.col("_ws"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return one.select(
        n.alias("n_groups"),
        tot.alias("total"),
        F.round(
            F.element_at("_ws", -1).cast("double") / tot.cast("double"), 6
        ).alias("top_share"),
        F.round(
            hhi / (tot.cast("double") * tot.cast("double")), 6
        ).alias("hhi"),
        F.round(
            F.lit(2.0) * iweighted
            / (n.cast("double") * tot.cast("double"))
            - (n + 1).cast("double") / n.cast("double"),
            6,
        ).alias("gini"),
    )


def ks_drift(
    df: DataFrame,
    key_col: str,
    val_col: str,
    baseline_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per key ([ext] the
    nonparametric sibling of `psi_drift`: PSI needs a bin grid and a
    smoothing constant, KS needs NEITHER — D = sup_x |F_base(x) -
    F_cur(x)| over the empirical CDFs, the classic "did this feature's
    distribution move" test that is invariant to monotone rescaling and
    sensitive anywhere in the distribution, not just where bins are).
    Splits rows by the boolean ``baseline_col`` and returns
    ``(key, n_baseline, n_current, ks_d)``; keys with either side empty
    emit NULL ks_d (the statistic is undefined).

    Exactness lane: both ECDFs are step functions that jump only at
    observed values, so D is attained at a pooled distinct value.
    Over the (key, value) census with per-side counts, the statistic is
    ``max |cumB*nC - cumC*nB| / (nB*nC)`` — the numerator is EXACT
    128-bit integer arithmetic (DECIMAL(38,0) here, HUGEINT in the
    oracle; int64 would overflow at nB*nC > 2^63, i.e. ~3e9 rows per
    side — real at 100 TB), the max compares exact integers (no
    floating-point tie hazard), and only the FINAL division is a
    double — one exact-integer ratio, rounded 1e-6 (the
    source_concentration discipline).

    Plan: ONE map-side-combined (key, value) census is the only
    full-data pass; totals and running sums are two window passes OVER
    THE CENSUS sharing one hash partitioning on ``key`` (distinct
    values per key, never corpus rows twice); the max is a tiny per-key
    aggregate. At 100 TB a skewed key's distinct-value census row count
    bounds the window partition, not its row count.

    NULL ``val_col`` rows are excluded HERE (ADVICE r10): a NULL value
    has no position on the real line, yet it would form a census row
    that counts toward n_* and ranks as the extreme value — and Spark
    orders NULLs first ascending while DuckDB defaults NULLS LAST, so
    the cumulative windows would diverge cross-engine. Oracle contract:
    mirror ``WHERE v IS NOT NULL`` (the winsorized_mean_per_key
    convention, now uniform across the drift/AB panel)."""
    df = df.filter(F.col(val_col).isNotNull())
    census = df.groupBy(key_col, F.col(val_col).alias("_v")).agg(
        F.sum(F.when(F.col(baseline_col), 1).otherwise(0)).alias("_cb"),
        F.sum(F.when(F.col(baseline_col), 0).otherwise(1)).alias("_cc"),
    )
    w_all = Window.partitionBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(19,0)"
    num = F.abs(
        F.sum("_cb").over(w_cum).cast(dec) * F.sum("_cc").over(w_all).cast(dec)
        - F.sum("_cc").over(w_cum).cast(dec) * F.sum("_cb").over(w_all).cast(dec)
    )
    stepped = census.select(
        key_col,
        F.sum("_cb").over(w_all).alias("_nb"),
        F.sum("_cc").over(w_all).alias("_nc"),
        num.alias("_num"),
    )
    out = stepped.groupBy(key_col).agg(
        F.min("_nb").cast("bigint").alias("n_baseline"),
        F.min("_nc").cast("bigint").alias("n_current"),
        F.max("_num").alias("_d"),
    )
    return out.select(
        key_col,
        "n_baseline",
        "n_current",
        F.round(
            F.when(
                (F.col("n_baseline") > 0) & (F.col("n_current") > 0),
                F.col("_d").cast("double")
                / (
                    F.col("n_baseline").cast("double")
                    * F.col("n_current").cast("double")
                ),
            ),
            6,
        ).alias("ks_d"),
    )


def mann_whitney_u(
    df: DataFrame,
    key_col: str,
    val_col: str,
    baseline_col: str,
) -> DataFrame:
    """Mann–Whitney U rank-sum test per key ([ext] the nonparametric
    two-sample location test beside `welch_ttest` — no normality
    assumption, robust to outliers — completing the drift/AB panel:
    PSI (binned mass), KS (sup-CDF), Welch (means), MWU (ranks)).
    Splits rows by the boolean ``baseline_col`` and returns
    ``(key, n_baseline, n_current, u_current, z)`` where ``u_current``
    counts (current, baseline) pairs with current > baseline (ties
    half) and ``z`` is the tie-corrected normal approximation
    ``(U - nb*nc/2) / sqrt(nb*nc/12 * (N+1 - T/(N(N-1))))`` with
    ``T = sum(t^3 - t)`` over tie groups. Keys with either side empty
    (or zero pooled variance — all values tied) emit NULL z.

    Exactness lane: average ranks over a (key, value) census are
    half-integers, so the plan carries DOUBLED ranks — ``rank2 =
    2*cum_before + cnt + 1`` — which are EXACT integers; the doubled
    rank-sum, ``U2 = 2*U``, and the z numerator ``U2 - nb*nc`` stay
    integers end-to-end (bigint here: |numerator| <= nb*nc < 2^63 up to
    ~3e9 rows per side; the KS decimal lane is the overflow escape
    hatch). The variance term computes from exact integers in double
    (< 2^53 at any plausible per-key cardinality) and ``sqrt`` is
    IEEE-correctly-rounded — identical in both engines — so ``z``
    rounds the same 1e-6 both sides.

    Plan: identical shape to `ks_drift` — ONE map-side-combined
    (key, value) census, totals + cumulative window sharing one hash
    partitioning on the key, one tiny per-key aggregate. NULL
    ``val_col`` rows are excluded here, like `ks_drift` (ADVICE r10):
    NULLs have no rank, and Spark/DuckDB disagree on NULL sort position,
    so an unfiltered census would diverge cross-engine. Oracle contract:
    mirror ``WHERE v IS NOT NULL``."""
    df = df.filter(F.col(val_col).isNotNull())
    census = df.groupBy(key_col, F.col(val_col).alias("_v")).agg(
        F.sum(F.when(F.col(baseline_col), 1).otherwise(0)).alias("_cb"),
        F.sum(F.when(F.col(baseline_col), 0).otherwise(1)).alias("_cc"),
    )
    w_all = Window.partitionBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.col("_cb") + F.col("_cc")
    rank2 = (
        F.lit(2) * F.coalesce(F.sum(F.col("_cb") + F.col("_cc")).over(w_prev), F.lit(0))
        + cnt
        + F.lit(1)
    )
    stepped = census.select(
        key_col,
        F.sum("_cb").over(w_all).alias("_nb"),
        F.sum("_cc").over(w_all).alias("_nc"),
        (F.col("_cc") * rank2).alias("_r2c"),
        (cnt * cnt * cnt - cnt).alias("_t3"),
    )
    agg = stepped.groupBy(key_col).agg(
        F.min("_nb").cast("bigint").alias("n_baseline"),
        F.min("_nc").cast("bigint").alias("n_current"),
        F.sum("_r2c").cast("bigint").alias("_r2"),
        F.sum("_t3").cast("bigint").alias("_t"),
    )
    nb = F.col("n_baseline")
    nc = F.col("n_current")
    n = nb + nc
    u2 = F.col("_r2") - nc * (nc + F.lit(1))  # doubled U_current, exact int
    num2 = u2 - nb * nc  # doubled (U - mean), exact int
    var = (
        nb.cast("double")
        * nc.cast("double")
        / F.lit(12.0)
        * (
            (n + 1).cast("double")
            - F.col("_t").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    return agg.select(
        key_col,
        "n_baseline",
        "n_current",
        (u2.cast("double") / F.lit(2.0)).alias("u_current"),
        F.round(
            F.when(
                (nb > 0) & (nc > 0) & (var > 0),
                num2.cast("double") / (F.lit(2.0) * F.sqrt(var)),
            ),
            6,
        ).alias("z"),
    )


def winsorized_mean_per_key(
    df: DataFrame,
    key_col: str,
    val_col: str,
) -> DataFrame:
    """IQR-winsorized mean per key ([ext] the robust location estimate
    completing the robust-stats family — `mad_per_key` is the robust
    SCALE, the Tukey fences the outlier CENSUS, this is the outlier-
    immune MEAN: every value is clamped to the [Q1, Q3] quartile band
    before averaging, so a fat tail moves the estimate by at most the
    band edge instead of its full magnitude (Winsor's principle, the
    standard robust aggregate for telemetry with occasional garbage).
    Returns ``(key, n_values, q1, q3, mean_raw, mean_winsorized)``.

    Determinism lanes: quartiles interpolate in-row from ONE sorted
    collected array on the exact order-statistic lane (h = q·(n−1) with
    q a binary fraction — bit-exact cross-engine, NO grid; the
    mad_per_key discipline); both means are in-row LEFT FOLDS over that
    same sorted array (the EWMA fold-replay lane: an identical IEEE
    addition sequence on both engines is bit-exact, where a distributed
    double sum is not), divided once and rounded 1e-6.

    Scale shape: ONE key aggregate collects each key's sorted values —
    the exact-percentile memory profile (a key's values must fit an
    executor; the documented trade of every exact-order-statistic op
    here) — and everything after computes in-row; no second shuffle."""
    base = df.filter(F.col(val_col).isNotNull()).groupBy(key_col).agg(
        F.sort_array(F.collect_list(F.col(val_col).cast("double"))).alias(
            "_xs"
        )
    )

    def interp(arr, q):
        n = F.size(arr)
        h = (n.cast("double") - F.lit(1.0)) * F.lit(q)
        lo = F.floor(h).cast("int")
        frac = h - lo.cast("double")
        v_lo = F.element_at(arr, lo + 1)
        v_hi = F.element_at(arr, F.least(lo + 2, n))
        return v_lo + (v_hi - v_lo) * frac

    q1 = interp(F.col("_xs"), 0.25)
    q3 = interp(F.col("_xs"), 0.75)
    fold_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda a, x: a + x
    )
    w = base.withColumn("_q1", q1).withColumn("_q3", q3)
    wmean = fold_sum(
        F.transform(
            F.col("_xs"),
            lambda x: F.least(F.greatest(x, F.col("_q1")), F.col("_q3")),
        )
    ) / F.size("_xs").cast("double")
    rmean = fold_sum(F.col("_xs")) / F.size("_xs").cast("double")
    return w.select(
        key_col,
        F.size("_xs").cast("bigint").alias("n_values"),
        F.round("_q1", 6).alias("q1"),
        F.round("_q3", 6).alias("q3"),
        F.round(rmean, 6).alias("mean_raw"),
        F.round(wmean, 6).alias("mean_winsorized"),
    )
