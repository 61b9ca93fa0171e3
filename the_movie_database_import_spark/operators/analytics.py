"""Event-sequence analytics: funnel conversion, cohort retention, and
SCD2 interval history ([ext] product-analytics / warehouse operators over
the `events` stream table).

These are the two classic event-log rollups every analytics engine ships
(funnel: how many users progressed view -> click -> purchase in timestamp
order; retention: of the users whose first activity fell on day D, how many
came back on day D+k). The reference pipeline (`loader.py`) has no event
log at all — both operators belong to the north-star extension set, using
the driver-generated `events` table.

Scale design: both operators are ONE user-keyed shuffle wide.

- ``funnel_counts`` never self-joins the event log per stage (the textbook
  k-stage formulation is k joins = k shuffles and re-reads): it collects
  each user's stage-relevant events into an in-row array (bounded by that
  user's own activity, the same per-key envelope every sessionizer
  assumes), sorts it in-row, and walks it with ``F.aggregate`` — a
  whole-stage-codegen fold, no Python. The follow-up rollup aggregates a
  one-int-per-user frame.
- ``retention_cohorts`` folds the classic two-pass (first-day agg + join
  back to the raw log) into one pass: per user, MIN(day) and the DISTINCT
  day set come out of the same hash aggregate, and the explode that
  follows emits at most one row per (user, active day) — already
  user-deduped, so the final census is a plain COUNT, not a
  COUNT(DISTINCT) re-shuffle of raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: for each prefix of ``stages``, the number of
    users with events of those types at STRICTLY INCREASING timestamps
    (the standard product-analytics conversion funnel). Returns one row
    per stage — ``(stage_idx, stage, n_users)`` — including zero-count
    stages, with ``n_users`` non-increasing in ``stage_idx``.

    Semantics: a user reaches stage k+1 iff after the EARLIEST qualifying
    completion of stage k there is a stage-(k+1) event with ``ts`` strictly
    greater. Greedy-earliest is optimal here (taking the earliest
    qualifying event at each stage can only widen what remains reachable),
    so the in-row fold below computes exactly the classic chained
    ``MIN(ts) > prev`` SQL — the registered oracle replays that chain.
    Events with NULL timestamps are excluded (they cannot be ordered);
    ``stages`` must not repeat a type (one event advances at most one
    stage).

    One shuffle on the user key: events are pre-filtered to the stage
    types (a scan-level IN filter), collected per user, ``array_sort``-ed
    in-row (ties on identical timestamps break by type name; tie order
    cannot change how FAR a user progresses because progression demands
    strictly increasing ts), and folded JVM-side. The per-user rollup that
    follows shuffles one int per user, and the final stage census is
    ``len(stages)`` rows joined against a literal stage table.
    """
    stages = list(stages)
    if len(set(stages)) != len(stages):
        raise ValueError(f"funnel stages must be distinct, got {stages}")
    n = len(stages)
    stage_arr = F.array(*[F.lit(s) for s in stages])

    per_user = (
        events.filter(F.col(type_col).isin(stages) & F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
                )
            ).alias("evs")
        )
    )

    # the init NULL takes the ts column's OWN type (TIMESTAMP_NTZ from
    # load_table in either parquet encoding, TIMESTAMP for synthetic
    # frames) — no implicit NTZ/LTZ unification inside the fold's when()
    init = F.struct(
        F.lit(0).alias("reached"),
        F.lit(None).cast(events.schema[ts_col].dataType).alias("last_ts"),
    )

    def step(acc, ev):
        advance = (
            (acc["reached"] < F.lit(n))
            & (ev["et"] == F.element_at(stage_arr, acc["reached"] + 1))
            & ((acc["reached"] == 0) | (ev["ts"] > acc["last_ts"]))
        )
        return F.when(
            advance,
            F.struct(
                (acc["reached"] + 1).alias("reached"), ev["ts"].alias("last_ts")
            ),
        ).otherwise(acc)

    reached = per_user.select(
        F.aggregate("evs", init, step).getField("reached").alias("reached")
    )
    counts = (
        reached.filter(F.col("reached") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("reached"))).alias("_idx"))
        .groupBy("_idx")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    spark = events.sparkSession
    stage_table = spark.range(1).select(
        F.posexplode(stage_arr).alias("_pos", "stage")
    )
    return (
        stage_table.join(
            F.broadcast(counts), stage_table["_pos"] + 1 == counts["_idx"], "left"
        )
        .select(
            (F.col("_pos") + 1).cast("long").alias("stage_idx"),
            F.col("stage"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention matrix: users are cohorted by the calendar day
    of their FIRST event, and each (cohort_day, offset_days) cell counts
    the distinct users of that cohort active ``offset_days`` days later —
    the table behind every retention curve. ``offset_days = 0`` rows give
    cohort sizes; cells with no returning users are absent (sparse form).

    One user-keyed shuffle: ``MIN(day)`` and ``collect_set(day)`` come out
    of the same per-user hash aggregate (the set is bounded by the span of
    the log in days, not by event count — the map-side combine collapses
    each user's repeat visits within a day before anything shuffles). The
    explode emits one row per (user, active day) — already distinct — so
    the final census is a plain map-side-combinable COUNT on (cohort_day,
    offset_days), never a COUNT(DISTINCT) over raw events.
    """
    day = F.to_date(F.col(ts_col))
    per_user = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.min(day).alias("cohort_day"),
            F.collect_set(day).alias("_days"),
        )
    )
    return (
        per_user.select("cohort_day", F.explode("_days").alias("_day"))
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse an append-only
    attribute log into validity intervals — one row per (key, consecutive
    value run) with ``valid_from`` / ``valid_to`` (NULL = still current),
    a per-key ``version`` counter, and ``is_current`` — the standard
    warehouse structure for "what was this entity's value at time T"
    (answerable with ``valid_from <= T AND (valid_to IS NULL OR T <
    valid_to)``).

    ONE key-partitioned shuffle: the change-point filter (``lag`` over
    (ts, tiebreak) order) and the interval builder (``lead`` +
    ``row_number`` over the filtered rows) use the SAME partitioning and
    sort order, so Catalyst plans a single window exchange and the filter
    runs between the two window stages without re-shuffling (pinned in
    tests/test_plans.py). Per-key window width is bounded by that
    entity's own change count — the same per-key envelope every
    sessionizer assumes; entity keys are many and fine-grained, so the
    shuffle spreads. NULL timestamps are excluded (unorderable); the
    tiebreak column makes the order total and both engines deterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev")))
    )
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def as_at(history: DataFrame, at, ts_fmt: str | None = None) -> DataFrame:
    """Point-in-time view over an SCD2 history (:func:`scd2_history`
    output): the rows whose validity interval covers ``at`` —
    ``valid_from <= at AND (valid_to IS NULL OR at < valid_to)``. A pure
    scan-side filter (zero shuffle); at most one row per key by the
    non-overlapping-interval invariant (tested)."""
    at_lit = F.lit(at) if ts_fmt is None else F.to_timestamp(F.lit(at), ts_fmt)
    return history.filter(
        (F.col("valid_from") <= at_lit)
        & (F.col("valid_to").isNull() | (at_lit < F.col("valid_to")))
    )


def _epoch_us(df: DataFrame, ts_col: str) -> "F.Column":
    """Microseconds-since-epoch for a timestamp column, ADAPTIVE to the
    round's on-disk encoding (the testdata's ``events.ts`` flips between
    TIMESTAMP and TIMESTAMP_NTZ across generations). For NTZ the anchor is
    a NTZ epoch literal via ``timestampdiff`` — timezone-INDEPENDENT, so it
    equals DuckDB's ``epoch_us`` of the same naive value on any host (a
    plain ``cast('timestamp')`` would reinterpret in the session zone)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            f" `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based batch sessionization: split each user's event stream into
    sessions wherever the idle gap exceeds ``gap_seconds``, and return one
    summary row per session — ``(user, session_idx, session_start,
    session_end, n_events, duration_secs[, total_value])``. This is the
    batch twin of ``streaming/windows.stream_session_window`` (Spark's
    ``session_window`` with the same gap), and the building block under
    every engagement / dwell-time metric.

    Session membership depends only on the per-user SORTED timestamp
    sequence (ties share a zero gap, so the ``tiebreak_col`` order never
    changes which session an event lands in — it only makes the ``lag``
    deterministic for the engines' intermediate rows). Gap comparison is
    integer microsecond arithmetic (:func:`_epoch_us`, adaptive to the
    round's timestamp encoding), strict inequality:
    a gap of exactly ``gap_seconds`` stays in-session, matching Spark's
    ``session_window`` close-at ``start + gap`` exclusive semantics.

    Scale design — ONE user-keyed shuffle end to end:

    1. ``lag`` (boundary flag) and the running ``SUM`` that numbers
       sessions use the SAME ``(user) x (ts, tiebreak)`` window spec, so
       Catalyst plans a single window Exchange (pinned in
       tests/test_plans.py, same shape as ``scd2_history``).
    2. the per-session rollup groups on ``(user, session_idx)`` — a
       superset of the window's hash keys, so EnsureRequirements reuses
       the existing partitioning: NO second Exchange.
    3. per-user window width is bounded by that user's own activity (the
       standard sessionizer envelope); user keys are many and fine-
       grained, so the shuffle spreads. A single pathological user is a
       window-skew risk at 100 TB — shard such keys upstream by (user,
       coarse time bucket) if one key's log outgrows an executor.

    NULL timestamps are unorderable and excluded, exactly as
    ``scd2_history`` does.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = _epoch_us(events, ts_col)
    gap_us = int(gap_seconds) * 1_000_000
    flagged = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn(
            "_new_session",
            F.when(
                F.lag(us).over(w).isNull()
                | ((us - F.lag(us).over(w)) > F.lit(gap_us)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_idx", F.sum("_new_session").over(w))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000))
        .cast("double")
        .alias("duration_secs"),
    ]
    if value_col is not None:
        # decimal-lane sum (exact, order-independent), as every engine
        # query summing the double `value` column does.
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(9,2)"))
            .cast("double")
            .alias("total_value")
        )
    return flagged.groupBy(F.col(user_col), F.col("session_idx")).agg(*aggs)


def resample_daily_ffill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user daily resample with forward fill: densify each user's
    event stream onto a contiguous daily grid (their first active day to
    their last) and emit, per ``(user, day)``: the count and exact sum of
    that day's events (0 on gap days) and ``value_ffill`` — the most
    recent NON-NULL observation carried forward across gaps. This is the
    classic time-series feature-engineering step (pandas
    ``resample('D').last().ffill()``) that turns a sparse log into the
    dense per-day panel a trainer or dashboard consumes.

    Determinism: the per-day observation is the value of the lexicographic
    max ``(epoch_us, tiebreak)`` struct among that day's non-null values —
    a MAX aggregate, never a window over raw events — so it is
    reproducible under any partitioning and replays exactly in the oracle.
    Days before a user's first non-null observation stay NULL (nothing to
    carry). Day sums run in the exact decimal lane.

    Scale design: the RAW LOG pays exactly one shuffle AND one scan — the
    ``(user, day)`` aggregate (map-side combined; skew-proof: a key is one
    user-day) is ``tracked_cache``'d because TWO consumers read it (the
    span aggregate and the grid join's probe side) and its upstream is the
    expensive full-log pass, not just scan+filter (plan-pinned: two
    InMemoryTableScans, one parquet scan). Everything after runs on the
    daily panel, which is smaller than the log by the events-per-user-day
    factor: the span aggregate and the forward-fill window re-key it by
    user, and the grid explode is bounded by each user's active span in
    days. A multi-year span per user is ~O(10^3) grid rows — never
    explosive. The grid-daily join is left un-hinted: at test SF the
    panel broadcasts, at 100 TB AQE picks a co-keyed (user, day) shuffle
    join — both correct. NULL timestamps are unorderable and excluded, as
    in :func:`sessionize`.
    """
    from ..session import tracked_cache
    us = _epoch_us(events, ts_col)
    day = F.to_date(F.col(ts_col))
    daily = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col), day.alias("day"))
        .agg(
            F.max(
                F.when(
                    F.col(value_col).isNotNull(),
                    F.struct(
                        us.alias("u"),
                        F.col(tiebreak_col).alias("t"),
                        F.col(value_col).alias("v"),
                    ),
                )
            )["v"].alias("_obs_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(9,2)"))
            .cast("double")
            .alias("day_value"),
        )
    )
    daily = tracked_cache(daily)
    spans = daily.groupBy(user_col).agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    grid = spans.select(
        user_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, [user_col, "day"], "left").select(
        F.col(user_col),
        F.col("day"),
        F.last("_obs_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("day_value"), F.lit(0.0)).alias("day_value"),
    )


def ewma_per_key(
    events: DataFrame,
    alpha: float = 0.25,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Exponentially weighted moving average per key: fold each key's
    time-ordered value stream through ``s' = α·x + (1-α)·s`` (seeded with
    the first observation) and emit the FINAL smoothed level — the
    classic recency-weighted state under rate limiting, trend detection,
    and per-entity health scores. A recurrence is inherently sequential,
    so it cannot be a distributed aggregate; the engine shape is:

    1. ONE key-shuffle collects each key's (ts, tiebreak, value) structs;
       ``array_sort`` makes the order total and deterministic.
    2. the fold runs IN-ROW (``F.aggregate`` — whole-stage codegen): a
       strict left fold in sorted order, which the oracle replays with
       DuckDB's ``list_reduce`` over the same ordered list — identical
       IEEE operation sequence, so the result is bit-exact with NO grid
       when ``alpha`` is a binary fraction (0.25 default; pass e.g. 0.1
       and you owe the caller a quantized comparison instead).

    Per-key state is the key's own history (the funnel/sessionize
    envelope: bounded by per-entity activity, not corpus size); a single
    pathological key wants upstream sharding by coarse time bucket, at
    the cost of restarting the recurrence per shard. NULL timestamps and
    NULL values carry no information for the recurrence and are excluded.
    """
    us = _epoch_us(events, ts_col)
    a, one_m = F.lit(float(alpha)), F.lit(1.0 - float(alpha))
    ordered = (
        events.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            us.alias("u"),
                            F.col(tiebreak_col).alias("t"),
                            F.col(value_col).alias("v"),
                        )
                    )
                ),
                lambda s: s["v"],
            ).alias("_vs")
        )
    )
    n = F.size("_vs")
    return ordered.select(
        key_col,
        n.cast("bigint").alias("n_obs"),
        F.aggregate(
            F.slice("_vs", 2, n - 1),
            F.element_at("_vs", 1),
            lambda acc, x: a * x + one_m * acc,
        ).alias("ewma"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition census over per-key event streams:
    ``(prev_type, event_type, n_transitions, p_transition)`` — for every
    ordered pair of consecutive events within one key, how often does
    ``prev_type`` hand off to ``event_type``, and with what conditional
    probability. This is the "what do users do next" matrix behind
    next-action prediction, broken-flow detection (a transition whose p
    collapses release-over-release), and bot screening (near-
    deterministic rows in a matrix that should be diffuse).

    Engine shape — ONE data-scale shuffle, then constant-size math:

    1. `lag(type)` over the key-partitioned (ts, tiebreak) window pairs
       each event with its predecessor — the same single user-keyed
       exchange every sequential operator here rides (sessionize, EWMA,
       funnel). Each key's first event has no predecessor and drops.
    2. the pair census groups by (prev_type, type) — cardinality
       |types|^2, so the second aggregate's shuffle is constant-size
       regardless of corpus scale (map-side combine collapses each
       partition to at most |types|^2 rows before the exchange).
    3. row-normalization to conditional probabilities is a window over
       the |types|^2-row census — negligible.

    NULL timestamps are excluded up front (no order to stand in); a
    deterministic ``tiebreak_col`` keeps lag() reproducible under equal
    timestamps on any engine.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(type_col).alias("event_type"),
            F.lag(type_col).over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    census = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_prev = Window.partitionBy("prev_type")
    return census.select(
        "prev_type",
        "event_type",
        "n_transitions",
        (
            F.col("n_transitions")
            / F.sum("n_transitions").over(per_prev)
        ).alias("p_transition"),
    )


def attribution_last_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch attribution census: every ``conversion_type`` event is
    credited to the nearest strictly-preceding NON-conversion event of
    the same key; returns ``(touch_type, n_conversions, total_value)``
    with conversions that have no prior touch credited to the literal
    ``'(none)'`` bucket (organic/direct). The marketing-analytics
    classic — which upstream action "closes", and how much converted
    value rides each channel.

    Engine shape: ONE key-partitioned window in (ts, tiebreak) order
    computes ``last(non-conversion type, ignorenulls)`` over the
    unbounded-preceding .. 1-preceding frame — carrying the latest touch
    forward to each conversion row in a single pass, with NO self-join
    of the event log against itself (the textbook correlated-subquery
    formulation is a per-conversion range scan; this is the same
    last-value-carry-forward plan as `resample_daily_ffill`). The
    census that follows groups by touch_type — cardinality |types|, so
    everything after the one exchange is constant-size.

    Conversion events themselves never act as touches (a purchase does
    not attribute the next purchase); NULL timestamps are excluded.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion_type, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    conv = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col),
            F.col(value_col),
            touch.alias("_touch"),
        )
        .filter(F.col(type_col) == conversion_type)
    )
    return conv.groupBy(
        F.coalesce(F.col("_touch"), F.lit("(none)")).alias("touch_type")
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum(value_col).alias("total_value"),
    )


def rolling_distinct_hll(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int = 14,
) -> DataFrame:
    """Trailing N-day distinct-entity estimates via HyperLogLog sketch
    MERGE — the W-DAU/MAU panel ("distinct users in the last 7 days, per
    day") that is the canonical reason sketches exist at scale: exact
    trailing distincts need every (day, id) pair re-deduplicated per
    window position (N re-scans of raw data, or an N-fold explode),
    while HLL sketches are MERGEABLE — union of two days' sketches IS
    the sketch of the union — so raw data is touched exactly once.
    Returns ``(day, users_1d, users_{N}d)`` with both columns HLL
    ESTIMATES (Datasketches HLL_4; relative error ~1.04/sqrt(2^lg_k),
    ~0.8% at the default lg_config_k=14).

    Engine shape:

    1. ONE day-keyed aggregate folds raw events into per-day sketches
       (`hll_sketch_agg` is map-side combinable: each input partition
       contributes one partial sketch per day, the shuffle carries
       KB-sized sketch blobs, never ids);
    2. the trailing union is a RANGE window over the per-day sketch
       table — cardinality = #days, negligible at any corpus scale. The
       window is deliberately UNPARTITIONED (a global day order): its
       input is the bounded census, not the data. `hll_union_agg` runs
       as the window aggregate; the estimate is a separate projection
       (Spark rejects nesting the estimate over the window expression).

    No oracle: sketch internals differ across engines, so the registry
    entry is rows-only; the ERROR is pinned instead
    (tests/test_stats.py::test_rolling_distinct_tracks_exact) against
    the exact trailing distinct at test SF — the
    q_agg_approx_count_distinct evidence pattern.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(day)
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_config_k)).alias("_sk"))
    )
    w = (
        Window.orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-(window_days - 1), 0)
    )
    rolled = daily.select(
        "day",
        F.col("_sk"),
        F.hll_union_agg("_sk").over(w).alias("_u"),
    )
    return rolled.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.hll_sketch_estimate("_sk").alias("users_1d"),
        F.hll_sketch_estimate("_u").alias(f"users_{window_days}d"),
    )


def conversion_latency(
    events: DataFrame,
    from_type: str = "view",
    to_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert census: per user, the latency from the FIRST
    ``from_type`` event to the first ``to_type`` event at a strictly
    later timestamp; output is one row of exact interpolated quartiles
    over all converting users — ``(n_converted, p25_secs, median_secs,
    p75_secs)``. The "how long does the funnel take" number that
    `funnel_counts` (how many) deliberately doesn't answer.

    Engine shape: ONE user-keyed exchange — the first-``from_type``
    timestamp is an IGNORE-NULLS conditional MIN over the user's full
    frame (window), conversions filter against it in the same stage,
    and the per-user minimum collapses in an aggregate that reuses the
    window's partitioning. The global quartile collect is over ONE ROW
    PER CONVERTING USER (entity-bounded, not event-bounded — the same
    envelope as retention), interpolated with the exact order-statistic
    tree (bit-identical cross-engine, no grid; seconds = µs/1e6, one
    exact-input division per order statistic).

    Users who never emit ``from_type``, or whose ``to_type`` events all
    precede it, simply don't convert — absent, not NULL.
    """
    us = _epoch_us(events, ts_col)
    w = Window.partitionBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    first_from = F.min(
        F.when(F.col(type_col) == from_type, us)
    ).over(w)
    lat = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col),
            F.col(type_col),
            us.alias("_us"),
            first_from.alias("_ff"),
        )
        .filter(
            (F.col(type_col) == to_type)
            & F.col("_ff").isNotNull()
            & (F.col("_us") > F.col("_ff"))
        )
        .groupBy(key_col)
        .agg(F.min(F.col("_us") - F.col("_ff")).alias("_lat_us"))
        .select((F.col("_lat_us").cast("double") / F.lit(1e6)).alias("_l"))
    )
    g = lat.agg(
        F.sort_array(F.collect_list("_l")).alias("_ls"),
        F.count(F.lit(1)).alias("n_converted"),
    )

    def interp(q: float) -> Column:
        h = F.lit(q) * (F.col("n_converted") - 1).cast("double")
        lo = F.floor(h)
        v_lo = F.element_at("_ls", (lo + 1).cast("int"))
        v_hi = F.element_at(
            "_ls", F.least(lo + 2, F.col("n_converted")).cast("int")
        )
        return v_lo + (v_hi - v_lo) * (h - F.floor(h))

    # zero-converter guard: with n = 0 the interpolation index would be
    # element_at(.., 0) — an ANSI error, where the statistics answer is
    # NULL (an empty census row, not a crash)
    def safe(q: float):
        return F.when(F.col("n_converted") > 0, interp(q))

    return g.select(
        F.col("n_converted").cast("bigint").alias("n_converted"),
        safe(0.25).alias("p25_secs"),
        safe(0.5).alias("median_secs"),
        safe(0.75).alias("p75_secs"),
    )


def interpolate_linear(
    panel: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "y_interp",
) -> DataFrame:
    """Linear gap interpolation on a per-key panel — the distributed
    pandas ``interpolate('linear')``: every NULL ``y_col`` between two
    observations fills with the straight line through its nearest
    non-null neighbors in ``x_col`` order; leading/trailing NULLs stay
    NULL (no extrapolation — interpolation invents values BETWEEN
    evidence, never beyond it). The companion to forward fill
    (`resample_daily_ffill`) for metrics where a step function lies
    (levels that drift between samples: temperature, balances, rates).

    ``x_col`` must be NUMERIC (day index, epoch) — the fill weight is
    (x - px) / (nx - px), so x defines distance, not just order. The
    result is an exact IEEE expression tree over exact neighbor values
    and integer-derived distances — bit-identical cross-engine, NO
    grid (the value_outliers lane: +, -, *, / in the same order).

    Engine shape: both neighbor lookups (last non-null observation at
    or before, first at or after) are IGNORE-NULLS struct windows over
    the SAME partition + order — Catalyst plans ONE key exchange and
    one sort for the pair (frames differ, spec doesn't; plan-pinned).
    A row with an observation passes through untouched (coalesce
    short-circuits), so the fill touches only gap rows.
    """
    w = Window.partitionBy(key_col).orderBy(x_col)
    obs = F.when(
        F.col(y_col).isNotNull(),
        F.struct(F.col(x_col).alias("x"), F.col(y_col).alias("y")),
    )
    prev = F.last(obs, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.first(obs, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    frac = (F.col(x_col) - prev["x"]).cast("double") / (
        nxt["x"] - prev["x"]
    ).cast("double")
    return panel.withColumn(
        out_col,
        F.coalesce(
            F.col(y_col),
            prev["y"] + (nxt["y"] - prev["y"]) * frac,
        ),
    )


def attribution_linear(
    events: DataFrame,
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """LINEAR (equal-split) multi-touch attribution census — the
    fairness-motivated counterpart of :func:`attribution_last_touch`:
    each conversion's value splits EQUALLY across every non-conversion
    touch that preceded it in the same key's stream (each touch
    OCCURRENCE earns one share, so a channel touched twice earns two
    shares of that conversion). Conversions with no prior touch credit
    ``'(none)'`` in full. Returns ``(touch_type, n_conversions_touched,
    credited_value)``; n_conversions_touched counts conversions that
    credited the type at least once.

    Engine shape: ONE key-keyed window builds each conversion's
    prior-touch multiset as an in-row ``collect_list`` over the
    unbounded-preceding .. 1-preceding frame (bounded by the key's own
    history — the funnel/sessionize per-entity envelope). The share
    (value / multiset size) and a per-type FIRST-OCCURRENCE flag both
    compute in-row (``array_position(t, x) == position`` marks the
    first copy), so ONE explode feeds ONE census aggregate — no second
    pass, no join, no distinct shuffle for the conversion count.
    Equal-split shares are one IEEE division replayed identically by
    the oracle; the census SUM rounds on both sides (float-sum
    accumulation order differs across engines).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touches = F.collect_list(
        F.when(F.col(type_col) != conversion_type, F.col(type_col))
    ).over(w)
    conv = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(type_col), F.col(value_col), touches.alias("_raw"))
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(value_col),
            F.when(F.size("_raw") > 0, F.col("_raw"))
            .otherwise(F.array(F.lit("(none)")))
            .alias("_t"),
        )
    )
    # per element: (type, share, is_first_occurrence_in_this_conversion)
    credits = conv.select(
        F.explode(
            F.transform(
                F.col("_t"),
                lambda x, i: F.struct(
                    x.alias("touch_type"),
                    (F.col(value_col) / F.size("_t")).alias("share"),
                    (F.array_position(F.col("_t"), x) == i + 1)
                    .cast("bigint")
                    .alias("first"),
                ),
            )
        ).alias("_c")
    )
    return credits.groupBy(F.col("_c.touch_type").alias("touch_type")).agg(
        F.sum("_c.first").alias("n_conversions_touched"),
        F.sum("_c.share").alias("credited_value"),
    )


def conversion_by_deadline(
    events: DataFrame,
    deadlines_hours: tuple[int, ...] = (1, 6, 24, 168),
    from_type: str = "view",
    to_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-rate-by-deadline curve: of the users who emitted a
    first ``from_type`` event, what fraction converted (first
    ``to_type`` strictly after it) within 1 h / 6 h / 24 h / 7 d —
    the deadline-budget view of :func:`conversion_latency`'s quartiles
    (product asks "what do we lose with a 24-hour offer window", not
    "what's the median"). Returns one row per deadline:
    ``(deadline_hours, n_converted_within, n_eligible, rate)``.

    Engine shape: the same single user-keyed exchange as
    `conversion_latency` (conditional-MIN window + per-user aggregate);
    all deadlines evaluate as CONDITIONAL SUMS in one global aggregate
    over the one-row-per-user frame (no per-deadline pass, no join —
    K deadlines are K codegen branches), and the K-row curve is an
    in-row explode of that single result row. The eligible-user
    denominator (distinct users with any ``from_type``) rides the same
    windowed frame as a conditional countDistinct. ``rate`` is one
    division of two exact counts — deterministic IEEE, rounded only in
    the oracle-compared query layer.
    """
    us = _epoch_us(events, ts_col)
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
    per_user = base.groupBy(key_col).agg(
        F.max(F.col("_ff").isNotNull()).alias("_eligible"),
        F.min(
            F.when(
                (F.col(type_col) == to_type)
                & F.col("_ff").isNotNull()
                & (F.col("_us") > F.col("_ff")),
                F.col("_us") - F.col("_ff"),
            )
        ).alias("_lat_us"),
    )
    sums = [F.count(F.when(F.col("_eligible"), F.lit(1))).alias("n_eligible")]
    for d in deadlines_hours:
        sums.append(
            F.count(
                F.when(
                    F.col("_eligible")
                    & (F.col("_lat_us") <= F.lit(int(d) * 3_600_000_000)),
                    F.lit(1),
                )
            ).alias(f"_w{d}")
        )
    one = per_user.agg(*sums)
    curve = one.select(
        "n_eligible",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(d)).cast("bigint").alias("deadline_hours"),
                        F.col(f"_w{d}").alias("n_converted_within"),
                    )
                    for d in deadlines_hours
                ]
            )
        ).alias("_c"),
    )
    return curve.select(
        F.col("_c.deadline_hours").alias("deadline_hours"),
        F.col("_c.n_converted_within").alias("n_converted_within"),
        F.col("n_eligible"),
        (
            F.col("_c.n_converted_within").cast("double")
            / F.col("n_eligible").cast("double")
        ).alias("rate"),
    )


def temporal_dimension_join(
    fact: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """FACT-TO-SCD2 temporal join — the warehouse classic every star
    schema with versioned dimensions needs: each fact row joins the
    dimension VERSION whose validity interval covers the fact's event
    time (``valid_from <= ts AND (valid_to IS NULL OR ts < valid_to)``),
    so revenue booked in March joins March's customer tier even when
    the tier changed in April. ``history`` is :func:`scd2_history`
    output (non-overlapping per-key intervals — at most one match per
    fact row, the invariant scd2's tests pin); ``how='left'`` keeps
    facts that predate the dimension's first version (NULL attributes —
    dropping them silently is the classic temporal-join bug).

    Engine shape: an equi-join on the entity key carrying the interval
    predicates in the join condition — both sides shuffle ONCE on the
    key, and within a key the version list is small (bounded by that
    entity's change count — the SCD2 envelope), so the per-key interval
    scan is constants. No window over the fact side, no explode of
    intervals. At 100 TB the dimension side is vastly smaller than the
    fact and broadcasts (AQE or hint) — the fact then never shuffles
    at all.
    """
    f, h = fact.alias("_f"), history.alias("_h")
    ts = F.col(f"_f.{ts_col}")
    cond = (
        (F.col(f"_f.{key_col}") == F.col(f"_h.{key_col}"))
        & (F.col("_h.valid_from") <= ts)
        & (F.col("_h.valid_to").isNull() | (ts < F.col("_h.valid_to")))
    )
    return f.join(h, cond, how).select(
        "_f.*",
        F.col("_h.value").alias("dim_value"),
        F.col("_h.version").alias("dim_version"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands interval coalescing: merge each key's OVERLAPPING
    (or touching, closed-interval semantics) ``[start, end]`` intervals into
    maximal disjoint spans — one row per span with ``(key, span_start,
    span_end, n_intervals)``. The classic warehouse primitive under
    contract-coverage, machine-uptime, and ad-flight reporting; distinct
    from :func:`sessionize` because intervals carry heterogeneous DURATIONS:
    a long interval can swallow many later ones, which no point-gap rule can
    express.

    Membership rule: ordered by ``(start, end)`` within a key, a row opens a
    new span iff its start exceeds the RUNNING MAX of all prior ends (not
    ``lag(end)`` — the textbook bug: an already-swallowed short interval's
    early end would otherwise reopen a span inside its swallower). Equal
    starts are order-insensitive: whichever of two equal-start rows sorts
    first, the second's start <= running max end, so span membership — and
    therefore every output row — is deterministic without a unique
    tiebreak column.

    Scale design — ONE key-partitioned shuffle end to end: the running-max
    window and the span-numbering running sum share the same
    ``(key) x (start, end)`` spec (single window Exchange), and the final
    rollup groups on ``(key, span_id)`` — a superset of the window's hash
    key, so EnsureRequirements reuses the partitioning with NO second
    Exchange (the sessionize/scd2 plan shape). Per-key window width is
    bounded by that key's own interval count. NULL starts/ends are
    unorderable and excluded, as in :func:`sessionize`.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prior_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .withColumn(
            "_new_span",
            F.when(
                prior_max_end.isNull() | (F.col(start_col) > prior_max_end),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("span_id", F.sum("_new_span").over(w))
    )
    return flagged.groupBy(F.col(key_col), F.col("span_id")).agg(
        F.min(start_col).alias("span_start"),
        F.max(end_col).alias("span_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: int = 7,
    grid: int = 1_000_000,
) -> DataFrame:
    """Kaplan–Meier survival curve over user lifetimes with right-censoring
    — "what fraction of users are still active after d days?", the churn
    readout `retention_cohorts` cannot give because cohort cells silently
    mix users who left with users whose observation simply ended.

    Lifetime model: a user's clock starts at their FIRST event. A user
    whose last event is ≥ ``churn_gap_days`` before the corpus's last
    observed timestamp has CHURNED (event, duration = first→last in days);
    anyone active more recently is CENSORED at the observation end
    (duration = first→obs_end) — their lifetime is only known to EXCEED
    that, which is exactly what the KM estimator consumes and a naive
    "avg lifetime" silently gets wrong.

    Output per distinct duration d (ascending): ``n_at_risk`` (users whose
    lifetime reached d), ``n_events`` (churned at d), ``n_censored``,
    ``hazard_q6`` = (grid * n_events) DIV n_at_risk — exact integer — and
    ``km_log_q6``, the running sum of floor(grid * ln((n-d)/n)) over event
    durations: the KM product in grid-quantized log space. Both engines
    floor the same ln at the same grid (the `unigram_nll` integer-ln lane),
    and the cumulative SUM is exact integer arithmetic, so the curve is
    oracle-hash-exact THROUGH the cumulative product. Where the risk set
    churns out entirely (n_events = n_at_risk) survival hits exact zero —
    ln(0) is undefined, so ``km_log_q6`` goes NULL from that row on
    (flagged ``km_zero``), mirrored in SQL.

    Scale: one user-keyed shuffle for the lifetime table (min/max from one
    hash aggregate), then every window runs over the DURATION CENSUS — one
    row per distinct day count, bounded by the observation span in days,
    not by users or events (the bounded-global-window discipline of
    `token_kl_divergence`). The single-row obs_end aggregate broadcasts.
    """
    day_diff = F.datediff
    obs = events.agg(F.max(F.to_date(F.col(ts_col))).alias("_obs_end"))
    pu = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.min(F.to_date(F.col(ts_col))).alias("_t0"),
            F.max(F.to_date(F.col(ts_col))).alias("_t1"),
        )
        .crossJoin(F.broadcast(obs))
        .select(
            F.when(
                day_diff(F.col("_obs_end"), F.col("_t1"))
                >= F.lit(churn_gap_days),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("_churned"),
            F.when(
                day_diff(F.col("_obs_end"), F.col("_t1"))
                >= F.lit(churn_gap_days),
                day_diff(F.col("_t1"), F.col("_t0")),
            )
            .otherwise(day_diff(F.col("_obs_end"), F.col("_t0")))
            .cast("long")
            .alias("duration_days"),
        )
    )
    census = pu.groupBy("duration_days").agg(
        F.sum("_churned").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("_churned")).cast("bigint").alias("n_censored"),
    )
    total = pu.agg(F.count(F.lit(1)).cast("bigint").alias("_n_total"))
    w_prior = (
        Window.orderBy("duration_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = (
        census.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            (
                F.col("_n_total")
                - F.coalesce(
                    F.sum(F.col("n_events") + F.col("n_censored")).over(
                        w_prior
                    ),
                    F.lit(0),
                )
            ).cast("bigint"),
        )
        .drop("_n_total")
    )
    factor = F.when(
        F.col("n_events") == 0, F.lit(0).cast("bigint")
    ).when(
        F.col("n_events") < F.col("n_at_risk"),
        F.floor(
            F.lit(grid)
            * F.log(
                (F.col("n_at_risk") - F.col("n_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
        ).cast("bigint"),
    )  # n_events == n_at_risk -> NULL (survival exactly zero)
    stepped = at_risk.withColumn("_f", factor).withColumn(
        "km_zero",
        (
            F.max(
                F.when(
                    F.col("n_events") == F.col("n_at_risk"), F.lit(1)
                ).otherwise(F.lit(0))
            ).over(w_cum)
            == 1
        ),
    )
    return stepped.select(
        "duration_days",
        "n_at_risk",
        "n_events",
        "n_censored",
        F.expr(f"CAST({grid} AS BIGINT) * n_events DIV n_at_risk").alias(
            "hazard_q6"
        ),
        F.when(
            F.col("km_zero"), F.lit(None).cast("bigint")
        )
        .otherwise(F.sum("_f").over(w_cum))
        .cast("bigint")
        .alias("km_log_q6"),
        "km_zero",
    )
