"""Statistical-census queries ([ext]): per-key OLS trend, lag-1
autocorrelation, chi-squared independence, Welch's t, first-order event
transitions, and last-touch attribution (operators/stats.py +
operators/analytics.py). All six are pure aggregate/window compositions
— fully SQL-expressible, every one oracle-checked against DuckDB's
identical regr_*/corr/var_samp aggregates and window frames. The
reference (`loader.py`) has no statistics or event surface; these extend
the north-star set alongside the drift censuses (KL divergence, Benford,
Tukey fences) that already ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.analytics import (
    _epoch_us,
    attribution_last_touch,
    event_transitions,
)
from ..operators.stats import (
    autocorr_lag1,
    chi2_independence,
    regr_trend_per_key,
    welch_ttest,
)
from ..sources.readers import load_table
from .registry import register

# x-origin for the trend fit: 2024-01-01 UTC in epoch microseconds. The
# driver's event log starts there; centering x near the data keeps the
# regression's co-moments small (x in ~[0, 30] days instead of ~19723)
# so the two engines' numerically-stable one-pass covariances agree far
# inside the 1e-6 comparison grid. Pure constant shift — slope and r2
# are shift-invariant; only the intercept's meaning moves (level at the
# origin date).
_TREND_X0_US = 1_704_067_200_000_000

# Welch A/B arms: the two event types whose `value` streams a product
# team would compare (browse vs buy).
_TTEST_A, _TTEST_B = "view", "purchase"


@register(
    "q_trend_per_type",
    oracle=f"""
    SELECT event_type,
           CAST(regr_count(value, x) AS BIGINT) AS n_obs,
           ROUND(regr_slope(value, x), 6) AS slope,
           ROUND(regr_intercept(value, x), 6) AS intercept,
           ROUND(regr_r2(value, x), 6) AS r2
    FROM (
        SELECT event_type, value,
               CAST(epoch_us(ts) - {_TREND_X0_US} AS DOUBLE) / 86400e6 AS x
        FROM events
    )
    GROUP BY event_type
    """,
    tags=("stats", "agg", "ext"),
)
def q_trend_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of `value` against event time in days
    (north star `regr_trend_per_key`): which metric streams drift, how
    fast (slope per day), and how linearly (r2). ONE hash aggregate —
    regr_* are co-moment aggregates, so partials combine map-side and
    the shuffle carries one moment vector per (partition, type); rows
    with NULL ts or value drop pairwise by the regr_* contract on both
    engines."""
    events = load_table(spark, sf_dir, "events")
    # _epoch_us adapts to the round's on-disk ts encoding (TIMESTAMP vs
    # TIMESTAMP_NTZ flip across testdata generations — unix_micros alone
    # rejects NTZ).
    x = (_epoch_us(events, "ts") - F.lit(_TREND_X0_US)).cast("double") / F.lit(
        86400e6
    )
    t = regr_trend_per_key(
        events.withColumn("x", x), "event_type", F.col("x"), F.col("value")
    )
    return t.select(
        "event_type",
        "n_obs",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )


@register(
    "q_events_autocorr",
    oracle="""
    SELECT event_type,
           CAST(COUNT(prev) AS BIGINT) AS n_pairs,
           ROUND(corr(v, prev), 6) AS autocorr
    FROM (
        SELECT event_type, value AS v,
               lag(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS prev
        FROM events WHERE ts IS NOT NULL
    )
    GROUP BY event_type
    """,
    tags=("stats", "window", "ext"),
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 serial correlation of `value` per event type in event-time
    order (north star `autocorr_lag1`): the momentum-vs-noise screen run
    before paying for a trend fit. One type-keyed window pairs values
    with predecessors, then `corr` collapses the pairs reusing the same
    partitioning (one exchange total). NULL-ts rows are excluded up
    front — the two engines default to opposite NULL sort positions, so
    NULL timestamps may not participate in the order."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    a = autocorr_lag1(events, "event_type", ["ts", "event_id"], "value")
    return a.select(
        "event_type", "n_pairs", F.round("autocorr", 6).alias("autocorr")
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH pairs AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE ts IS NOT NULL
    ),
    census AS (
        SELECT prev_type, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           ROUND(n_transitions /
                 SUM(n_transitions) OVER (PARTITION BY prev_type), 6)
             AS p_transition
    FROM census
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream (north
    star `event_transitions`): per (prev_type, type) pair of consecutive
    same-user events, the transition count and row-normalized
    conditional probability. ONE user-keyed exchange (the lag window);
    the census that follows is |types|^2 rows — constant-size at any
    corpus scale after map-side combine."""
    events = load_table(spark, sf_dir, "events")
    t = event_transitions(events)
    return t.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round("p_transition", 6).alias("p_transition"),
    )


@register(
    "q_attribution_last_touch",
    oracle="""
    WITH conv AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch
        FROM events WHERE ts IS NOT NULL
    )
    SELECT COALESCE(touch, '(none)') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(SUM(value), 4) AS total_value
    FROM conv WHERE event_type = 'purchase'
    GROUP BY touch_type
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution census (north star
    `attribution_last_touch`): each purchase credits the nearest
    strictly-preceding non-purchase event of the same user; per touch
    type, conversion count and converted value. One user-keyed window
    carries the latest touch forward (no self-join of the log against
    itself — the correlated-subquery formulation is a per-conversion
    range scan); the census after the exchange is |types| rows."""
    events = load_table(spark, sf_dir, "events")
    a = attribution_last_touch(events, conversion_type="purchase")
    return a.select(
        "touch_type",
        "n_conversions",
        F.round("total_value", 4).alias("total_value"),
    )


@register(
    "q_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS obs
        FROM documents GROUP BY lang, source
    ),
    ra AS (SELECT lang, SUM(obs) AS rt FROM cells GROUP BY lang),
    cb AS (SELECT source, SUM(obs) AS ct FROM cells GROUP BY source),
    g AS (SELECT SUM(obs) AS n, COUNT(*) AS n_cells,
                 COUNT(DISTINCT lang)
                   + MAX(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS ka,
                 COUNT(DISTINCT source)
                   + MAX(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS kb
          FROM cells)
    SELECT CAST(g.n AS BIGINT) AS n_rows,
           CAST(g.n_cells AS BIGINT) AS n_cells,
           CAST((g.ka - 1) * (g.kb - 1) AS BIGINT) AS dof,
           ROUND(SUM((cells.obs - ra.rt * cb.ct / g.n)
                     * (cells.obs - ra.rt * cb.ct / g.n)
                     / (ra.rt * cb.ct / g.n)), 6) AS chi2
    FROM cells
    JOIN ra ON cells.lang IS NOT DISTINCT FROM ra.lang
    JOIN cb ON cells.source IS NOT DISTINCT FROM cb.source
    CROSS JOIN g
    GROUP BY g.n, g.n_cells, g.ka, g.kb
    """,
    tags=("stats", "agg", "ext"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence of language x source over the
    document corpus (north star `chi2_independence`): a large statistic
    means sources are language-skewed and per-source sampling will
    shift the language mix. ONE full-data aggregate (the contingency
    cells); margins and the statistic are aggregates OF the cells,
    joined behind broadcast — constant-size past the first exchange."""
    docs = load_table(spark, sf_dir, "documents")
    c = chi2_independence(docs, "lang", "source")
    return c.select(
        "n_rows", "n_cells", "dof", F.round("chi2", 6).alias("chi2")
    )


@register(
    "q_welch_ttest",
    oracle=f"""
    SELECT CAST(COUNT(a) AS BIGINT) AS n_a,
           CAST(COUNT(b) AS BIGINT) AS n_b,
           ROUND(AVG(a), 6) AS mean_a,
           ROUND(AVG(b), 6) AS mean_b,
           ROUND((AVG(a) - AVG(b))
                 / sqrt(var_samp(a) / COUNT(a) + var_samp(b) / COUNT(b)),
                 6) AS t_stat,
           ROUND(pow(var_samp(a) / COUNT(a) + var_samp(b) / COUNT(b), 2)
                 / (pow(var_samp(a) / COUNT(a), 2) / (COUNT(a) - 1)
                    + pow(var_samp(b) / COUNT(b), 2) / (COUNT(b) - 1)),
                 6) AS df_welch
    FROM (
        SELECT CASE WHEN event_type = '{_TTEST_A}' THEN value END AS a,
               CASE WHEN event_type = '{_TTEST_B}' THEN value END AS b
        FROM events
        WHERE event_type IN ('{_TTEST_A}', '{_TTEST_B}')
    )
    """,
    tags=("stats", "agg", "ext"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between the view and purchase `value`
    streams (north star `welch_ttest`): the A/B answer with
    Welch-Satterthwaite degrees of freedom. Conditional aggregation in
    ONE pass — count/avg/var_samp for both arms come from the same hash
    aggregate via CASE branches; the scalar t/df arithmetic runs on the
    single result row."""
    events = load_table(spark, sf_dir, "events")
    t = welch_ttest(events, "event_type", "value", _TTEST_A, _TTEST_B)
    return t.select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("t_stat", 6).alias("t_stat"),
        F.round("df_welch", 6).alias("df_welch"),
    )


@register(
    "q_twap_per_user",
    oracle="""
    WITH obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(floor(value * 1e6) AS HUGEINT) AS vq
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    d AS (
        SELECT user_id, vq,
               lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                 - us AS dt
        FROM obs
    ),
    a AS (
        SELECT user_id,
               CAST(COUNT(*) + 1 AS BIGINT) AS n_obs,
               CAST(SUM(dt) AS BIGINT) AS span_us,
               SUM(vq * dt) AS num
        FROM d WHERE dt IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_obs, span_us,
           ROUND(CASE WHEN span_us > 0
                      THEN CAST(num AS DOUBLE) / 1e6 / CAST(span_us AS DOUBLE)
                 END, 6) AS twap
    FROM a
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user (north star
    `twap_per_key`): each observation weighted by how long it stayed
    current — the irregular-sampling-proof mean. Exact decimal-integer
    numerator (1e-6 value grid x exact µs durations) — partition-
    invariant by construction; the final ratio rounds to 1e-6 on both
    sides because DuckDB's hugeint->double cast is not always correctly
    rounded (measured 1 ulp). One user-keyed exchange shared by the
    lead window and the aggregate."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.stats import twap_per_key

    t = twap_per_key(events)
    return t.select(
        "user_id", "n_obs", "span_us", F.round("twap", 6).alias("twap")
    )


@register(
    "q_interevent_gaps",
    oracle="""
    WITH g0 AS (
        SELECT event_type,
               CAST(epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS DOUBLE) / 1e6 AS gap
        FROM events WHERE ts IS NOT NULL
    ),
    g AS (
        SELECT event_type, list_sort(list(gap)) AS gs,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM g0 WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_gaps,
           gs[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1]
             + (gs[LEAST(CAST(floor(0.25 * (n - 1)) AS BIGINT) + 2, n)]
                - gs[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1])
               * (0.25 * (n - 1) - floor(0.25 * (n - 1))) AS p25_secs,
           gs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
             + (gs[LEAST(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)]
                - gs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1])
               * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS median_secs,
           gs[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1]
             + (gs[LEAST(CAST(floor(0.75 * (n - 1)) AS BIGINT) + 2, n)]
                - gs[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1])
               * (0.75 * (n - 1) - floor(0.75 * (n - 1))) AS p75_secs
    FROM g
    """,
    tags=("stats", "events", "ext"),
)
def q_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurrence-interval census (north star `gap_quantiles`): exact
    interpolated quartiles of the gap between a user's consecutive
    events of each type — repurchase cycles, crash periodicity. Gaps
    from ONE (user, type)-keyed window; quartiles via the order-
    statistic interpolation lane (bit-identical cross-engine, no
    grid)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.stats import gap_quantiles

    return gap_quantiles(events)


@register(
    "q_rolling_active_users",
    oracle=None,
    tags=("events", "sketch", "window", "ext"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day via mergeable HLL
    sketches (north star `rolling_distinct_hll`): raw events fold into
    per-day sketches ONCE (shuffle carries KB blobs, never ids); the
    trailing union is a RANGE window over the bounded day census. No
    oracle — sketch internals differ across engines; the estimate error
    is pinned locally against the exact trailing distinct
    (test_stats.py::test_rolling_distinct_tracks_exact)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import rolling_distinct_hll

    return rolling_distinct_hll(events, window_days=7)


@register(
    "q_golden_record",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'view'
                    THEN json_extract_string(props, '$.k') END AS device,
               CASE WHEN event_type = 'click'
                    THEN json_extract_string(props, '$.k') END AS channel,
               CASE WHEN event_type = 'purchase'
                    THEN json_extract_string(props, '$.k') END AS plan
        FROM events WHERE ts IS NOT NULL
    )
    SELECT DISTINCT user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_versions,
           last_value(device IGNORE NULLS) OVER w AS device,
           last_value(channel IGNORE NULLS) OVER w AS channel,
           last_value(plan IGNORE NULLS) OVER w AS plan
    FROM log
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
    tags=("events", "dedup", "merge", "ext"),
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge of sparse attribute sightings (north star
    `golden_record`): each event type contributes ONE attribute
    observation; per user, every field independently keeps its latest
    non-null sighting — fields survive from DIFFERENT rows, the MDM
    "golden record". ONE map-side-combinable aggregate of
    max(struct(order, field)) over non-null sightings — no window, no
    sort, no self-join (the oracle's DISTINCT-over-full-frame windows
    replay the same semantics the textbook way)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.delta import golden_record

    log = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        _epoch_us(events, "ts").alias("_us"),
        "event_id",
        F.when(
            F.col("event_type") == "view", F.get_json_object("props", "$.k")
        ).alias("device"),
        F.when(
            F.col("event_type") == "click", F.get_json_object("props", "$.k")
        ).alias("channel"),
        F.when(
            F.col("event_type") == "purchase",
            F.get_json_object("props", "$.k"),
        ).alias("plan"),
    )
    return golden_record(
        log, "user_id", ["_us", "event_id"], ["device", "channel", "plan"]
    )


# CUSUM parameters for the drift census: in-control target 50 (the event
# log's global value mean), slack 10 (shifts past 60 accumulate), alarm
# threshold 1000 value-units of accumulated excess.
_CUSUM_TARGET, _CUSUM_SLACK, _CUSUM_H = 50.0, 10.0, 1000.0


@register(
    "q_events_cusum",
    oracle=f"""
    WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(floor(value * 1e6) AS BIGINT)
                 - {int((_CUSUM_TARGET + _CUSUM_SLACK) * 1e6)} AS xq
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    r AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(xq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT) AS p
        FROM q
    ),
    s AS (
        SELECT user_id, ts, event_id,
               p - LEAST(0, MIN(p) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW)) AS s
        FROM r
    )
    SELECT DISTINCT user_id,
           CAST(COUNT(*) OVER w2 AS BIGINT) AS n_obs,
           last_value(s) OVER w2 AS cusum_final_q,
           MAX(s) OVER w2 AS cusum_peak_q,
           MAX(s) OVER w2 >= {int(_CUSUM_H * 1e6)} AS alarm
    FROM s
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM drift census per user (north star
    `cusum_per_key`, Page 1954): which value streams shifted past
    target + slack, with the peak accumulated evidence and an alarm
    flag. Runs as the prefix-minimum CLOSED FORM (two ordered integer
    windows sharing one user-keyed exchange) rather than a fold; the
    1e-6 floor grid makes every window op exact 64-bit arithmetic —
    bit-identical cross-engine even though running-SUM internals differ
    (DuckDB segment trees vs Spark sequential accumulation)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.stats import cusum_per_key

    return cusum_per_key(
        events, target=_CUSUM_TARGET, slack=_CUSUM_SLACK, threshold=_CUSUM_H
    )


@register(
    "q_conversion_latency",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id) AS ff
        FROM events WHERE ts IS NOT NULL
    ),
    lat AS (
        SELECT user_id,
               CAST(MIN(us - ff) AS DOUBLE) / 1e6 AS l
        FROM e
        WHERE event_type = 'purchase' AND ff IS NOT NULL AND us > ff
        GROUP BY user_id
    ),
    g AS (
        SELECT list_sort(list(l)) AS ls,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lat
    )
    SELECT n AS n_converted,
           ls[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1]
             + (ls[LEAST(CAST(floor(0.25 * (n - 1)) AS BIGINT) + 2, n)]
                - ls[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1])
               * (0.25 * (n - 1) - floor(0.25 * (n - 1))) AS p25_secs,
           ls[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
             + (ls[LEAST(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)]
                - ls[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1])
               * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS median_secs,
           ls[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1]
             + (ls[LEAST(CAST(floor(0.75 * (n - 1)) AS BIGINT) + 2, n)]
                - ls[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1])
               * (0.75 * (n - 1) - floor(0.75 * (n - 1))) AS p75_secs
    FROM g
    """,
    tags=("stats", "events", "analytics", "ext"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view-to-first-subsequent-purchase latency quartiles (north
    star `conversion_latency`): the how-LONG companion of the funnel's
    how-many. One user-keyed exchange (conditional-MIN window + per-user
    aggregate share it); the quartile collect is one row per CONVERTING
    USER (entity-bounded), interpolated on the exact order-statistic
    lane — bit-identical cross-engine, no grid."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import conversion_latency

    return conversion_latency(events)


@register(
    "q_resample_interpolate",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               (MAX(CASE WHEN value IS NOT NULL
                         THEN {'u': epoch_us(ts), 't': event_id, 'v': value}
                    END)).v AS obs
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                           CAST(d1 AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM spans
    ),
    panel AS (
        SELECT g.user_id, g.day,
               date_diff('day', DATE '2024-01-01', g.day) AS x,
               d.obs AS y
        FROM grid g LEFT JOIN daily d USING (user_id, day)
    ),
    nb AS (
        SELECT user_id, day, x, y,
               last_value(CASE WHEN y IS NOT NULL
                          THEN {'x': x, 'y': y} END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS p,
               first_value(CASE WHEN y IS NOT NULL
                           THEN {'x': x, 'y': y} END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY x
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS n
        FROM panel
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           COALESCE(y, p.y + (n.y - p.y)
                         * (CAST(x - p.x AS DOUBLE)
                            / CAST(n.x - p.x AS DOUBLE))) AS value_interp
    FROM nb
    """,
    tags=("events", "analytics", "window", "ext"),
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample + LINEAR interpolation (north star
    `interpolate_linear`): the straight-line twin of q_resample_daily's
    forward fill, for level metrics where a step function lies. Gap
    days fill from the line through their nearest observations (day
    index as x); leading gaps stay NULL. Both neighbor windows share
    one user exchange; the fill tree is exact IEEE over exact inputs —
    hash-exact with NO grid."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import interpolate_linear

    us = _epoch_us(events, "ts")
    daily = (
        events.filter(F.col("ts").isNotNull())
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.max(
                F.when(
                    F.col("value").isNotNull(),
                    F.struct(
                        us.alias("u"),
                        F.col("event_id").alias("t"),
                        F.col("value").alias("v"),
                    ),
                )
            )["v"].alias("obs")
        )
    )
    from ..session import tracked_cache

    daily = tracked_cache(daily)
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    panel = grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.datediff(F.col("day"), F.lit("2024-01-01")).alias("x"),
        F.col("obs").alias("y"),
    )
    out = interpolate_linear(panel, "user_id", "x", "y", out_col="value_interp")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value_interp",
    )


@register(
    "q_attribution_linear",
    oracle="""
    WITH raw AS (
        SELECT event_type, value,
               list(event_type)
                   FILTER (WHERE event_type <> 'purchase')
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS t
        FROM events WHERE ts IS NOT NULL
    ),
    conv AS (
        SELECT value,
               CASE WHEN t IS NULL OR len(t) = 0
                    THEN ['(none)'] ELSE t END AS t
        FROM raw WHERE event_type = 'purchase'
    ),
    cr AS (
        SELECT t[i] AS touch_type,
               value / len(t) AS share,
               CASE WHEN list_position(t, t[i]) = i THEN 1 ELSE 0 END
                 AS is_first
        FROM conv, unnest(generate_series(1, len(t))) AS g(i)
    )
    SELECT touch_type,
           CAST(SUM(is_first) AS BIGINT) AS n_conversions_touched,
           ROUND(SUM(share), 4) AS credited_value
    FROM cr GROUP BY touch_type
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-split multi-touch attribution census (north star
    `attribution_linear`): each purchase's value splits equally across
    every prior touch occurrence of the same user; '(none)' takes full
    credit for organic conversions. One user-keyed window builds the
    prior-touch multiset in-row; share and first-occurrence flag compute
    in-row, so ONE explode feeds ONE census aggregate — no join, no
    distinct shuffle."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import attribution_linear

    a = attribution_linear(events, conversion_type="purchase")
    return a.select(
        "touch_type",
        "n_conversions_touched",
        F.round("credited_value", 4).alias("credited_value"),
    )


@register(
    "q_conversion_by_deadline",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id) AS ff
        FROM events WHERE ts IS NOT NULL
    ),
    per_user AS (
        SELECT user_id,
               MAX(ff IS NOT NULL) AS eligible,
               MIN(CASE WHEN event_type = 'purchase' AND ff IS NOT NULL
                             AND us > ff
                        THEN us - ff END) AS lat_us
        FROM e GROUP BY user_id
    ),
    one AS (
        SELECT CAST(COUNT(CASE WHEN eligible THEN 1 END) AS BIGINT)
                 AS n_eligible,
               CAST(COUNT(CASE WHEN eligible
                                AND lat_us <= 1 * 3600000000
                               THEN 1 END) AS BIGINT) AS w1,
               CAST(COUNT(CASE WHEN eligible
                                AND lat_us <= 6 * 3600000000
                               THEN 1 END) AS BIGINT) AS w6,
               CAST(COUNT(CASE WHEN eligible
                                AND lat_us <= 24 * 3600000000
                               THEN 1 END) AS BIGINT) AS w24,
               CAST(COUNT(CASE WHEN eligible
                                AND lat_us <= 168 * 3600000000
                               THEN 1 END) AS BIGINT) AS w168
        FROM per_user
    )
    SELECT d.deadline_hours, d.n_converted_within, one.n_eligible,
           ROUND(CAST(d.n_converted_within AS DOUBLE)
                 / CAST(one.n_eligible AS DOUBLE), 6) AS rate
    FROM one, LATERAL (
        VALUES (CAST(1 AS BIGINT), w1), (6, w6), (24, w24), (168, w168)
    ) AS d(deadline_hours, n_converted_within)
    """,
    tags=("stats", "events", "analytics", "ext"),
)
def q_conversion_by_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-rate-by-deadline curve (north star
    `conversion_by_deadline`): fraction of first-view users converting
    within 1 h / 6 h / 24 h / 7 d. Same single user exchange as the
    latency quartiles; all deadlines are conditional counts in ONE
    global aggregate, exploded in-row to the K-row curve."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import conversion_by_deadline

    c = conversion_by_deadline(events)
    return c.select(
        "deadline_hours",
        "n_converted_within",
        "n_eligible",
        F.round("rate", 6).alias("rate"),
    )


@register(
    "q_temporal_dim_join",
    oracle="""
    WITH attr AS (
        SELECT user_id, ts, event_id,
               CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) < 34
                    THEN 'low'
                    WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) < 67
                    THEN 'mid'
                    ELSE 'high' END AS device_class
        FROM events WHERE ts IS NOT NULL AND event_type = 'view'
    ),
    ordered AS (
        SELECT user_id, device_class, ts, event_id,
               lag(device_class) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
        FROM attr
    ),
    changes AS (
        SELECT user_id, device_class, ts, event_id FROM ordered
        WHERE prev IS NULL OR device_class <> prev
    ),
    hist AS (
        SELECT user_id, device_class AS value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT f.event_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           ROUND(f.value, 4) AS value,
           h.value AS dim_value,
           h.version AS dim_version
    FROM events f
    LEFT JOIN hist h
      ON f.user_id = h.user_id
     AND h.valid_from <= f.ts
     AND (h.valid_to IS NULL OR f.ts < h.valid_to)
    WHERE f.event_type = 'purchase' AND f.ts IS NOT NULL
    """,
    tags=("stats", "events", "join", "scd2", "ext"),
)
def q_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 temporal join (north star `temporal_dimension_join`):
    every purchase joins the device-class dimension VERSION valid at its
    own timestamp — the versioned-dimension star-schema classic. The
    dimension is scd2_history over the view-derived attribute log (the
    same proven operator); purchases predating any version keep NULL
    attributes via the left join. One key-keyed equi-join carrying the
    interval predicates; at scale the dimension broadcasts."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.analytics import scd2_history, temporal_dimension_join

    k = F.get_json_object("props", "$.k").cast("bigint")
    attr_log = events.filter(
        F.col("ts").isNotNull() & (F.col("event_type") == "view")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(k < 34, "low").when(k < 67, "mid").otherwise("high").alias(
            "device_class"
        ),
    )
    hist = scd2_history(attr_log, attr_col="device_class").drop("is_current")
    fact = events.filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    ).select("event_id", "user_id", "ts", "value")
    out = temporal_dimension_join(fact, hist, "user_id", "ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 4).alias("value"),
        "dim_value",
        "dim_version",
    )


@register(
    "q_embedding_pca_spectrum",
    oracle=None,
    tags=("similarity", "ml", "ext"),
)
def q_embedding_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 PCA explained-variance spectrum of the embedding corpus
    (north star `pca_variance_spectrum`): the anisotropy screen run
    before choosing an IVF/PQ compression budget — fast eigenvalue
    decay means the vectors collapse onto few directions and cosine
    retrieval degrades. One treeAggregate covariance pass (shuffle
    carries d^2 floats, never rows) + a driver eigendecomposition of
    the d x d matrix. No SQL oracle (DuckDB has no eigensolver) — the
    spectrum is pinned against numpy's dense eigh to 1e-6 relative
    (test_extensions.py::test_pca_spectrum_matches_numpy)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from ..operators.similarity import pca_variance_spectrum

    return pca_variance_spectrum(emb, k=8)


def _bootstrap_oracle(n_replicates: int = 32) -> str:
    """Oracle for q_bootstrap_se: the same md5-hex Poisson(1) weights —
    four 8-hex buckets byte-sliced from each digest (r13: 8 md5 calls
    per row, not 32, identical derivation in both engines) —
    grid-quantized integer sums, and fold-identical in-row SE tree
    (DuckDB list_reduce's first step m1 == Spark's 0.0 + m1 exactly, so
    the two folds run the same IEEE sequence)."""
    from ..operators.stats import _POISSON1_HEX

    w_exprs = []
    agg_exprs = []
    mean_exprs = []
    for b in range(n_replicates):
        g, j = divmod(b, 4)
        bucket = (
            f"substr(md5(CAST(event_id AS VARCHAR) || ':{g}'), {1 + 8 * j}, 8)"
        )
        ladder = " + ".join(
            f"(CASE WHEN {bucket} >= '{t}' THEN 1 ELSE 0 END)"
            for t in _POISSON1_HEX
        )
        w_exprs.append(f"CAST({ladder} AS BIGINT) AS w{b}")
        agg_exprs.append(f"CAST(SUM(w{b} * vq) AS BIGINT) AS ws{b}")
        agg_exprs.append(f"CAST(SUM(w{b}) AS BIGINT) AS wn{b}")
        mean_exprs.append(
            f"CASE WHEN wn{b} > 0 THEN CAST(ws{b} AS DOUBLE) "
            f"/ (CAST(wn{b} AS DOUBLE) * 1e6) END"
        )
    mbar = "list_reduce(lv, (a, b) -> a + b) / len(lv)"
    return f"""
    WITH rows AS (
        SELECT event_type,
               CAST(floor(value * 1e6) AS BIGINT) AS vq,
               {", ".join(w_exprs)}
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(vq) AS BIGINT) AS sv,
               {", ".join(agg_exprs)}
        FROM rows GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n_rows, sv,
               list_filter([{", ".join(mean_exprs)}],
                           x -> x IS NOT NULL) AS lv
        FROM g
    )
    SELECT event_type, n_rows,
           ROUND(CAST(sv AS DOUBLE) / (n_rows * 1e6), 6) AS mean,
           ROUND(CASE WHEN len(lv) >= 2 THEN
               sqrt(list_reduce(
                        list_transform(lv, x -> (x - {mbar}) * (x - {mbar})),
                        (a, b) -> a + b)
                    / CAST(len(lv) - 1 AS DOUBLE)) END, 6) AS bootstrap_se
    FROM m
    """


@register(
    "q_bootstrap_se",
    oracle=_bootstrap_oracle(),
    tags=("stats", "agg", "sampling", "ext"),
)
def q_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson-bootstrap standard error of the per-type mean
    value (north star `bootstrap_se_mean`, Chamandy et al.): B=32
    deterministic md5-derived Poisson(1) weights per row (four 32-bit
    buckets sliced from each of 8 digests — r13 scan-CPU fix); 2B+2
    conditional sums in ONE hash aggregate; replicate means and their
    stddev compute in-row — the error bar without B resampling passes.
    Hash weights + grid-quantized integer sums + fold-identical SE tree
    make the statistic bit-reproducible cross-engine (rounded 1e-6 as
    insurance)."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.stats import bootstrap_se_mean

    b = bootstrap_se_mean(events, "event_type", "value", "event_id")
    return b.select(
        "event_type",
        "n_rows",
        F.round("mean", 6).alias("mean"),
        F.round("bootstrap_se", 6).alias("bootstrap_se"),
    )


def _ab_lift_oracle() -> str:
    from ..operators.sampling import split_case_sql

    arm = split_case_sql("user_id", {"A": 0.5, "B": 0.5})
    return f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 OVER (PARTITION BY user_id) AS ff
        FROM events WHERE ts IS NOT NULL
    ),
    per_user AS (
        SELECT user_id,
               MAX(ff IS NOT NULL) AS eligible,
               MAX(event_type = 'purchase' AND ff IS NOT NULL AND us > ff)
                 AS converted
        FROM e GROUP BY user_id
    ),
    arms AS (
        SELECT {arm} AS arm, converted
        FROM per_user WHERE eligible
    ),
    m AS (
        SELECT CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS n_a,
               CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS n_b,
               CAST(COUNT(CASE WHEN arm = 'A' AND converted THEN 1 END)
                    AS BIGINT) AS conv_a,
               CAST(COUNT(CASE WHEN arm = 'B' AND converted THEN 1 END)
                    AS BIGINT) AS conv_b
        FROM arms
    )
    SELECT n_a, n_b, conv_a, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
           ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS lift,
           ROUND(CASE WHEN CAST(conv_a + conv_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE)
                           * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                  / CAST(n_a + n_b AS DOUBLE)) > 0 THEN
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt(CAST(conv_a + conv_b AS DOUBLE)
                          / CAST(n_a + n_b AS DOUBLE)
                      * (1 - CAST(conv_a + conv_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE)))
           END, 6) AS z_stat
    FROM m
    """


@register(
    "q_ab_funnel_lift",
    oracle=_ab_lift_oracle(),
    tags=("stats", "events", "sampling", "ext"),
)
def q_ab_funnel_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B funnel-lift readout (north star `ab_funnel_lift`): hash-split
    users 50/50 (deterministic md5 intervals — no assignment table),
    per-arm first-view -> later-purchase conversion, lift and pooled
    two-proportion z. One user exchange + one global conditional
    aggregate; all arithmetic on exact counts. Under the null (the
    split is independent of behavior) |z| should be small — the
    experimentation platform's core readout."""
    events = load_table(spark, sf_dir, "events")
    from ..operators.stats import ab_funnel_lift

    a = ab_funnel_lift(events)
    return a.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round("lift", 6).alias("lift"),
        F.round("z_stat", 6).alias("z_stat"),
    )


@register(
    "q_psi_value_drift",
    oracle="""
    WITH base AS (
        SELECT event_type AS k, CAST(value AS DOUBLE) AS v,
               (ts < TIMESTAMP '2024-01-16') AS b
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    stats AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM base),
    binned AS (
        SELECT k, b,
               CASE WHEN hi > lo
                    THEN LEAST(9, CAST(FLOOR((v - lo) * 10 / (hi - lo))
                                       AS BIGINT))
                    ELSE 0 END AS bin
        FROM base, stats
    ),
    census AS (
        SELECT k, bin,
               SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
               SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS cc
        FROM binned GROUP BY k, bin
    ),
    tot AS (SELECT k, SUM(cb) AS tb, SUM(cc) AS tc FROM census GROUP BY k),
    terms AS (
        SELECT census.k, tot.tb, tot.tc,
               CAST(FLOOR(((cc + 1) / CAST(tc + 10 AS DOUBLE)
                           - (cb + 1) / CAST(tb + 10 AS DOUBLE))
                          * ln(CAST((cc + 1) * (tb + 10) AS DOUBLE)
                               / CAST((cb + 1) * (tc + 10) AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS tq
        FROM census JOIN tot ON census.k IS NOT DISTINCT FROM tot.k
    )
    SELECT k AS event_type,
           CAST(MIN(tb) AS BIGINT) AS n_baseline,
           CAST(MIN(tc) AS BIGINT) AS n_current,
           ROUND(CAST(SUM(tq) AS DOUBLE) / 1000000.0, 6) AS psi
    FROM terms GROUP BY k
    """,
    tags=("stats", "drift", "agg", "ext"),
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the metric value per event type,
    first half of January (baseline) vs the rest (current) — the
    ML-monitoring "did this feature drift between training and serving"
    gate (north star `psi_drift`; the numeric-feature sibling of
    `q_token_kl_divergence`). Pooled equal-width bins from a one-row
    min/max broadcast; one (key, bin) census with both sides as
    conditional sums; Laplace-smoothed proportions as exact integer
    ratios; per-bin terms floor-quantized to the 1e-6 grid before the
    per-key sum (the ln lane — order/partition-invariant and
    cross-engine exact). Bins empty on BOTH sides are excluded (sparse
    census); one-sided bins contribute through the smoothing."""
    from ..operators.stats import psi_drift

    events = load_table(spark, sf_dir, "events")
    base = events.filter("value IS NOT NULL AND ts IS NOT NULL").withColumn(
        "_is_base", F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz")
    )
    return psi_drift(base, "event_type", "value", "_is_base", n_bins=10)


@register(
    "q_seasonal_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type AS k, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100) AS DECIMAL(20,0))) / 100
                    AS DOUBLE) AS day_total
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY k, CAST(ts AS DATE)
    ),
    dowd AS (
        SELECT *, CAST(datediff('day', DATE '1970-01-01', day) % 7 AS INT)
                  AS dow
        FROM daily
    ),
    scored AS (
        SELECT k, day, dow, day_total,
               AVG(day_total) OVER (PARTITION BY k, dow) AS m,
               STDDEV_SAMP(day_total) OVER (PARTITION BY k, dow) AS sd
        FROM dowd
    )
    SELECT k AS event_type, strftime(day, '%Y-%m-%d') AS day, dow,
           ROUND(day_total, 6) AS day_total,
           ROUND(m, 6) AS dow_mean,
           ROUND(sd, 6) AS dow_sd,
           ROUND(CASE WHEN sd > 0 THEN (day_total - m) / sd END, 6)
             AS z_score
    FROM scored
    """,
    tags=("stats", "events", "window", "ext"),
)
def q_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal residual z-scores of the daily value total per
    event type (north star `seasonal_zscore_daily`): each day scored
    against its own weekday's mean/sd — the seasonal-naive anomaly screen
    that neither pages on a routinely quiet Sunday nor lets a quiet
    Tuesday hide. Emits the score, not a verdict, so every comparison
    happens on identically-rounded values downstream. One (key, date)
    hash aggregate is the only full-data pass; decimal-grid day totals
    keep the sums order-invariant (TWAP lane), weekday moments ride the
    moment lane."""
    from ..operators.stats import seasonal_zscore_daily

    events = load_table(spark, sf_dir, "events")
    return seasonal_zscore_daily(events, "event_type", "ts", "value")


@register(
    "q_mad_per_type",
    oracle="""
    WITH g AS (
        SELECT event_type, list_sort(list(CAST(value AS DOUBLE))) AS xs,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    med AS (
        SELECT event_type, xs, n,
               xs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
                 + (xs[LEAST(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)]
                    - xs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1])
                   * (0.5 * (n - 1) - floor(0.5 * (n - 1))) AS m
        FROM g
    ),
    dev AS (
        SELECT event_type, n, m,
               list_sort(list_transform(xs, x -> abs(x - m))) AS ds
        FROM med
    )
    SELECT event_type, n AS n_obs, ROUND(m, 6) AS median,
           ROUND(ds[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
                 + (ds[LEAST(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)]
                    - ds[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1])
                   * (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS mad
    FROM dev
    """,
    tags=("stats", "agg", "robust", "ext"),
)
def q_mad_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of `value` per event type (north star
    `mad_per_key`): the robust dispersion census — one outlier cannot
    inflate the yardstick that judges outliers (the robust-z building
    block next to the Tukey fences). ONE key aggregate collects sorted
    values; both medians interpolate in-row on the exact order-statistic
    lane (bit-exact cross-engine, no grid)."""
    from ..operators.stats import mad_per_key

    events = load_table(spark, sf_dir, "events")
    return mad_per_key(events, "event_type", "value")


@register(
    "q_source_concentration",
    oracle="""
    WITH totals AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS w
        FROM documents WHERE text IS NOT NULL GROUP BY source
    ),
    s AS (SELECT list_sort(list(w)) AS ws FROM totals)
    SELECT CAST(len(ws) AS BIGINT) AS n_groups,
           CAST(list_sum(ws) AS BIGINT) AS total,
           ROUND(CAST(ws[-1] AS DOUBLE) / list_sum(ws), 6) AS top_share,
           ROUND(list_sum(list_transform(ws,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                 / (CAST(list_sum(ws) AS DOUBLE)
                    * CAST(list_sum(ws) AS DOUBLE)), 6) AS hhi,
           ROUND(2.0 * list_sum(
                     list_transform(list_zip(ws,
                         generate_series(1, len(ws))),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (CAST(len(ws) AS DOUBLE) * CAST(list_sum(ws) AS DOUBLE))
                 - CAST(len(ws) + 1 AS DOUBLE) / CAST(len(ws) AS DOUBLE), 6)
             AS gini
    FROM s
    """,
    tags=("stats", "text", "curation", "ext"),
)
def q_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-concentration census of token mass across sources (north
    star `source_concentration`): top-source share, HHI, and Gini over
    per-source token totals — the "is my training mix dominated by a few
    sources" audit run before fixing mixture weights. One full-data
    census (exact integer token counts), everything after computes
    in-row on the |sources|-sized sorted totals."""
    from ..operators.stats import source_concentration

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return source_concentration(
        docs, "source", F.size(F.split(F.col("text"), " "))
    )


@register(
    "q_ks_value_drift",
    oracle="""
    WITH base AS (
        SELECT event_type AS k, value AS v,
               ts < TIMESTAMP '2024-01-16' AS b
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    census AS (
        SELECT k, v,
               SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
               SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS cc
        FROM base GROUP BY k, v
    ),
    cum AS (
        SELECT k,
               SUM(cb) OVER (PARTITION BY k) AS nb,
               SUM(cc) OVER (PARTITION BY k) AS nc,
               SUM(cb) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
               SUM(cc) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        FROM census
    )
    SELECT k AS event_type,
           CAST(MIN(nb) AS BIGINT) AS n_baseline,
           CAST(MIN(nc) AS BIGINT) AS n_current,
           ROUND(CASE WHEN MIN(nb) > 0 AND MIN(nc) > 0 THEN
               CAST(MAX(ABS(CAST(cumb AS HUGEINT) * CAST(nc AS HUGEINT)
                            - CAST(cumc AS HUGEINT) * CAST(nb AS HUGEINT)))
                    AS DOUBLE)
               / (CAST(MIN(nb) AS DOUBLE) * CAST(MIN(nc) AS DOUBLE))
           END, 6) AS ks_d
    FROM cum GROUP BY k
    """,
    tags=("stats", "drift", "agg", "ext"),
)
def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of the metric value per
    event type, first half of January (baseline) vs the rest (north star
    `ks_drift`): the nonparametric twin of `q_psi_value_drift` — no bin
    grid, no smoothing constant, sensitive to movement anywhere in the
    distribution. D is attained at a pooled distinct value, so the
    census + two shared-partitioning window passes compute it exactly:
    the numerator max runs over EXACT 128-bit integers (DECIMAL(38,0) /
    HUGEINT — int64 would overflow past ~3e9 rows per side) and only the
    final ratio is a double, rounded 1e-6."""
    from ..operators.stats import ks_drift

    events = load_table(spark, sf_dir, "events")
    base = events.filter("value IS NOT NULL AND ts IS NOT NULL").withColumn(
        "_is_base", F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz")
    )
    return ks_drift(base, "event_type", "value", "_is_base")


@register(
    "q_mann_whitney_u",
    oracle="""
    WITH base AS (
        SELECT event_type AS k, value AS v,
               ts < TIMESTAMP '2024-01-16' AS b
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    census AS (
        SELECT k, v,
               SUM(CASE WHEN b THEN 1 ELSE 0 END) AS cb,
               SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS cc
        FROM base GROUP BY k, v
    ),
    cum AS (
        SELECT k, cb, cc,
               SUM(cb) OVER (PARTITION BY k) AS nb,
               SUM(cc) OVER (PARTITION BY k) AS nc,
               COALESCE(SUM(cb + cc) OVER (PARTITION BY k ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev
        FROM census
    ),
    agg AS (
        SELECT k,
               CAST(MIN(nb) AS BIGINT) AS nb,
               CAST(MIN(nc) AS BIGINT) AS nc,
               CAST(SUM(cc * (2 * prev + cb + cc + 1)) AS BIGINT) AS r2,
               CAST(SUM((cb + cc) * (cb + cc) * (cb + cc) - (cb + cc))
                    AS BIGINT) AS t
        FROM cum GROUP BY k
    )
    SELECT k AS event_type,
           nb AS n_baseline,
           nc AS n_current,
           CAST(r2 - nc * (nc + 1) AS DOUBLE) / 2.0 AS u_current,
           ROUND(CASE WHEN nb > 0 AND nc > 0
                       AND CAST(nb AS DOUBLE) * CAST(nc AS DOUBLE) / 12.0
                           * (CAST(nb + nc + 1 AS DOUBLE)
                              - CAST(t AS DOUBLE)
                                / (CAST(nb + nc AS DOUBLE)
                                   * CAST(nb + nc - 1 AS DOUBLE))) > 0
                 THEN CAST(r2 - nc * (nc + 1) - nb * nc AS DOUBLE)
                      / (2.0 * sqrt(
                          CAST(nb AS DOUBLE) * CAST(nc AS DOUBLE) / 12.0
                          * (CAST(nb + nc + 1 AS DOUBLE)
                             - CAST(t AS DOUBLE)
                               / (CAST(nb + nc AS DOUBLE)
                                  * CAST(nb + nc - 1 AS DOUBLE)))))
                 END, 6) AS z
    FROM agg
    """,
    tags=("stats", "drift", "agg", "ext"),
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test of the metric value per event type,
    first half of January (baseline) vs the rest (north star
    `mann_whitney_u`): the nonparametric location test completing the
    drift/AB panel next to `q_psi_value_drift` (binned mass),
    `q_ks_value_drift` (sup-CDF), and `q_welch_ttest` (means). Doubled
    average ranks keep the rank-sum, U, and the z numerator exact
    integers end-to-end over the same census + shared-partitioning
    window shape as KS; the tie-corrected variance computes from exact
    integers in double and z rounds 1e-6 on both engines."""
    from ..operators.stats import mann_whitney_u

    events = load_table(spark, sf_dir, "events")
    base = events.filter("value IS NOT NULL AND ts IS NOT NULL").withColumn(
        "_is_base", F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz")
    )
    return mann_whitney_u(base, "event_type", "value", "_is_base")


@register(
    "q_winsorized_mean",
    oracle="""
    WITH base AS (
        SELECT event_type AS k, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ),
    s AS (
        SELECT k, list(v ORDER BY v) AS xs, COUNT(*) AS n
        FROM base GROUP BY k
    ),
    q AS (
        SELECT k, xs, n,
               xs[CAST(FLOOR((n - 1) * 0.25) AS BIGINT) + 1]
               + (xs[LEAST(CAST(FLOOR((n - 1) * 0.25) AS BIGINT) + 2, n)]
                  - xs[CAST(FLOOR((n - 1) * 0.25) AS BIGINT) + 1])
                 * ((n - 1) * 0.25 - FLOOR((n - 1) * 0.25)) AS q1,
               xs[CAST(FLOOR((n - 1) * 0.75) AS BIGINT) + 1]
               + (xs[LEAST(CAST(FLOOR((n - 1) * 0.75) AS BIGINT) + 2, n)]
                  - xs[CAST(FLOOR((n - 1) * 0.75) AS BIGINT) + 1])
                 * ((n - 1) * 0.75 - FLOOR((n - 1) * 0.75)) AS q3
        FROM s
    )
    SELECT k AS event_type,
           CAST(n AS BIGINT) AS n_values,
           ROUND(q1, 6) AS q1,
           ROUND(q3, 6) AS q3,
           ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), xs),
                             (a, x) -> a + x) / n, 6) AS mean_raw,
           ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(xs, x -> LEAST(GREATEST(x, q1), q3))),
                             (a, x) -> a + x) / n, 6) AS mean_winsorized
    FROM q
    """,
    tags=("stats", "agg", "ext"),
)
def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-winsorized mean of the metric value per event type (north star
    `winsorized_mean_per_key`): the outlier-immune location estimate
    completing the robust family — MAD is the robust scale, the Tukey
    fences the outlier census, this the robust mean. Quartiles
    interpolate in-row on the exact order-statistic lane (binary-
    fraction q — bit-exact, no grid); both means are in-row left folds
    over the same sorted array (the EWMA fold-replay lane), so the
    oracle replays the identical IEEE sequence."""
    from ..operators.stats import winsorized_mean_per_key

    events = load_table(spark, sf_dir, "events")
    return winsorized_mean_per_key(events, "event_type", "value")
