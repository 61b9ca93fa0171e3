"""Event-time window aggregations — batch twins of the streaming operators
(SURVEY.md §2 streaming; `window()`/`session_window()` work identically in
batch, which is how the DuckDB oracle checks them; the live-stream versions
in :mod:`..streaming.windows` are validated by batch/stream parity tests).

The reference has no streaming at all (SURVEY.md §2.1) — this is [ext]
surface driven by the `events` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.readers import load_table
from .registry import register


def _ts_str(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


@register(
    "q_window_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    tags=("streaming", "window"),
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch twin of
    `stream_tumbling_window_agg`)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(9,2)")).cast("double").alias("total_value"),
        )
        .select(
            _ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_window_sliding",
    oracle="""
    WITH hops AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM hops
    GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute hop — every event lands in
    two windows (batch twin of `stream_sliding_window_agg`). The oracle
    materializes the two hops explicitly."""
    events = load_table(spark, sf_dir, "events")
    # Hash-safe average (see relational.py module docstring): exact decimal
    # sum, raw double quotient — ROUND disagrees between engines at halfway.
    avg_value = F.sum(F.col("value").cast("decimal(9,2)")).cast("double") / F.count("value")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n_events"), avg_value.alias("avg_value"))
        .select(
            _ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "q_window_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "window", "session"),
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user (batch twin
    of `stream_session_window`). The oracle derives sessions with the classic
    gaps-and-islands formulation; Spark's `session_window` must agree."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(9,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            _ts_str(F.col("session_window.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_window_watermark",
    oracle="""
    WITH agg AS (
        SELECT date_trunc('hour', ts) AS ws, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           n_events
    FROM agg
    WHERE ws + INTERVAL 2 HOUR <= (SELECT max(ts) FROM events)
    """,
    tags=("streaming", "window", "watermark"),
)
def q_window_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finalized-window subset under a 1-hour watermark — deterministic batch
    twin of `stream_watermark_late_data` (streaming/windows.py
    `watermarked_tumbling_agg`): with watermark = max(event_time) - 1h, append
    mode emits exactly the tumbling windows whose end precedes the watermark,
    i.e. window_start + 2h <= max(ts). The second scan reads only `ts`
    (column-pruned) and the 1-row max is broadcast, so the fact table is
    scanned once per side and never shuffled beyond the window agg."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    wm = events.agg(F.max("ts").alias("max_ts"))
    return (
        agg.crossJoin(F.broadcast(wm))
        .filter(F.col("window.start") + F.expr("INTERVAL 2 HOUR") <= F.col("max_ts"))
        .select(
            _ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "q_stateful_user_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value * 100 AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "udf"),
)
def q_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals — batch twin of the
    ``applyInPandasWithState`` custom stateful operator
    (streaming/windows.py `stateful_user_totals`). Money is accumulated as
    integer cents so cross-batch state updates are associative and exact;
    the streaming version's final per-key emission must equal this batch
    aggregate (asserted across 4 micro-batches in tests/test_streaming.py).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("total_cents"),
    )


@register(
    "q_dedup_first_event",
    oracle="""
    SELECT user_id, event_type, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
    """,
    tags=("streaming", "dedup"),
)
def q_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — the deterministic batch twin of
    streaming `dropDuplicatesWithinWatermark` keyed on (user_id, event_type)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", _ts_str("ts").alias("first_ts"))
    )


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS lag_s
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 2 HOUR
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution interval join — batch twin of the
    stream-stream event-time join (streaming/windows.py
    `interval_join_views_to_purchases`; parity in tests/test_streaming.py).
    Equi key user_id + bounded time range is the shape that keeps streaming
    state finite (watermark evicts views older than the lag horizon) and
    keeps the batch plan a plain sort-merge join — no cartesian, no
    unbounded buffering on either execution model."""
    events = load_table(spark, sf_dir, "events")
    from ..streaming.windows import interval_join_views_to_purchases

    return interval_join_views_to_purchases(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
    )
