from .sinks import (  # noqa: F401
    jdbc_exactly_once_batch_writer,
    run_to_jdbc_exactly_once,
)
from .windows import (  # noqa: F401
    stream_events,
    stream_incremental_dedup,
    stream_jsonl,
    stream_minhash_dedup,
    stream_span_dedup,
    tumbling_agg,
    sliding_agg,
    session_agg,
    dedup_within_watermark,
    interval_join_views_to_purchases,
    stateful_user_totals,
    stream_cusum,
    stream_funnel,
    stream_heavy_hitters,
    run_to_memory,
    run_to_parquet,
)
