"""Event-sequence analytics + lexical-retrieval queries ([ext]): funnel
conversion, cohort retention (operators/analytics.py) and BM25 top-k
ranking (operators/ranking.py). All three are fully SQL-expressible and
oracle-checked; the reference (`loader.py`) has no event-log or
text-ranking surface, so these extend the north-star set the same way the
dedup/similarity/curation families do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.analytics import (
    funnel_counts,
    resample_daily_ffill,
    retention_cohorts,
    sessionize,
)
from ..operators.ranking import bm25_oracle_sql, bm25_topk
from ..sources.readers import load_table
from .registry import register

# Stage sequence for the funnel query: the driver-generated event log's
# natural conversion path. Types are drawn uniformly, so each successive
# stage loses users only through ordering, which keeps all three counts
# large and the query discriminative.
FUNNEL_STAGES = ("view", "click", "purchase")

# Query-term bag for the BM25 query: frequent-but-not-universal tokens of
# the synthetic vocabulary, so idf and tf-saturation both move the scores.
BM25_TERMS = ("vector", "stream", "merge", "window")


@register(
    "q_events_funnel",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = '{FUNNEL_STAGES[0]}' AND ts IS NOT NULL
        GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s1.t
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s2.t
        GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS stage_idx, '{FUNNEL_STAGES[0]}' AS stage,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(2 AS BIGINT), '{FUNNEL_STAGES[1]}',
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT CAST(3 AS BIGINT), '{FUNNEL_STAGES[2]}',
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
    tags=("events", "analytics", "ext"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel view -> click -> purchase over the
    event log (north star `events_funnel`): per stage, how many users have
    completed the stage prefix at strictly increasing timestamps. ONE
    user-keyed shuffle — per-user events are collected, sorted, and folded
    in-row with `F.aggregate` (whole-stage codegen, no per-stage
    self-joins); the oracle replays the textbook chained-MIN(ts)
    formulation, which greedy-earliest folding provably equals (see
    operators/analytics.funnel_counts)."""
    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, FUNNEL_STAGES)


@register(
    "q_retention_cohorts",
    oracle="""
    WITH f AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
        FROM events WHERE ts IS NOT NULL
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, d.active_day) AS BIGINT)
             AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY f.cohort_day, offset_days
    """,
    tags=("events", "analytics", "ext"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention matrix (north star `retention_cohorts`): users
    cohorted by first-activity day; each (cohort_day, offset_days) cell
    counts distinct cohort users active that many days later. ONE
    user-keyed shuffle — MIN(day) and the distinct-day set come from the
    same hash aggregate, the explode is already user-deduped, so the final
    census is a plain map-side-combinable COUNT (the oracle's
    DISTINCT-then-join formulation, collapsed). The cohort day is emitted
    as an ISO string — DuckDB date32 and Spark DateType round-trip to
    different pandas dtypes (q_date_fns precedent)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    return retention_cohorts(events).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "offset_days",
        "n_users",
    )


@register(
    "q_bm25_topk",
    oracle=bm25_oracle_sql(BM25_TERMS),
    tags=("text", "ranking", "ext"),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 over the documents table for a 4-term query
    (north star `bm25_topk`): the lexical-retrieval baseline beside the
    embedding ANN operators. One corpus shuffle — per-term tfs are
    conditional aggregate columns of the same groupBy that counts document
    length, corpus stats broadcast back as one row, and per-term
    contributions are floor-quantized onto the 1e-6 grid BEFORE summing so
    the score is an exact BIGINT on both engines (grid safety pinned at
    every SF by tests/test_analytics.py). Top-k runs as
    TakeOrderedAndProject with an id tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=10)


@register(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events WHERE ts IS NOT NULL
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("events", "analytics", "scd", "ext"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build (north star `scd2_history`): the event
    log's per-user attribute stream collapsed into validity intervals
    (valid_from/valid_to, version, is_current) — the warehouse structure
    for as-at queries. One user-keyed window exchange: the change-point
    lag filter and the lead/row_number interval builder share partitioning
    and sort order (plan-pinned). Timestamps emit as seconds-resolution
    strings (q_dedup_first_event precedent); the (ts, event_id) tiebreak
    makes both engines' orders total and identical."""
    from ..operators.analytics import scd2_history

    events = load_table(spark, sf_dir, "events")
    out = scd2_history(events)
    from pyspark.sql import functions as F

    return out.select(
        "user_id",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "version",
        "is_current",
    )


@register(
    "q_data_quality_audit",
    oracle="""
    WITH one AS (
        SELECT COUNT(*) AS total,
          SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v0,
          SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                     OR l_quantity > 50 THEN 1 ELSE 0 END) AS v1,
          SUM(CASE WHEN l_extendedprice IS NULL
                     OR l_extendedprice < 0 THEN 1 ELSE 0 END) AS v2,
          SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
                     OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v3,
          SUM(CASE WHEN l_returnflag IS NULL
                     OR l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v4,
          COUNT(DISTINCT (l_orderkey, l_linenumber)) AS u0
        FROM lineitem
    )
    SELECT 'not_null(l_orderkey)' AS check_name, CAST(v0 AS BIGINT) AS violations,
           CAST(total AS BIGINT) AS total, v0 = 0 AS passed FROM one
    UNION ALL SELECT 'range(l_quantity,1,50)', CAST(v1 AS BIGINT),
           CAST(total AS BIGINT), v1 = 0 FROM one
    UNION ALL SELECT 'non_negative(l_extendedprice)', CAST(v2 AS BIGINT),
           CAST(total AS BIGINT), v2 = 0 FROM one
    UNION ALL SELECT 'range(l_discount,0,0.1)', CAST(v3 AS BIGINT),
           CAST(total AS BIGINT), v3 = 0 FROM one
    UNION ALL SELECT 'accepted_values(l_returnflag,[A,N,R])', CAST(v4 AS BIGINT),
           CAST(total AS BIGINT), v4 = 0 FROM one
    UNION ALL SELECT 'unique(l_orderkey,l_linenumber)',
           CAST(total - u0 AS BIGINT), CAST(total AS BIGINT), total - u0 = 0
    FROM one
    """,
    tags=("quality", "audit", "ext"),
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over lineitem (north star
    `data_quality_audit`): five predicate constraints plus a composite-key
    uniqueness check evaluated Deequ-style in one pass — the load gate the
    reference delegates to PostgreSQL FK triggers (`loader.py:67-78`),
    generalized engine-side. All predicate checks share ONE global
    aggregate (conditional sums, no shuffle of data rows); the uniqueness
    check rides the same aggregate as a count-distinct; the 6-row report
    explodes in-row from the one-row aggregate — nothing collects to the
    driver (plan-pinned in tests/test_plans.py)."""
    from ..operators.quality import (
        audit,
        check_accepted_values,
        check_non_negative,
        check_not_null,
        check_range,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return audit(
        li,
        [
            check_not_null("l_orderkey"),
            check_range("l_quantity", 1, 50),
            check_non_negative("l_extendedprice"),
            check_range("l_discount", 0, 0.1),
            check_accepted_values("l_returnflag", ["A", "N", "R"]),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
    )


@register(
    "q_fuzzy_name_pairs",
    oracle="""
    WITH v AS (
        SELECT DISTINCT c_custkey AS id, c_name AS name,
               CASE WHEN i = 0 THEN c_name
                    ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
               END AS variant
        FROM customer, unnest(generate_series(0, len(c_name))) AS g(i)
    ),
    cnt AS (SELECT variant, COUNT(*) AS n FROM v GROUP BY variant),
    kept AS (
        SELECT v.id, v.name, v.variant
        FROM v JOIN cnt ON v.variant = cnt.variant WHERE cnt.n <= 64
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.name AS name_a, b.name AS name_b
        FROM kept a JOIN kept b ON a.variant = b.variant AND a.id < b.id
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
    tags=("fuzzy", "dedup", "ext"),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching (north star `fuzzy_pairs_edit1`): all customer
    name pairs within Levenshtein distance 1, via symmetric-delete
    blocking — each name explodes into its deletion neighborhood IN-ROW,
    candidates come from one variant-keyed equi-join (8-byte xxhash64
    keys; the oracle joins the variant strings — identical verdicts up to
    astronomically unlikely hash collisions, which verification would
    remove anyway), and the exact integer Levenshtein DP verifies. Never
    all-pairs; the >64-per-variant hot-block cap is mirrored in the
    oracle and is a no-op on this data. Distance-0 (exact duplicates) and
    distance-1 (one typo) both surface — the string-side counterpart of
    the MinHash document pipeline."""
    from ..operators.fuzzy import fuzzy_pairs_edit1

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    return fuzzy_pairs_edit1(cust, "id", "name")


@register(
    "q_numeric_histogram",
    oracle="""
    WITH s AS (
        SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo,
               CAST(MAX(l_extendedprice) AS DOUBLE) AS hi
        FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    b AS (
        SELECT CASE WHEN s.hi > s.lo
                    THEN LEAST(19, CAST(floor(
                        (CAST(l_extendedprice AS DOUBLE) - s.lo) * 20
                          / (s.hi - s.lo)) AS BIGINT))
                    ELSE 0 END AS bin_id,
               s.lo AS lo, s.hi AS hi
        FROM lineitem, s WHERE l_extendedprice IS NOT NULL
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           lo + bin_id * (hi - lo) / 20 AS bin_lo,
           lo + (bin_id + 1) * (hi - lo) / 20 AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bin_id, lo, hi
    """,
    tags=("quality", "profiling", "ext"),
)
def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of lineitem prices (north star
    `numeric_histogram`): the numeric-profiling companion of the
    constraint audit. One tiny min/max aggregate broadcasts back in-plan
    and the census is one map-side-combined aggregate on the bin id; the
    bin arithmetic is pure +,-,*,/ floor in IDENTICAL shapes on both
    engines, so the hash comparison is exact with no quantization grid
    (library-function-free arithmetic is bit-deterministic across
    engines)."""
    from ..operators.quality import numeric_histogram

    li = load_table(spark, sf_dir, "lineitem")
    return numeric_histogram(li, "l_extendedprice", n_bins=20)


# Gap for q_events_sessionize: the synthetic log is SPARSE (median
# inter-event gap ~7h at sf0.01), so the classic 30-minute web gap would
# make nearly every event its own session. Six hours splits each user's
# month of activity into a discriminative mix of multi-event sessions and
# singletons at every SF.
SESSION_GAP_SECONDS = 21_600


@register(
    "q_events_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_us
        FROM events WHERE ts IS NOT NULL
    ),
    numbered AS (
        SELECT user_id, ts, value,
               CAST(SUM(CASE WHEN prev_us IS NULL
                             OR us - prev_us > {SESSION_GAP_SECONDS * 1_000_000}
                             THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS BIGINT) AS session_idx
        FROM ordered
    )
    SELECT user_id, session_idx,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0
                AS DOUBLE) AS duration_secs,
           CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
    headline=False,
    tags=("events", "analytics", "ext"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization ([ext]): one summary row per (user, idle-
    gap-delimited session) — batch twin of `q_window_session`'s streaming
    `session_window`. Membership is a pure function of each user's sorted
    timestamps (ties share a zero gap), so the oracle's window replay is
    hash-exact; durations are integer-microsecond arithmetic and the value
    rollup runs in the exact decimal lane. Timestamps emit as
    microsecond-resolution strings (q_scd2_history precedent, full
    fidelity)."""
    events = load_table(spark, sf_dir, "events")
    out = sessionize(events, gap_seconds=SESSION_GAP_SECONDS)
    return out.select(
        "user_id",
        "session_idx",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "n_events",
        "duration_secs",
        "total_value",
    )


@register(
    "q_resample_daily",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               (MAX(CASE WHEN value IS NOT NULL
                         THEN {'u': epoch_us(ts), 't': event_id, 'v': value}
                    END)).v AS obs_value,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS day_value
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
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           last_value(d.obs_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(d.day_value, 0.0) AS day_value
    FROM grid g LEFT JOIN daily d USING (user_id, day)
    """,
    headline=False,
    tags=("events", "analytics", "ext"),
)
def q_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample + forward fill ([ext]): densify each user's sparse
    event log onto their active-span daily grid, carrying the latest
    non-null observation across gap days — the pandas
    ``resample('D').last().ffill()`` panel, distributed. The per-day
    observation is a struct-MAX aggregate (deterministic under any
    partitioning) and the day sum runs in the exact decimal lane, so the
    oracle replay is hash-exact. Day emits as a 'yyyy-MM-dd' string
    (q_scd2_history precedent: cross-engine date dtypes differ in pandas,
    strings don't)."""
    events = load_table(spark, sf_dir, "events")
    out = resample_daily_ffill(events)
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value_ffill",
        "n_events",
        "day_value",
    )


@register(
    "q_value_outliers",
    oracle="""
    WITH vals AS (
        SELECT event_type, CAST(value AS DOUBLE) AS v
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, list_sort(list(v)) AS vs,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM vals GROUP BY event_type
    ),
    q AS (
        SELECT event_type, n,
               vs[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1]
                 + (vs[LEAST(CAST(floor(0.25 * (n - 1)) AS BIGINT) + 2, n)]
                    - vs[CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1])
                   * (0.25 * (n - 1) - floor(0.25 * (n - 1))) AS q1,
               vs[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1]
                 + (vs[LEAST(CAST(floor(0.75 * (n - 1)) AS BIGINT) + 2, n)]
                    - vs[CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1])
                   * (0.75 * (n - 1) - floor(0.75 * (n - 1))) AS q3
        FROM g
    ),
    fences AS (
        SELECT event_type, n, q1, q3,
               q1 - 1.5 * (q3 - q1) AS lo_fence,
               q3 + 1.5 * (q3 - q1) AS hi_fence
        FROM q
    )
    SELECT f.event_type, f.n, f.q1, f.q3, f.lo_fence, f.hi_fence,
           CAST(COUNT(CASE WHEN e.v < f.lo_fence THEN 1 END) AS BIGINT)
               AS n_low,
           CAST(COUNT(CASE WHEN e.v > f.hi_fence THEN 1 END) AS BIGINT)
               AS n_high,
           CAST(COUNT(CASE WHEN e.v < f.lo_fence THEN 1 END)
                + COUNT(CASE WHEN e.v > f.hi_fence THEN 1 END) AS BIGINT)
               AS n_outliers
    FROM vals e JOIN fences f USING (event_type)
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
    headline=False,
    tags=("events", "quality", "ext"),
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Tukey-fence outlier census ([ext]): exact
    order-statistic quartiles (engine-identical interpolation arithmetic
    — see operators/quality.value_outliers for why this needs NO
    quantization grid, unlike library quantile_cont), 1.5-IQR fences, and
    below/above counts. The fence table broadcasts; data shuffles once as
    (type, value) pairs."""
    from ..operators.quality import value_outliers

    events = load_table(spark, sf_dir, "events")
    return value_outliers(events, "event_type", "value")


# FK relationships of the testdata star schema, plus the event log's
# user->customer link (the one expected to have orphans: user ids are
# drawn independently of the customer table).
FK_SPECS = (
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("events.user_id->customer.c_custkey", "events", "user_id",
     "customer", "c_custkey"),
)


def _fk_oracle() -> str:
    parts = []
    for name, child, fk, parent, pk in FK_SPECS:
        parts.append(f"""
    SELECT '{name}' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN c.{fk} IS NULL THEN 1 END) AS BIGINT)
               AS n_null_fk,
           CAST(COUNT(CASE WHEN c.{fk} IS NOT NULL AND p._pk IS NULL
                      THEN 1 END) AS BIGINT) AS n_orphans,
           COUNT(CASE WHEN c.{fk} IS NOT NULL AND p._pk IS NULL
                 THEN 1 END) = 0 AS ok
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} AS _pk FROM {parent}) p
           ON c.{fk} = p._pk""")
        
    return "\nUNION ALL\n".join(parts)


@register(
    "q_fk_orphan_audit",
    oracle=_fk_oracle(),
    headline=False,
    tags=("quality", "audit", "ext"),
)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the whole star schema ([ext],
    engine twin of the reference's PostgreSQL FK constraints,
    loader.py:67-78): per declared FK, row/NULL-FK/orphan counts and an
    ok verdict. Eight independent one-pass subtrees unioned in-plan;
    parents' distinct key sets join unhinted (AQE broadcasts the small
    ones). The events.user_id link is the designed-dirty row."""
    from ..operators.quality import fk_orphan_audit

    specs = [
        (name, load_table(spark, sf_dir, child), fk,
         load_table(spark, sf_dir, parent), pk)
        for name, child, fk, parent, pk in FK_SPECS
    ]
    return fk_orphan_audit(specs)


@register(
    "q_events_ewma",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.25 * x + 0.75 * acc) AS ewma
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
    """,
    headline=False,
    tags=("events", "analytics", "ext"),
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the value stream ([ext], α=0.25): a sequential
    recurrence run as an IN-ROW strict left fold over each user's
    time-ordered values — one user shuffle, whole-stage codegen, and the
    oracle's list_reduce replays the identical IEEE operation sequence,
    so with a binary-fraction α the result is bit-exact with NO grid
    (see operators/analytics.ewma_per_key)."""
    from ..operators.analytics import ewma_per_key

    events = load_table(spark, sf_dir, "events")
    return ewma_per_key(events, alpha=0.25)


@register(
    "q_benford_audit",
    oracle="""
    WITH v AS (
        SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS n
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(n AS VARCHAR), 1, 1) AS INT) AS digit FROM v
    ),
    g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS total FROM g)
    SELECT digit, n_obs,
           CAST(n_obs AS DOUBLE) / t.total AS frac,
           CASE digit
               WHEN 1 THEN 0.3010299956639812
               WHEN 2 THEN 0.17609125905568124
               WHEN 3 THEN 0.12493873660829992
               WHEN 4 THEN 0.09691001300805642
               WHEN 5 THEN 0.07918124604762482
               WHEN 6 THEN 0.06694678963061322
               WHEN 7 THEN 0.05799194697768673
               WHEN 8 THEN 0.05115252244738129
               WHEN 9 THEN 0.04575749056067514
           END AS expected_p,
           (CAST(n_obs AS DOUBLE) / t.total)
             - (CASE digit
               WHEN 1 THEN 0.3010299956639812
               WHEN 2 THEN 0.17609125905568124
               WHEN 3 THEN 0.12493873660829992
               WHEN 4 THEN 0.09691001300805642
               WHEN 5 THEN 0.07918124604762482
               WHEN 6 THEN 0.06694678963061322
               WHEN 7 THEN 0.05799194697768673
               WHEN 8 THEN 0.05115252244738129
               WHEN 9 THEN 0.04575749056067514
                END) AS excess
    FROM g CROSS JOIN t
    """,
    headline=False,
    tags=("quality", "audit", "ext"),
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census over lineitem prices ([ext] fraud/
    degeneracy screen): exact integer digit extraction (no soft log10 —
    see operators/quality.benford_census), Python-rendered expected
    probabilities baked into both plans, one scan + 9-row census."""
    from ..operators.quality import benford_census

    lineitem = load_table(spark, sf_dir, "lineitem")
    return benford_census(lineitem, "l_extendedprice")



@register(
    "q_interval_coalesce",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               o_orderdate AS s,
               o_orderdate + to_days(CAST(o_orderkey % 60 + 1 AS INT)) AS e
        FROM orders
        WHERE o_orderdate IS NOT NULL
    ),
    flagged AS (
        SELECT o_custkey, s, e,
               CASE WHEN MAX(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR s > MAX(e) OVER (
                        PARTITION BY o_custkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS new_span
        FROM iv
    ),
    spans AS (
        SELECT o_custkey, s, e,
               SUM(new_span) OVER (
                   PARTITION BY o_custkey ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS span_id
        FROM flagged
    )
    SELECT o_custkey,
           CAST(span_id AS BIGINT) AS span_id,
           strftime(MIN(s), '%Y-%m-%d %H:%M:%S') AS span_start,
           strftime(MAX(e), '%Y-%m-%d %H:%M:%S') AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM spans
    GROUP BY o_custkey, span_id
    """,
    tags=("analytics", "intervals", "ext"),
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing (`coalesce_intervals`): each
    customer's order-activity intervals — [o_orderdate, o_orderdate +
    (o_orderkey % 60 + 1) days], deterministic heterogeneous durations —
    merged into maximal disjoint activity spans. Distinct from sessionize:
    a long interval swallows later short ones (running-MAX-of-ends rule,
    not lag(end) — the textbook island bug). One customer-keyed shuffle
    end to end: the running-max window, span-numbering sum, and the
    (key, span_id) rollup all reuse a single Exchange."""
    from ..operators.analytics import coalesce_intervals

    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        F.expr(
            "timestampadd(DAY, CAST(o_orderkey % 60 + 1 AS INT), o_orderdate)"
        ).alias("e"),
    )
    out = coalesce_intervals(iv, "o_custkey", "s", "e")
    # timestamps ride out as formatted strings — the driver's value hash is
    # dtype-sensitive and pandas ns-vs-us units differ across engines (the
    # q_events_sessionize convention)
    return out.select(
        "o_custkey",
        F.col("span_id").cast("bigint").alias("span_id"),
        F.date_format("span_start", "yyyy-MM-dd HH:mm:ss").alias("span_start"),
        F.date_format("span_end", "yyyy-MM-dd HH:mm:ss").alias("span_end"),
        F.col("n_intervals").cast("bigint").alias("n_intervals"),
    )


@register(
    "q_er_sorted_neighborhood",
    oracle="""
    WITH ranked AS (
        SELECT p_partkey AS id, p_name AS key,
               CAST(ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS BIGINT)
                   AS rnk
        FROM part
    )
    SELECT a.id AS id_a, a.key AS key_a, CAST(a.rnk AS BIGINT) AS rank_a,
           b.id AS id_b, b.key AS key_b, CAST(b.rnk AS BIGINT) AS rank_b
    FROM ranked a JOIN ranked b
      ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
    """,
    tags=("fuzzy", "blocking", "ext"),
)
def q_er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández-Stolfo SNM, the classic ER
    candidate generator): all part pairs whose global (p_name, p_partkey)
    sort ranks differ by at most 3 — a window-4 slide down the sorted
    order, exactly n x 3 candidate pairs minus the tail. The global rank
    is the distributed range-partition + broadcast-offsets pattern (no
    single-partition window), and pairing is ONE equi-join on rank-div-
    window blocks with the left side duplicated into two probe buckets —
    linear, never a theta-join. The oracle replays the same total order
    with a window self-join; ranks are engine-independent because the
    (key, id) order is total."""
    from ..operators.fuzzy import sorted_neighborhood_pairs

    part = load_table(spark, sf_dir, "part")
    out = sorted_neighborhood_pairs(
        part.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("key")),
        "id",
        "key",
        window=4,
    )
    return out.select("id_a", "key_a", "rank_a", "id_b", "key_b", "rank_b")


@register(
    "q_key_skew_census",
    oracle="""
    WITH counts AS (
        SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt
        FROM counts
    ),
    top AS (
        SELECT key, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS BIGINT)
                   AS rank
        FROM counts
        ORDER BY cnt DESC, key ASC
        LIMIT 10
    )
    SELECT rank, key, cnt,
           round(cnt * 1.0 / n_rows, 6) AS share,
           n_keys, n_rows,
           round(max_cnt * n_keys * 1.0 / n_rows, 4) AS skew_ratio
    FROM top, stats
    """,
    tags=("skew", "diagnostics", "ext"),
)
def q_key_skew_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics (`key_skew_census`): the 10 heaviest event
    user_ids with their global share and the distribution's skew ratio
    (heaviest group / mean group) — the census a 100 TB operator runs
    before choosing broadcast vs salted vs plain shuffle join on a key.
    One map-side-combinable groupBy(key) count, a TakeOrdered top-k, and
    a single-row global aggregate broadcast onto k rows; nothing
    corpus-sized survives the first aggregate."""
    from ..operators.skew import key_skew_census

    events = load_table(spark, sf_dir, "events")
    return key_skew_census(events, "user_id", top_k=10)


@register(
    "q_km_survival",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS t0,
             MAX(CAST(ts AS DATE)) AS t1
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    obs AS (SELECT MAX(CAST(ts AS DATE)) AS obs_end FROM events),
    lif AS (
      SELECT CASE WHEN datediff('day', t1, obs_end) >= 7 THEN 1 ELSE 0 END
               AS churned,
             CAST(CASE WHEN datediff('day', t1, obs_end) >= 7
                  THEN datediff('day', t0, t1)
                  ELSE datediff('day', t0, obs_end) END AS BIGINT)
               AS duration_days
      FROM pu CROSS JOIN obs
    ),
    census AS (
      SELECT duration_days,
             CAST(SUM(churned) AS BIGINT) AS n_events,
             CAST(SUM(1 - churned) AS BIGINT) AS n_censored
      FROM lif GROUP BY duration_days
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lif),
    ar AS (
      SELECT c.*,
             CAST(t.n_total - COALESCE(SUM(n_events + n_censored) OVER (
                 ORDER BY duration_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
      FROM census c CROSS JOIN tot t
    ),
    st AS (
      SELECT *,
        CASE WHEN n_events = 0 THEN CAST(0 AS BIGINT)
             WHEN n_events < n_at_risk THEN CAST(floor(1000000 * ln(
               CAST(n_at_risk - n_events AS DOUBLE) / n_at_risk))
               AS BIGINT)
             ELSE NULL END AS f,
        MAX(CASE WHEN n_events = n_at_risk THEN 1 ELSE 0 END) OVER (
          ORDER BY duration_days
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS km_zero
      FROM ar
    )
    SELECT duration_days, n_at_risk, n_events, n_censored,
           (1000000 * n_events) // n_at_risk AS hazard_q6,
           CASE WHEN km_zero THEN NULL
                ELSE CAST(SUM(f) OVER (
                  ORDER BY duration_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) END AS km_log_q6,
           km_zero
    FROM st
    """,
    tags=("events", "stats", "ext"),
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier user-lifetime survival curve with right-censoring
    (north star `km_survival`, r13): per distinct lifetime duration, the
    risk set, churn events, censored exits, the exact-integer hazard, and
    the KM survival product carried in grid-quantized log space
    (`km_log_q6` — the running BIGINT sum of floored ln factors, the
    `unigram_nll` integer-ln lane), so the driver hash certifies the
    cumulative product itself. Censoring via the 7-day activity gap
    against the corpus's final observed day. Every window runs over the
    bounded duration census (≤ observation span in days), never over
    users or events."""
    from ..operators.analytics import km_survival

    events = load_table(spark, sf_dir, "events")
    return km_survival(events, churn_gap_days=7)
