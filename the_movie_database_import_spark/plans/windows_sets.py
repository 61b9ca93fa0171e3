"""Window functions, sort/limit, set operations, surrogate keys
(SURVEY.md §2 Part C — windows seeded by ref A8 surrogate-key assignment)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.readers import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "q_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rk,
           CAST(dense_rank() OVER w AS BIGINT) AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank (ref A8's surrogate-key machinery,
    `loader.py:161-223`, generalized)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value, 4) AS value_r,
           ROUND(lag(value)  OVER w, 4) AS prev_value,
           ROUND(lead(value) OVER w, 4) AS next_value,
           ROUND(value - COALESCE(lag(value) OVER w, 0), 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event-time per user ([ext])."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value_r"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4).alias(
            "delta"
        ),
    )


@register(
    "q_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
    headline=True,
    tags=("window",),
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with explicit unbounded-preceding frame ([ext])."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(9,2)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@register(
    "q_win_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg_3
    FROM orders
    """,
    tags=("window",),
)
def q_win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame moving average ([ext]): exact decimal frame sum,
    raw double quotient (hash-safe, see relational.py docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(9,2)")).over(w).cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("moving_avg_3"),
    )


@register(
    "q_win_time_range",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(9,2)))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 604800000000 PRECEDING
                                AND CURRENT ROW) AS DOUBLE)
               AS trailing_7d_value,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 604800000000 PRECEDING
                                AND CURRENT ROW) AS BIGINT)
               AS trailing_7d_events
    FROM events WHERE ts IS NOT NULL
    """,
    tags=("window", "events", "ext"),
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day time-RANGE window ([ext]): for every event, the sum
    of `value` and the event count over the user's preceding week — the
    standard trailing-metric frame (`RANGE BETWEEN INTERVAL` semantics),
    distinct from `q_win_sliding_frame`'s ROWS frame: the frame width here
    is set by TIME, not row count, and same-timestamp peers always share a
    frame (no tiebreak can change membership, so the oracle replay is
    exact). Ordering is integer microseconds (`_epoch_us`, adaptive to the
    round's ts encoding); the value sum runs in the exact decimal lane.
    One user-keyed exchange; NULL timestamps are unorderable and excluded,
    as in `sessionize`."""
    from ..operators.analytics import _epoch_us

    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    events = events.withColumn("_us", _epoch_us(events, "ts"))
    week_us = 7 * 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-week_us, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(9,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_value"),
        F.count(F.lit(1)).over(w).alias("trailing_7d_events"),
    )


@register(
    "q_win_ntile_pctrank",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def q_win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over a global ordering ([ext]). A single
    unpartitioned window is a deliberate serial point — acceptable for
    dimension-sized inputs only; at fact scale use approx percentiles."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    headline=True,
    tags=("window", "topk"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment (row_number <= k pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------


@register(
    "q_sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_acctbal >= 0 THEN ROUND(c_acctbal, 2) ELSE NULL END AS pos_bal
    FROM customer
    ORDER BY c_mktsegment ASC, pos_bal DESC NULLS LAST, c_custkey ASC
    """,
    tags=("sort",),
)
def q_sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULLS LAST ([ext]). NULLs are
    manufactured from negative balances to exercise null ordering."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") >= 0, F.round("c_acctbal", 2)).alias("pos_bal"),
    ).orderBy(
        F.col("c_mktsegment").asc(),
        F.col("pos_bal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )


@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark runs this as TakeOrderedAndProject (per-partition
    heaps + driver merge), never a full sort, which is the 100 TB-correct
    plan. Total order via orderkey tiebreak keeps the result deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "q_union_all",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with by-name resolution ([ext])."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    u = customer.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT ([ext])."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) ([ext])."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) ([ext])."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


# ---------------------------------------------------------------------------
# Surrogate keys (ref A8 — the one genuinely stateful reference construct)
# ---------------------------------------------------------------------------


@register(
    "q_surrogate_keys",
    oracle="""
    SELECT event_type,
           CAST(dense_rank() OVER (ORDER BY event_type) AS BIGINT) AS surrogate_id
    FROM (SELECT DISTINCT event_type FROM events)
    """,
    tags=("window", "surrogate"),
)
def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dense surrogate ids over a natural key (ref A8,
    `loader.py:117-118,:161-223`; deviation D1 — ids ordered by natural key,
    not first-appearance, because arrival order is not reproducible in a
    distributed engine)."""
    from ..operators.surrogate import assign_surrogate_ids

    events = load_table(spark, sf_dir, "events")
    return assign_surrogate_ids(events.select("event_type"), "event_type")


@register(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — BAG-semantics difference, the set-op family member
    q_except's DISTINCT semantics can't express: a value appearing 12
    times among customers and 3 times among suppliers survives 9 times
    (multiplicity subtraction), where EXCEPT keeps it zero times. Spark
    plans `exceptAll` as a counted anti-pattern (aggregate counts on
    both sides, subtract, re-generate) — still one shuffle pair on the
    compared columns, no row-by-row anti join."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(
        F.col("c_nationkey").alias("nationkey")
    ).exceptAll(supplier.select(F.col("s_nationkey").alias("nationkey")))


@register(
    "q_unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, name AS measure, value
    FROM (
        SELECT l_orderkey, l_linenumber,
               l_quantity, l_extendedprice, l_discount, l_tax
        FROM lineitem WHERE l_orderkey <= 1000
    )
    UNPIVOT (value FOR name IN (l_quantity, l_extendedprice,
                                l_discount, l_tax))
    """,
    tags=("relational", "reshape"),
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the wide-to-long reshape (inverse of
    q_agg_pivot): the four lineitem measures become (measure, value)
    rows, the shape every per-measure census/plotting pipeline wants.
    Spark's native `unpivot` (3.4+) expands in-plan — one scan, a 4x
    in-row row generation, NO shuffle (pure Expand node); the id filter
    keeps the oracle comparison bounded."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "value",
        )
    )


@register(
    "q_union_schema_evolution",
    oracle="""
    SELECT doc_id, lang, source, n_chars, NULL AS quality_note
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL BY NAME
    SELECT doc_id, lang, 'resubmission' AS quality_note
    FROM documents WHERE doc_id % 2 = 1
    """,
    tags=("setop", "schema"),
)
def q_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — `unionByName(allowMissingColumns)`: two
    snapshot generations with DIFFERENT columns (the new batch gained
    `quality_note`, dropped `source`/`n_chars`) union by NAME with
    NULLs filling the gaps — the operation every long-lived dataset
    needs the day its producer adds a field (positional UNION would
    silently misalign columns instead). Pure in-plan projection
    alignment: one scan per side, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    old_gen = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "source", "n_chars"
    )
    new_gen = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.lit("resubmission").alias("quality_note")
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)
