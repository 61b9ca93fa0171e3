"""UDF / UDAF / UDTF surface (SURVEY.md §2 Part C "UDF surface") plus
GROUPING SETS.

The reference has no UDF registry — every transform is ad-hoc row-at-a-time
Python (`loader.py:120,:249,:294,:323`); the one place the new engine
genuinely needs Python is the Python-repr nested-cell parser
(etl/parse.py, SURVEY.md §7.4). These queries expose the standard PySpark
Python-execution tiers as engine operators, each with a DuckDB oracle so the
Arrow path itself is correctness-gated:

- pandas_udf scalar     → vectorized per-row compute (Arrow batches)
- pandas_udf grouped agg → custom aggregate over a group
- applyInPandas         → full per-group UDTF-style transform

Hash-parity design: UDF bodies stick to integer arithmetic and exact
rational division (identical IEEE operands on both engines) — never
order-dependent float accumulation, which would hash-mismatch (see
plans/relational.py float policy). That is also the 100 TB posture: these
run as Arrow-vectorized batches inside executors, no driver collect, no
per-row Python round trips.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DoubleType, LongType

from ..sources.readers import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Scalar Pandas UDF: deterministic shard assignment
# ---------------------------------------------------------------------------

SHARD_A = 2_654_435_761  # Knuth multiplicative constant
SHARD_MOD = 1 << 20
SHARD_BUCKETS = 64


@F.pandas_udf(LongType())
def _shard_bucket(orderkey: pd.Series, custkey: pd.Series) -> pd.Series:
    """Vectorized multiplicative-hash shard id. Pure int64 arithmetic kept
    under 2^63 (inputs are bounded by the mod), bit-identical on any engine.
    """
    mixed = (orderkey % SHARD_MOD) * (SHARD_A % SHARD_MOD) + custkey % SHARD_MOD
    return (mixed % SHARD_MOD) % SHARD_BUCKETS


@register(
    "q_pandas_udf_scalar",
    oracle=f"""
    SELECT CAST(((o_orderkey % {SHARD_MOD}) * ({SHARD_A} % {SHARD_MOD})
                 + o_custkey % {SHARD_MOD}) % {SHARD_MOD} % {SHARD_BUCKETS}
                AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    """,
    headline=True,
    tags=("udf", "pandas_udf"),
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Arrow-vectorized pandas_udf (SURVEY.md §2 `pandas_udf_scalar`):
    deterministic shard assignment — the sharding primitive a 100 TB
    pipeline uses to split a corpus into fixed work units. Executed per
    Arrow batch inside executors; the groupBy proves the UDF output feeds
    normal relational operators."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            _shard_bucket(F.col("o_orderkey"), F.col("o_custkey")).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Grouped-agg Pandas UDF: exact median
# ---------------------------------------------------------------------------


@F.pandas_udf(DoubleType())
def _median_qty(qty: pd.Series) -> float:
    """Exact median — order-insensitive by construction (sorts internally),
    and lineitem quantities are small integers stored as doubles, so the
    even-count midpoint average is an exact .0/.5 — hash-safe cross-engine.
    """
    return float(qty.median())


@F.pandas_udf(LongType())
def _count_qty(qty: pd.Series) -> int:
    """Companion count: Spark disallows mixing group-agg pandas UDFs with
    JVM aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    count rides the same Arrow batch."""
    return int(qty.count())


@register(
    "q_pandas_udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(MEDIAN(l_quantity) AS DOUBLE) AS median_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "pandas_udf", "agg"),
)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (SURVEY.md §2 `pandas_udf_grouped_agg`):
    a custom aggregate (exact median) Spark's hash-agg can't do natively
    without approx_percentile. The group's values stream to the UDF as one
    Arrow batch; groups shuffle independently, so this scales with the
    number of groups, not total rows per executor."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        _median_qty(F.col("l_quantity")).alias("median_qty"),
        _count_qty(F.col("l_quantity")).alias("n"),
    )


# ---------------------------------------------------------------------------
# applyInPandas: per-group rank-percentile transform
# ---------------------------------------------------------------------------


N_SHARDS = 64


def _pct_of_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-customer rank percentile, computed for every customer in one
    shard's frame: rank by totalprice desc (orderkey tiebreak) over the
    customer's orders as an exact rational of the group size. rank/count
    divides identical int64 operands on both engines — exact IEEE, no
    accumulation.

    The shard granularity is the scale-critical choice: one pandas frame
    per CUSTOMER (15k tiny groups at sf0.1) pays per-group Arrow overhead
    ~65x the useful work (measured 26s vs 0.4s); sharding the shuffle key
    down to N_SHARDS frames and vectorizing the per-customer logic with
    pandas groupby inside the frame keeps the same semantics at
    bulk-transfer cost."""
    pdf = pdf.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    ).reset_index(drop=True)
    grp = pdf.groupby("o_custkey", sort=False)
    rank = (grp.cumcount() + 1).astype("int64")
    n = grp["o_orderkey"].transform("size").astype("int64")
    pdf["pct_rank_in_cust"] = (rank / n).astype("float64")
    return pdf[["o_custkey", "o_orderkey", "o_totalprice", "pct_rank_in_cust"]]


@register(
    "q_applyinpandas_group_pct",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey)
                AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY o_custkey) AS pct_rank_in_cust
    FROM orders
    """,
    headline=True,
    tags=("udf", "applyinpandas", "udtf"),
)
def q_applyinpandas_group_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group transform (SURVEY.md §2
    `udtf_explode_custom` / `applyInPandas`): each customer's orders arrive
    as one pandas frame, are re-emitted with a group-local percentile —
    the shape of any group-local normalization (z-score, min-max, quantile
    bin) a training-data pipeline applies per source/domain. The shuffle
    key is a SHARD of the customer key (see _pct_of_shard: tiny per-group
    frames pay ~65x Arrow overhead), and per-customer logic is vectorized
    inside each shard frame — same result, bulk-transfer cost."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.pmod(F.col("o_custkey"), F.lit(N_SHARDS)).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(
            _pct_of_shard,
            schema="o_custkey long, o_orderkey long, o_totalprice double, "
            "pct_rank_in_cust double",
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (beyond rollup/cube: an arbitrary, non-hierarchical set list)
# ---------------------------------------------------------------------------


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg", "grouping_sets"),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ([ext] SURVEY.md §2 `agg_grouping_sets`):
    two independent single-column groupings in ONE scan — what would
    otherwise be a UNION ALL of two aggregations reading the data twice."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(9,2)")).cast("double").alias(
                "sum_qty"
            ),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )
