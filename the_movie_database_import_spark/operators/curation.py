"""Composed corpus-curation pipeline ([ext], north star: the end-to-end
flow a training-data run executes — quality scoring → language filter →
canonical dedup → optional near-dup pairing), skew-safe BY DEFAULT.

The scalar stages fuse into the scan projection (no Python, pinned in
tests/test_plans.py); the canonical-dedup window is the only shuffle. The
optional near-dup stage rides the inverted-token-index Jaccard join, whose
100 TB failure mode is token skew: a stop-word-grade token appearing in d
docs of a block contributes d² join rows. ``max_token_df`` (threaded to
``jaccard_pairs_exact``) caps that fan-out at the pipeline level — the
composed flagship is skew-safe without each caller re-remembering the guard
(VERDICT r02 #6). Capped scores are a documented LOWER BOUND: dropping a
ubiquitous token undercounts intersections but never inflates them, so the
cap can only suppress pairs, never invent them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import canonical_token_text, langid, quality_metrics
from .decontam import decontaminate
from .dedup import jaccard_pairs_exact

# Default skew cap for the near-dup stage: a token must appear in more
# documents than this (per block) to be pruned. 1000 bounds any single
# token's join fan-out at ~10^6 rows per block — noise at cluster scale —
# while leaving every topically-meaningful token intact.
DEFAULT_MAX_TOKEN_DF = 1000


def curate_corpus(
    docs: DataFrame,
    *,
    quality_threshold: float = 0.6,
    langs: tuple[str, ...] = ("en", "de"),
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float | None = None,
    block_col: str = "source",
    max_token_df: int | None = DEFAULT_MAX_TOKEN_DF,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
) -> DataFrame:
    """Quality-score, language-filter, and canonical-dedup ``docs``; with
    ``near_dup_threshold`` set, additionally flag near-duplicate documents
    (``is_near_dup``) via blocked exact-Jaccard pairing with the
    ``max_token_df`` skew cap applied by default. With ``benchmark`` set,
    documents sharing any ``decontam_n``-gram with it are dropped FIRST
    (broadcast probe, `operators/decontam.py`) — decontamination before
    scoring, so a leaked eval doc can't survive as a dedup cluster's
    representative.

    Near-dup flagging keeps the pair's LOWEST-id document unflagged (the
    survivor convention shared with canonical_dedup/minhash clustering)."""
    if benchmark is not None:
        docs = decontaminate(
            docs, benchmark, n=decontam_n, text_col=text_col, id_col=id_col
        )
    m = quality_metrics(F.col(text_col))
    base = docs.select(
        id_col,
        text_col,
        *([block_col] if near_dup_threshold is not None else []),
        m["n_tokens"].alias("n_tokens"),
        m["quality_score"].alias("quality_score"),
        langid(F.col(text_col)).alias("lang_pred"),
    ).filter(
        (F.col("quality_score") >= quality_threshold)
        & F.col("lang_pred").isin(*langs)
    )
    # Canonical-dedup winner as a map-side-combined MIN AGGREGATE on the
    # canonical digest, joined back on (digest, winner id) — never a
    # window partitioned by canonical text: a boilerplate text duplicated
    # 10^6 times would funnel every copy into one window partition, and
    # AQE can split skewed join partitions but not window partitions.
    # The composite (null-safe digest, id) key keeps duplicate-id inputs
    # from over-keeping across canonical groups; see
    # operators/delta.incremental_dedup for the same construction.
    ckey = F.sha2(canonical_token_text(F.col(text_col)), 256)
    wins = (
        base.select(ckey.alias("_ckey"), id_col)
        .groupBy("_ckey")
        .agg(F.min(id_col).alias("_win_id"))
        .select("_ckey", "_win_id", F.lit(True).alias("_is_win"))
    )
    curated = (
        base.withColumn("_row_ckey", ckey)
        .join(
            wins,
            F.col("_row_ckey").eqNullSafe(F.col("_ckey"))
            & (F.col(id_col) == F.col("_win_id")),
            "left",
        )
        .select(
            id_col,
            *([block_col] if near_dup_threshold is not None else []),
            "lang_pred",
            "n_tokens",
            "quality_score",
            F.coalesce("_is_win", F.lit(False)).alias("is_kept"),
        )
    )
    if near_dup_threshold is None:
        return curated
    pairs = jaccard_pairs_exact(
        base.select(id_col, text_col, block_col),
        text_col=text_col,
        id_col=id_col,
        block_col=block_col,
        threshold=near_dup_threshold,
        max_token_df=max_token_df,
    )
    dup_ids = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return (
        curated.join(
            dup_ids.withColumn("is_near_dup", F.lit(True)), id_col, "left"
        )
        .withColumn("is_near_dup", F.coalesce("is_near_dup", F.lit(False)))
        .drop(block_col)
    )


def calibrated_quality_keep(
    docs: DataFrame,
    keep_frac: float = 0.25,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source CALIBRATED quality selection: keep each source's top
    ``keep_frac`` of documents by quality score, where the cut is that
    source's own (1 - keep_frac) score quantile — not one global
    threshold. A global cut silently reweights the corpus toward
    whichever sources score systematically high (cleaner markup, longer
    documents); calibrating per source keeps the source mixture stable
    while still dropping each source's worst tail — the same
    distribution-preserving motivation as temperature mixing, applied
    to the quality axis. Returns kept rows
    ``(id_col, group_col, quality_score, keep_threshold)``.

    Scale design — data rows NEVER sort globally and never enter a
    per-source window (a percent_rank over a hot source would be one
    task sorting that whole source): scores fuse into the scan
    projection (pure codegen), ONE (source, score) aggregate collects
    each source's sorted score list (the `value_outliers` exact-
    percentile memory profile — right for bounded source cardinality;
    unbounded grouping wants percentile_approx), and the tiny per-source
    threshold table broadcasts back as a filter. Ties AT the threshold
    are kept (>=), so under heavy score ties the kept fraction can
    exceed ``keep_frac`` — deterministic on both engines because the
    threshold itself is exact order-statistic interpolation
    (``v_lo + (v_hi - v_lo) * frac``, h = q*(n-1) exact for the
    binary-fraction ``keep_frac`` this contract requires — 0.25, 0.5,
    0.125, ... — the no-grid determinism lane).
    """
    q = 1.0 - keep_frac
    if q * 4 != round(q * 4) and q * 1024 != round(q * 1024):
        raise ValueError(
            f"keep_frac must be a binary fraction (0.25, 0.125, ...): {keep_frac}"
        )
    m = quality_metrics(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        m["quality_score"].alias("quality_score"),
    )
    g = scored.groupBy(group_col).agg(
        F.sort_array(F.collect_list("quality_score")).alias("_ss"),
        F.count(F.lit(1)).alias("_n"),
    )
    h = F.lit(q) * (F.col("_n") - 1).cast("double")
    lo = F.floor(h)
    v_lo = F.element_at("_ss", (lo + 1).cast("int"))
    v_hi = F.element_at("_ss", F.least(lo + 2, F.col("_n")).cast("int"))
    thresholds = g.select(
        group_col,
        (v_lo + (v_hi - v_lo) * (h - F.floor(h))).alias("keep_threshold"),
    )
    return (
        scored.join(F.broadcast(thresholds), group_col)
        .filter(F.col("quality_score") >= F.col("keep_threshold"))
        .select(id_col, group_col, "quality_score", "keep_threshold")
    )
