"""Deduplication operators for large-scale corpus curation ([ext], north
star): exact, canonical token-set, MinHash+LSH, SimHash, and exact n-gram
Jaccard.

Scale design:
- Exact/canonical dedup is one hash-shuffle on the digest — the only correct
  primitive at 100 TB (never a pairwise compare).
- MinHash+LSH: signatures are computed scan-side with built-in ``xxhash64``
  expressions (no Python), candidates come from banding (shuffle on
  (band, signature) — tiny keys), and only candidates pay the exact-Jaccard
  verification. All-pairs work never happens.
- Exact Jaccard runs on an inverted token index (explode → join on token →
  count), i.e. output ∝ co-occurring pairs, not |docs|².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import canonical_token_text, distinct_tokens

NUM_MINHASHES = 32
LSH_BANDS = 8  # 8 bands x 4 rows: ~P(candidate) = 1-(1-j^4)^8


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest (north star `dedup_exact`): one row per
    distinct text, keeping the smallest id; digest group keys keep shuffle
    rows small no matter how long the documents are."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


def canonical_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dedup by canonical token-set form — catches reordered/repeated-word
    duplicates exact hashing misses."""
    return (
        docs.select(
            F.col(id_col),
            F.sha2(canonical_token_text(F.col(text_col)), 256).alias("digest"),
        )
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("dup_count"))
    )


def _minhash_signature(toks: Column, num_hashes: int = NUM_MINHASHES) -> Column:
    """MinHash signature over a token array: h_i = min over tokens of
    xxhash64(token || '#i'). Salted-suffix hashing gives ``num_hashes``
    independent deterministic hash families with zero Python involvement."""
    sigs = [
        F.array_min(F.transform(toks, lambda t, i=i: F.xxhash64(F.concat(t, F.lit(f"#{i}")))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verification.

    Pipeline: tokenize → 32-hash MinHash signature → split into ``bands``
    band signatures → explode → shuffle on (band, signature) → same-bucket
    pairs → verify with exact token-set Jaccard ≥ threshold.

    Verification makes the output precision-exact; banding only affects
    recall (tested against brute force in tests/test_extensions.py).
    """
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("doc_id"), distinct_tokens(F.col(text_col)).alias("toks")
    ).withColumn("sig", _minhash_signature(F.col("toks"), num_hashes))
    # The banded self-join and the two verification joins each instantiate
    # this sub-plan; Catalyst does not share identical subtrees across join
    # branches, so without caching the 32-hash signatures would be computed
    # twice and tokenization four times. (At cluster scale: persist to
    # MEMORY_AND_DISK or materialize signatures to a table first.)
    base = base.cache()

    band_cols = [
        F.xxhash64(
            F.concat_ws(
                ",",
                *[
                    F.col("sig").getItem(b * rows_per_band + r).cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = base.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band_id", "band_sig"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    toksets = base.select("doc_id", "toks")
    verified = (
        cand.join(toksets.withColumnsRenamed({"doc_id": "doc_a", "toks": "toks_a"}), "doc_a")
        .join(toksets.withColumnsRenamed({"doc_id": "doc_b", "toks": "toks_b"}), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint"))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (
                F.size("toks_a").cast("bigint")
                + F.size("toks_b").cast("bigint")
                - F.col("n_inter")
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def jaccard_pairs_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over pairs sharing a blocking key, via an
    inverted token index (the SQL-oracle-checkable twin of the LSH path).

    The join fans out on (block, token) — at 100 TB the blocking key bounds
    the candidate space the way LSH buckets do, and hot tokens would be
    df-filtered (drop tokens with document frequency above a cap) before the
    pair join to control skew.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        distinct_tokens(F.col(text_col)).alias("toks"),
    )
    sizes = base.select("doc_id", F.size("toks").cast("bigint").alias("n_toks"))
    inv = base.select("doc_id", "block", F.explode("toks").alias("tok"))
    inter = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_toks": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_toks": "n_b"}), "doc_b")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
