"""Similarity search over embedding columns ([ext], north star): brute-force
cosine top-k as the exactness baseline, and a deterministic random-hyperplane
LSH bucketed variant as the scale path.

Scale design: brute force is O(|queries| x |corpus|) — correct for small
query sets (the query side broadcasts; the corpus side streams through one
scan, no shuffle). The LSH path buckets the corpus by sign-bit signatures so
each query only scores its bucket — sublinear per-query work; recall is
measured against brute force in tests (the standard ANN contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..sources.readers import fan_out

LSH_PLANES = 8


def as_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product — reproducible float summation (matches
    a sequential SQL list_reduce, unlike engine-internal vectorized sums)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector via broadcast nested-loop scoring.

    ``queries`` (small) broadcasts; every corpus partition scores its rows
    against all queries in one pass — no corpus shuffle, one final top-k
    window on (query, score).
    """
    # Scoring happens on the probe side of the broadcast join at *input*
    # parallelism — fan out so a single-split local file doesn't serialize it.
    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"),
        as_double_vec(F.col(vec_col)).alias("v"),
    ).withColumn("v_norm", norm(F.col("v")))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(F.col(vec_col)).alias("q"),
    ).withColumn("q_norm", norm(F.col("q")))

    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key
    (north star `dedup` embedding-cosine variant)."""
    base = fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"),
        F.col(block_col).alias("block"),
        as_double_vec(F.col(vec_col)).alias("v"),
    ).withColumn("v_norm", norm(F.col("v")))
    pairs = (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.block") == F.col("b.block")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cosine",
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.v_norm") * F.col("b.v_norm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
    return pairs


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from an integer mix of
    (plane, coordinate) — no RNG state, reproducible everywhere."""
    comps = []
    for j in range(dim):
        x = (plane * 1_000_003 + j) * 2_654_435_761 % (2**32)
        x ^= x >> 16
        comps.append(1.0 if x & 1 else -1.0)
    return comps


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = LSH_PLANES,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH sign signature
    buckets the corpus; each query scores only its own bucket.

    With 8 planes the corpus splits into ≤256 buckets; at 100 TB the bucket
    id becomes the shuffle/partition key and per-query work drops ~256x at
    the cost of recall (measured in tests)."""

    def signature(vec: Column) -> Column:
        bits = []
        for p in range(planes):
            hp = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
            proj = dot(vec, hp)
            bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("bigint")

    corpus = fan_out(embeddings).select(
        F.col(id_col).alias("vec_id"), as_double_vec(F.col(vec_col)).alias("v")
    )
    corpus = corpus.withColumn("bucket", signature(F.col("v"))).withColumn(
        "v_norm", norm(F.col("v"))
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("q")
    )
    qs = qs.withColumn("bucket", signature(F.col("q"))).withColumn("q_norm", norm(F.col("q")))

    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", dot(F.col("v"), F.col("q")) / (F.col("v_norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
