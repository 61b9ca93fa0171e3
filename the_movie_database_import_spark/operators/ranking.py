"""Okapi BM25 document ranking ([ext] text-retrieval north star): score
every document against a small bag-of-words query and return the top-k —
the lexical-retrieval baseline every corpus-curation / RAG pipeline runs
before (or alongside) embedding ANN search.

The reference (`loader.py`) has no text-ranking surface; this belongs to
the north-star extension set next to TF-IDF (`plans/extensions.py`) and
the embedding similarity operators (`operators/similarity.py`).

Scale design — ONE corpus-wide shuffle, no joins on the corpus side:

- The query is a handful of terms, so per-term frequencies live as
  CONDITIONAL AGGREGATE COLUMNS of a single ``groupBy(doc_id)`` over the
  exploded token stream (``SUM(CASE WHEN token = t)`` per term) computed
  in the same pass as the document length. The textbook formulation —
  tf table joined to doc-length table joined to df table — is three
  shuffles and two joins; this is one map-side-combined hash aggregate.
- Corpus statistics (N, total length, per-term document frequencies) are
  ONE scalar row aggregated from that per-doc frame and broadcast back
  via ``crossJoin`` (the established tiny-aggregate crossJoin pattern,
  see q_flagship_star_revenue). Nothing wider than one row moves.
- Scoring is pure whole-stage-codegen arithmetic; top-k runs as
  TakeOrderedAndProject (per-partition heaps + driver merge), never a
  global sort.

Determinism: each term's BM25 contribution is floor-quantized onto a
1e-6 integer grid BEFORE the per-document sum (``score_q``), the same
discipline as the unigram-LM NLL signal (`operators/vocab.py`) — double
addition is order-dependent, integer addition is not, and DuckDB's
``ln``/arithmetic agree with Java's inside the grid tolerance (pinned by
tests/test_analytics.py::test_bm25_grid_safety at every SF). All float
constants in the oracle SQL are rendered with ``repr`` from the SAME
Python floats the Spark plan uses, so both engines parse identical
doubles.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

QUANT = 1e6  # BM25 contribution grid: floor(1e6 * contribution)


def _idf(n_docs: Column, df: Column) -> Column:
    # Lucene's non-negative BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)).
    return F.log(F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)))


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (whitespace tokens).

    Returns ``(id_col, score_q BIGINT, score DOUBLE)`` with one row per
    document whose text tokenizes (NULL-text docs drop out, like every
    explode-based text operator here); ``score_q`` is the exact
    grid-quantized integer score (sum over query terms of
    ``floor(1e6 * idf_t * tf_saturation_t)``), ``score = score_q / 1e6``.
    Documents containing none of the terms score 0 — they stay in the
    frame so downstream top-k has a total, deterministic order.
    """
    terms = list(query_terms)
    if len(set(terms)) != len(terms):
        raise ValueError(f"query terms must be distinct, got {terms}")
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    # per_doc feeds TWO consumers (the corpus-stats scalar and the scoring
    # pass). It is expensive upstream — a full-corpus explode + aggregate —
    # so cache it rather than recompute: ReuseExchange does not fire here
    # (the stats side's exchange sits under a BroadcastExchange in a
    # different stage), and without the cache the corpus would be scanned
    # and tokenized twice (the tracked-cache discipline q_pipeline_end_to_end
    # uses for its deduped increment).
    from ..session import tracked_cache

    per_doc = tracked_cache(
        toks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("token") == t, 1).otherwise(0)).alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
        )
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))

    avgdl = F.col("sum_dl") / F.col("n_docs")  # exact-int IEEE division
    dl_ratio = F.col("dl") / avgdl

    def contrib(i: int) -> Column:
        tf = F.col(f"tf_{i}")
        idf = _idf(F.col("n_docs"), F.col(f"df_{i}"))
        sat = (tf * F.lit(k1p1)) / (
            tf + F.lit(k1) * (F.lit(one_minus_b) + F.lit(b) * dl_ratio)
        )
        return F.when(
            tf > 0, F.floor(F.lit(QUANT) * (idf * sat)).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    score_q = reduce(lambda a, c: a + c, [contrib(i) for i in range(len(terms))])
    return scored.select(F.col(id_col), score_q.alias("score_q")).select(
        id_col, "score_q", (F.col("score_q") / F.lit(QUANT)).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-``k`` documents by BM25 score, total order (score desc, id asc
    tiebreak) so the result set is deterministic. Runs as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, query_terms, **kwargs)
        .orderBy(F.col("score_q").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk`, generated from the SAME constants
    (``repr`` round-trips Python floats to the identical IEEE doubles) and
    the same left-to-right arithmetic shapes, so each term's contribution
    is bit-identical up to the 1-ulp ``ln`` tolerance the quantization
    grid absorbs."""
    terms = list(query_terms)
    tf_cols = ",\n          ".join(
        f"SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n          ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = "\n        + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN CAST(floor({QUANT!r} * ("
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * ((tf_{i} * {k1 + 1.0!r}) / (tf_{i} + {k1!r} * ({1.0 - b!r}"
        f" + {b!r} * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))))"
        f")) AS BIGINT) ELSE 0 END)"
        for i in range(len(terms))
    )
    return f"""
    WITH tok AS (
        SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS token
        FROM {table}
    ),
    per_doc AS (
        SELECT {id_col}, COUNT(*) AS dl,
          {tf_cols}
        FROM tok GROUP BY {id_col}
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
          {df_cols}
        FROM per_doc
    ),
    scored AS (
        SELECT per_doc.{id_col},
        {contribs}
        AS score_q
        FROM per_doc, stats
    )
    SELECT {id_col}, score_q, score_q / {QUANT!r} AS score
    FROM scored
    ORDER BY score_q DESC, {id_col}
    LIMIT {k}
    """


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    k0: int = 60,
    k: int = 10,
    grid: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion ([ext] hybrid-retrieval north star): combine
    top-k lists from heterogeneous rankers — BM25 lexical, embedding
    cosine, anything producing ``(id, rank)`` — into one list by
    ``score(d) = sum over lists of 1 / (k0 + rank_d)`` (Cormack et al.;
    k0=60 is the published default), the standard RAG trick that needs no
    score calibration because only RANKS enter the formula.

    Returns ``(id_col, rrf_q, n_lists, rrf_rank)`` for the fused top
    ``k``: ``rrf_q`` the grid-quantized integer fusion score (divide by
    ``grid`` for the classic value), ``n_lists`` how many input lists
    contained the doc, ``rrf_rank`` the fused position (ties break by
    id, so the output is a deterministic total order).

    Each contribution quantizes to ``floor(grid / (k0 + rank))`` BEFORE
    the per-doc sum: with 3+ input lists a raw double sum would be
    addition-order-dependent across partitionings; integer sums are
    exact (the unigram_nll discipline). No transcendentals anywhere —
    ``1/(k0+rk)`` is a single correctly-rounded IEEE division, identical
    in any engine, so the quantization needs no margin pin.

    Scale shape: the inputs are top-k lists — BOUNDED, a few dozen rows
    each — so the union + per-id aggregate + the global rank window all
    run on list-sized data BY DESIGN (the build_vocab bounded-window
    argument); the heavy work happened inside the upstream rankers.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    contribs = [
        r.select(
            F.col(id_col),
            F.floor(
                F.lit(float(grid))
                * (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col)))
            )
            .cast("bigint")
            .alias("_c"),
        )
        for r in rankings
    ]
    all_c = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = all_c.groupBy(id_col).agg(
        F.sum("_c").alias("rrf_q"), F.count(F.lit(1)).alias("n_lists")
    )
    order = Window.orderBy(F.col("rrf_q").desc(), F.col(id_col))
    return (
        fused.withColumn("rrf_rank", F.row_number().over(order).cast("bigint"))
        .filter(F.col("rrf_rank") <= k)
    )
