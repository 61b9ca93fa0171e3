"""Document chunking and sequence packing ([ext] training-data pipeline,
north star): the last mile between a curated corpus and a training batch —
split documents into fixed-token-window chunks with overlap, then assign
chunks/documents to fixed-budget bins (context-window packing).

Both are pure row-local / window-function constructs: chunking is an
in-row ``sequence``+``transform``+``posexplode`` (whole-stage codegen, no
shuffle — the explode multiplies rows, not exchanges), packing is one
running-sum window per shard. Neither touches Python.

The reference (a load-everything ETL, `loader.py`) has no chunking
surface; this module is part of the north-star extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import tokens


def _require_absent(df: DataFrame, reserved: tuple[str, ...], op: str) -> None:
    """Output columns are RESERVED names: ``withColumn`` silently replaces a
    same-named input and ``select('*', posexplode(...).alias(...))`` produces
    ambiguous duplicates — either way the caller's column is clobbered without
    warning. Fail loudly instead; rename the input column before calling."""
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"{op} writes reserved output column(s) {clash} which already "
            f"exist in the input — rename them before calling"
        )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into token-window chunks of ``chunk_size``
    whitespace tokens, consecutive chunks sharing ``overlap`` tokens
    (stride = chunk_size - overlap). The final chunk may be shorter; a
    document shorter than one stride still yields exactly one chunk.

    Output adds ``chunk_id`` (0-based), ``chunk_text``, ``n_tokens``.

    Scale shape: chunk construction happens INSIDE the row — an indexed
    ``transform`` over a ``sequence`` of chunk starts, then ``posexplode``.
    No shuffle, no self-join, no Python; output row count is
    sum(ceil(tokens/stride)), and downstream stages see chunks as ordinary
    rows. Overlap is the standard guard against splitting a span a model
    should see contiguously.
    """
    if chunk_size <= 0 or overlap < 0 or overlap >= chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size: {chunk_size=} {overlap=}")
    _require_absent(df, ("_n", "chunk_id", "chunk_text", "n_tokens"), "chunk_tokens")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))  # the text stack's one tokenization
    n = F.size(toks)

    # The token array is bound ONCE as a lambda variable: referencing the
    # split expression directly inside the per-chunk lambda would re-split
    # the whole document for every chunk start — O(L^2 / stride) chars per
    # doc (the r08 span-dedup finding, operators/dedup.span_gram_digests).
    def _chunks(t: Column) -> Column:
        # ceil matches the oracle's ceil(x/stride.0): small-int doubles
        # are exact
        n_chunks = F.ceil(
            F.greatest(F.size(t) - overlap, F.lit(1)) / F.lit(float(stride))
        )
        return F.transform(
            F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(t, (i * stride + 1).cast("int"), chunk_size), " "
            ),
        )

    return (
        df.withColumn("_n", n)
        .select(
            "*",
            F.posexplode(
                F.element_at(F.transform(F.array(toks), _chunks), 1)
            ).alias("chunk_id", "chunk_text"),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("bigint"))
        .withColumn(
            "n_tokens",
            F.least(F.col("_n") - F.col("chunk_id") * stride, F.lit(chunk_size)).cast(
                "bigint"
            ),
        )
        .drop("_n")
    )


def pack_greedy(
    df: DataFrame,
    size_col: Column,
    order_col: Column,
    budget: int,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign each row to a fixed-budget bin by running token count: bin =
    floor(preceding-cumsum / budget) in ``order_col`` order — the
    deterministic single-pass packing a sequence-packing data loader does
    (each item lands in the bin where its offset starts; bins hold ~budget
    tokens). Adds ``bin_id``.

    ``order_col`` must be UNIQUE within a shard (a row id, not a bare
    timestamp): the running sum over a tied sort is order-arbitrary, so
    ties would make bin assignment run-dependent — exactly the
    nondeterminism this operator exists to remove. Append a unique
    tiebreaker to a non-unique ordering before calling.

    Scale: a running-sum window is a SORT, and without ``shard_col`` it is
    one global sort — fine for a bounded eval set, wrong for 100 TB. Pass a
    shard column (split name, language, hash prefix) to pack within shards:
    the window becomes per-shard, the sort distributes, and bins are
    (shard, bin_id). Training jobs shard anyway, so per-shard packing is
    the semantics you want, not a compromise.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    _require_absent(df, ("_pack_offset", "bin_id"), "pack_greedy")
    w = (
        Window.partitionBy(shard_col) if shard_col is not None else Window.partitionBy()
    ).orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offset = F.sum(size_col).over(w) - size_col
    # `div` is exact long integer division — no double round-trip, so the
    # determinism contract holds even past 2^53 cumulative tokens per shard
    # (floor(x / float(budget)) would silently depend on fp rounding there).
    return (
        df.withColumn("_pack_offset", offset.cast("bigint"))
        .withColumn("bin_id", F.expr(f"_pack_offset div {int(budget)}").cast("bigint"))
        .drop("_pack_offset")
    )
