"""Chunking / packing operators (operators/chunking.py). The oracle-parity
suite value-checks q_text_chunks and q_pack_greedy against DuckDB; these pin
the structural properties the oracle doesn't state explicitly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movie_database_import_spark.operators.chunking import (
    chunk_tokens,
    pack_greedy,
)
from the_movie_database_import_spark.sources.readers import load_table

from conftest import SF_DIR


def test_chunks_reconstruct_documents(spark):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0) and
    concatenating in chunk_id order must reproduce the original document —
    no token lost, duplicated beyond the overlap, or reordered."""
    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 50")
    chunks = chunk_tokens(docs, chunk_size=64, overlap=16)
    rows = chunks.select("doc_id", "chunk_id", "chunk_text").collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    originals = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(by_doc) == set(originals)
    for doc_id, parts in by_doc.items():
        parts.sort()
        assert [cid for cid, _ in parts] == list(range(len(parts)))
        toks: list[str] = []
        for cid, text in parts:
            t = text.split(" ")
            toks.extend(t if cid == 0 else t[16:])
        assert toks == originals[doc_id].split(" "), doc_id


def test_chunk_overlap_is_shared_suffix_prefix(spark):
    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 20")
    rows = chunk_tokens(docs, chunk_size=64, overlap=16).collect()
    by_doc: dict[int, list[tuple[int, list[str]]]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text.split(" ")))
    for parts in by_doc.values():
        parts.sort()
        for (_, prev), (_, cur) in zip(parts, parts[1:]):
            # a chunk with a successor is always full-length (start < n-16
            # guarantees the successor holds > overlap tokens), so the
            # overlap is exactly prev's tokens [stride, chunk_size)
            assert cur[:16] == prev[48:64], (
                "consecutive chunks must share the 16-token overlap"
            )


def test_chunk_tokens_rejects_bad_params(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_tokens(docs, chunk_size=32, overlap=32)


def test_chunking_plan_has_no_exchange(spark):
    """Chunk construction is in-row: sequence + transform + posexplode,
    no shuffle and no Python."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        chunk_tokens(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_pack_greedy_bins_respect_offsets(spark):
    """Per shard: bin ids are nondecreasing in pack order, start at 0, and
    every bin except possibly the last spans >= budget tokens once the next
    bin opens (offset-based assignment)."""
    docs = load_table(spark, SF_DIR, "documents")
    sized = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    packed = pack_greedy(
        sized, F.col("n"), F.col("doc_id"), 256, shard_col=F.col("lang")
    ).collect()
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r.lang, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rows:
            assert r.bin_id == offset // 256, (shard, r.doc_id)
            offset += r.n
    with pytest.raises(ValueError):
        pack_greedy(sized, F.col("n"), F.col("doc_id"), 0)


def test_reserved_output_columns_rejected(spark):
    """ADVICE r04: output names are reserved — a same-named input column
    would be silently clobbered (withColumn) or duplicated ambiguously
    (select('*', posexplode)). The operators must fail loudly instead."""
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="chunk_id"):
        chunk_tokens(docs.withColumn("chunk_id", F.lit(0)))
    with pytest.raises(ValueError, match="n_tokens"):
        chunk_tokens(docs.withColumn("n_tokens", F.lit(0)))
    sized = docs.select("doc_id", "lang", F.lit(5).cast("bigint").alias("n"))
    with pytest.raises(ValueError, match="bin_id"):
        pack_greedy(
            sized.withColumn("bin_id", F.lit(0)), F.col("n"), F.col("doc_id"), 64
        )


def test_pack_greedy_bin_id_is_exact_integer_division(spark):
    """bin = offset div budget on LONGS (ADVICE r04): no double round-trip,
    so assignment is exact regardless of cumulative magnitude. Pin by
    packing rows whose offsets sit exactly on and one below a bin boundary."""
    rows = [(i, 64) for i in range(10)]  # offsets 0,64,128,... budget=128
    df = spark.createDataFrame(rows, "id long, n long")
    got = {r.id: r.bin_id for r in pack_greedy(df, F.col("n"), F.col("id"), 128).collect()}
    assert got == {i: (i * 64) // 128 for i in range(10)}


def test_long_doc_hof_lambdas_are_linear(spark):
    """Long-doc stress for the bound-token-array pattern (r08): expressions
    inside higher-order-function lambdas re-evaluate PER ELEMENT, so
    word_shingles and chunk_tokens must bind split(text) once as a lambda
    variable instead of re-splitting the document per shingle/chunk start.
    The pre-fix forms took 152s (shingles) / 3.6s (chunks) on this 50k-token
    doc; the bound forms run in ~1s. Correctness is pinned exactly."""
    import time

    from the_movie_database_import_spark.functions.text import word_shingles

    text = " ".join(f"w{i}" for i in range(50_000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.monotonic()
    n_shingles = df.select(
        F.size(word_shingles(F.col("text"), 3)).alias("n")
    ).first()["n"]
    n_chunks = chunk_tokens(df, chunk_size=64, overlap=16).count()
    elapsed = time.monotonic() - t0
    assert n_shingles == 49_998  # all distinct: L - n + 1
    assert n_chunks == -(-(50_000 - 16) // 48)  # ceil((L - overlap)/stride)
    assert elapsed < 60, f"long-doc shingle+chunk took {elapsed:.1f}s"
