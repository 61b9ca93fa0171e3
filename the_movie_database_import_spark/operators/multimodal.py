"""Multimodal column plumbing ([ext], north star): image/audio/video carried
as opaque ``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED (media codecs are not in this container —
:func:`decode_image` raises ``NotImplementedError``); everything around it is
real and tested: binary schema, deterministic byte-level feature extraction
over Arrow batches, partition-friendly batch shapes, and metadata pushdown.
A production deployment replaces ``_fake_decode`` with PIL/ffmpeg calls of
identical signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HIST_BINS = 16

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_source", StringType()),
        StructField("declared_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_histogram", ArrayType(LongType())),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — unavailable in this container (no PIL/libjpeg).

    The Spark-side plumbing (schema, batching, UDF signature) is exercised
    through :func:`extract_features`' deterministic byte-level path instead.
    """
    raise NotImplementedError(
        "media codecs not installed; swap in PIL.Image.open in production"
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic asset table derived from the documents fixture: the
    UTF-8 text bytes stand in for an opaque media payload."""
    media = (
        F.when(F.pmod(F.col("doc_id"), 3) == 0, F.lit("image/png"))
        .when(F.pmod(F.col("doc_id"), 3) == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.col("source").alias("meta_source"),
        F.col("n_chars").alias("declared_bytes"),
    )


FRAME_BYTES = 64  # pseudo-frame size for the stubbed video path
FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)

RESIZE_BUCKETS = 16
RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("orig_bytes", LongType()),
        StructField("bucket_sums", ArrayType(LongType())),
        StructField("bucket_lens", ArrayType(LongType())),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = FRAME_BYTES, every: int = 4
) -> DataFrame:
    """Frame sampling over opaque video payloads: slice each payload into
    fixed-size pseudo-frames and keep every ``every``-th, one OUTPUT ROW PER
    SAMPLED FRAME (asset_id, frame_idx, frame length, frame digest).

    This is the row-expanding multimodal shape a real video pipeline needs —
    ``mapInPandas`` yielding multiple rows per input asset, Arrow in both
    directions — with ffmpeg's keyframe extraction swapped for deterministic
    byte slicing of identical signature (the brief's allowed stub). Frames
    are emitted as digests, not payloads: at 100 TB the sampled-frame bytes
    would be written to a side store, never shuffled in row form.
    """
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_SAMPLE_SCHEMA.fields}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out["asset_id"].append(asset_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(fr))
                    out["frame_sha256"].append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    from ..sources.readers import fan_out

    return fan_out(assets).mapInPandas(gen, schema=FRAME_SAMPLE_SCHEMA)


def resize_signal(assets: DataFrame, buckets: int = RESIZE_BUCKETS) -> DataFrame:
    """Resize/downsample over opaque payloads: area-pool the byte signal into
    ``buckets`` equal spans, emitting exact integer (sum, len) per bucket —
    the deterministic stand-in for an image resize (PIL's reduce box filter
    has the same batch shape). Integer sums keep the output exactly
    reproducible across partitionings and engines (no float accumulation),
    and mean = sum/len is recoverable losslessly downstream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in RESIZE_SCHEMA.fields}
            for asset_id, media_type, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(
                    bytes(payload) if payload is not None else b"", dtype=np.uint8
                )
                # exact integer bucket bounds (i*size//buckets): no float
                # rounding anywhere, so the pooling is bit-reproducible
                bounds = [i * arr.size // buckets for i in range(buckets + 1)]
                sums = [int(arr[bounds[i] : bounds[i + 1]].sum()) for i in range(buckets)]
                lens = [int(bounds[i + 1] - bounds[i]) for i in range(buckets)]
                out["asset_id"].append(asset_id)
                out["media_type"].append(media_type)
                out["orig_bytes"].append(int(arr.size))
                out["bucket_sums"].append(sums)
                out["bucket_lens"].append(lens)
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    from ..sources.readers import fan_out

    return fan_out(assets).mapInPandas(gen, schema=RESIZE_SCHEMA)


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (``mapInPandas``):
    payload size, mean byte value, 16-bin byte histogram.

    This is the exact execution shape a real decode/resize/frame-sample
    stage uses — per-partition Arrow batches into numpy, columnar result
    out — with the codec swapped for deterministic byte math.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, media_type, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=HIST_BINS)[:HIST_BINS]
                rows.append(
                    {
                        "asset_id": asset_id,
                        "media_type": media_type,
                        "n_bytes": int(arr.size),
                        "mean_byte": float(arr.mean()) if arr.size else 0.0,
                        "byte_histogram": hist.astype("int64").tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    from ..sources.readers import fan_out

    # mapInPandas runs at input parallelism; fan out a single-split source so
    # Arrow batches spread across cores (no-op on a real multi-split scan).
    return fan_out(assets).mapInPandas(feats, schema=FEATURE_SCHEMA)
