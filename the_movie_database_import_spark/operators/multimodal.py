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
