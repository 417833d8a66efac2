"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape through ``mapInPandas`` — while the actual media decode is
stubbed (image/audio libraries are not in this container): pass
``fake_decode=True`` for a deterministic fake feature extractor, or get
``NotImplementedError`` from the real path.

Design: media rides as a ``binary`` column with a ``media_meta`` struct
(mime, width, height, duration_ms). Feature extraction is an
Arrow-batched ``mapInPandas`` — one Python process per partition batch,
never per row — and the output schema is declared up front so Catalyst
can prune/plan around it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media column from text bytes (testdata has no binary):
    content = utf-8 bytes, metadata = a deterministic struct. Exercises the
    real BinaryType + struct plumbing end-to-end."""
    content = F.encode(F.col(text_col), "utf-8").cast(BinaryType())
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.pmod(F.length(F.col(text_col)), F.lit(640)).cast("int").alias("width"),
        F.pmod(F.length(F.col(text_col)), F.lit(480)).cast("int").alias("height"),
        F.length(F.col(text_col)).cast("long").alias("duration_ms"),
    )
    return df.select(F.col(id_col), content.alias("media"), meta.alias("media_meta"))


def _decode_real(blob: bytes) -> list[float]:
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; use fake_decode=True for the deterministic stand-in"
    )


def _decode_fake(blob: bytes, n_features: int = 8) -> list[float]:
    """Deterministic fake 'feature extractor': byte-histogram moments."""
    if not blob:
        return [0.0] * n_features
    return [float(blob[i % len(blob)] % 97) / 97.0 for i in range(n_features)]


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    meta_col: str = "media_meta",
    id_col: str = "doc_id",
    fake_decode: bool = False,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas.

    Partition-parallel, batch-at-a-time: each pandas batch holds the
    binary blobs for one Arrow chunk; output rows align 1:1 with input.
    """
    decode = _decode_fake if fake_decode else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [m["mime"] if m is not None else None for m in pdf[meta_col]],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[media_col]],
                    "features": [decode(b) for b in pdf[media_col]],
                }
            )

    return df.select(id_col, media_col, meta_col).mapInPandas(run, FEATURE_SCHEMA)
