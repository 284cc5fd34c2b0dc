"""Multimodal-column plumbing: treat image/audio/video payloads as
opaque BINARY columns with typed metadata, processed in Arrow-batched
``mapInPandas`` stages (the reference's vision-LLM extraction stage,
`Notion_openai_vector_etl.py:254-301`, generalized).

The actual codec libraries are not in this container, so the decode
kernel is STUBBED: ``decode_image_batch(real_decode=True)`` raises
NotImplementedError; the default deterministic fake derives metadata
purely from the bytes (length + sha256 + fake dims) so the Spark-side
plumbing — schema, Arrow batch shape, partition-wise execution — is
real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder (no codec libs here)."""
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def decode_image_stub(df: DataFrame, payload_col: str = "payload", real_decode: bool = False) -> DataFrame:
    """BINARY payload -> typed metadata via mapInPandas (Arrow batches).

    ``real_decode=True`` is the hook where PIL/ffmpeg would slot in.
    """
    if real_decode:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "plug a decoder into _fake_decode's slot"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # null payloads produce NULL metadata (the reference skips
            # missing urls before download; a connector can still hand
            # us nulls) — NOT zero-length decodes: the registered
            # oracles compute octet_length(NULL) -> NULL and
            # sha256(NULL) -> NULL, and coercing to b"" here would
            # stamp real-looking metadata (sha of empty, 1x1 dims) on
            # rows that have no payload at all
            payloads = pdf[payload_col].map(lambda b: None if b is None else bytes(b))
            dims = payloads.map(lambda b: None if b is None else _fake_decode(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(lambda b: None if b is None else len(b)),
                    "payload_sha": payloads.map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "width": dims.map(lambda d: None if d is None else d[0]),
                    "height": dims.map(lambda d: None if d is None else d[1]),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, DECODED_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary column from text (fixtures carry no real
    media; the cast exercises BinaryType end-to-end)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
    ]
)

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("tail_bytes", LongType()),
    ]
)


def resize_stub(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving fit-into-target resize of decoded dims.

    The pixel resampling itself would live in the decode kernel (PIL /
    cv2 slot); the dimension arithmetic — what the planner must carry —
    is exact integer math: ``out = max(1, floor(side * target / longest))``.
    Pure JVM-side expressions, no Python stage needed.
    """
    longest = F.greatest("width", "height")
    out = decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(F.col("width") * target / longest)).cast("int").alias("out_w"),
        F.greatest(F.lit(1), F.floor(F.col("height") * target / longest)).cast("int").alias("out_h"),
    )
    # RESIZED_SCHEMA is the contract a future Python resampling stage
    # (mapInPandas) would declare; assert the JVM expressions stay in sync
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in RESIZED_SCHEMA.fields]
    assert got == want, f"resize_stub schema drifted: {got} != {want}"
    return out


def audio_features_stub(df: DataFrame, payload_col: str = "payload", frame_bytes: int = 160) -> DataFrame:
    """Frame-level audio feature extraction over raw bytes (mapInPandas).

    The spectral kernel is stubbed (no audio libs in this container);
    the framing arithmetic — 20 ms frames of ``frame_bytes`` bytes,
    leftover tail — runs on the real byte payloads in Arrow batches,
    which is the exact shape a real torchaudio/librosa stage would use.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload -> NULL features (octet_length(NULL) in the
            # oracle), same contract as decode_image_stub
            n = pdf[payload_col].map(lambda b: None if b is None else len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "n_frames": n.map(lambda v: None if v is None else v // frame_bytes),
                    "duration_ms": n.map(
                        lambda v: None if v is None else (v // frame_bytes) * 20
                    ),
                    "tail_bytes": n.map(lambda v: None if v is None else v % frame_bytes),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, AUDIO_SCHEMA)
