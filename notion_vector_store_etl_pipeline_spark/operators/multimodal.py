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
            payloads = pdf[payload_col]
            dims = payloads.map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_sha": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(batches, DECODED_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary column from text (fixtures carry no real
    media; the cast exercises BinaryType end-to-end)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))
