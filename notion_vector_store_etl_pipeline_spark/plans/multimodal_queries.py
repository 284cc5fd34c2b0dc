"""Multimodal-column queries: opaque binary payloads processed via
Arrow-batched mapInPandas (SURVEY.md §2.11, the vision-extraction
stage generalized). The decode kernel is a deterministic stub (codec
libs absent); the Spark plumbing — BinaryType column, mapInPandas
schema, batch iteration — is real, and the oracle recomputes the same
metadata in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from notion_vector_store_etl_pipeline_spark.operators.multimodal import (
    decode_image_stub,
    with_binary_payload,
)
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha,
           CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
           CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
    doc="Binary-column decode stage (stubbed decoder) over mapInPandas.",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_stub(with_binary_payload(docs))


@register(
    "multimodal_resize",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
             CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS INTEGER) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(greatest(1, floor(width  * 224.0 / greatest(width, height))) AS INTEGER) AS out_w,
           CAST(greatest(1, floor(height * 224.0 / greatest(width, height))) AS INTEGER) AS out_h
    FROM decoded
    """,
    doc="Aspect-preserving fit-into-224 resize of decoded dims — the "
    "dimension arithmetic stays JVM-side (exact integer math); pixel "
    "resampling slots into the decode kernel.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.multimodal import resize_stub

    docs = load_table(spark, sf_dir, "documents")
    return resize_stub(decode_image_stub(with_binary_payload(docs)))


@register(
    "multimodal_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(octet_length(CAST(text AS BLOB)) // 160 AS BIGINT) AS n_frames,
           CAST((octet_length(CAST(text AS BLOB)) // 160) * 20 AS BIGINT) AS duration_ms,
           CAST(octet_length(CAST(text AS BLOB)) % 160 AS BIGINT) AS tail_bytes
    FROM documents
    """,
    doc="Audio feature-extraction plumbing: 20ms/160B framing over raw "
    "bytes in Arrow-batched mapInPandas (spectral kernel stubbed; framing "
    "math is real and oracle-checked).",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from notion_vector_store_etl_pipeline_spark.operators.multimodal import (
        audio_features_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_features_stub(with_binary_payload(docs))


@register(
    "multimodal_decode_arrow",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha,
           CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS width,
           CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
    doc="Same decode stage as multimodal_decode_stub but via mapInArrow "
    "— raw RecordBatch in/out, no pandas materialization: the lowest-"
    "overhead Python integration for byte-heavy media batches (no "
    "Series boxing of binary payloads).",
)
def multimodal_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import pyarrow as pa

    from notion_vector_store_etl_pipeline_spark.operators.multimodal import (
        DECODED_SCHEMA,
        _fake_decode,
    )

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))

    def batches(it):
        for batch in it:
            doc_ids = batch.column("doc_id")
            # NULL payload -> NULL metadata, matching the pandas twin
            # and the oracle's octet_length(NULL)/sha256(NULL)
            payloads = batch.column("payload").to_pylist()
            dims = [None if p is None else _fake_decode(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array(
                        [None if p is None else len(p) for p in payloads], pa.int64()
                    ),
                    pa.array(
                        [
                            None if p is None else hashlib.sha256(p).hexdigest()
                            for p in payloads
                        ]
                    ),
                    pa.array([None if d is None else d[0] for d in dims], pa.int32()),
                    pa.array([None if d is None else d[1] for d in dims], pa.int32()),
                ],
                names=["doc_id", "n_bytes", "payload_sha", "width", "height"],
            )

    return docs.select("doc_id", "payload").mapInArrow(batches, DECODED_SCHEMA)
