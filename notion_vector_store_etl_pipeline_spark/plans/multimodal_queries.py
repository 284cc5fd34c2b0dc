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
