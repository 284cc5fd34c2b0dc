"""Sink round-trips (SURVEY.md §2.2 K1/K2): chunk JSONL write/read,
chunk-record shaping, state parquet commit."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.chunker import chunk_id, explode_chunks
from notion_vector_store_etl_pipeline_spark.operators.sinks import (
    chunk_records,
    read_chunks_jsonl,
    write_chunks_jsonl,
)


def test_chunk_jsonl_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "srcA", "aaaa\nbbbb\ncccc"), (2, "srcB", "dddd")],
        "doc_id: long, source: string, text: string",
    )
    chunks = explode_chunks(docs, max_len=8).withColumn(
        "content_hash", F.sha2("text", 256)
    )
    chunks = chunks.withColumn(
        "chunk_id", chunk_id(F.col("source"), F.col("content_hash"), F.col("chunk_index"))
    )
    records = chunk_records(chunks, ingested_at="2026-01-01T00:00:00")
    path = str(tmp_path / "chunks")
    write_chunks_jsonl(records, path, partitions=2)
    back = read_chunks_jsonl(spark, path)
    got = {(r.id, r.chunk_index, r.text, r.metadata.source_file) for r in back.collect()}
    want = {(r.id, r.chunk_index, r.text, r.metadata.source_file) for r in records.collect()}
    assert got == want
    assert back.count() == 3  # doc1 -> 2 chunks at max_len=8, doc2 -> 1
    # ids are deterministic: re-deriving matches what was written
    rerun = {r.id for r in chunk_records(chunks, "2026-01-01T00:00:00").collect()}
    assert {r.id for r in back.collect()} == rerun
