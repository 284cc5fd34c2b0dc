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


def test_multi_format_sink_roundtrip(spark, tmp_path):
    """K1/K2 generalized: the same records survive csv (flat) and orc
    (nested) round-trips — Spark-native formats beyond parquet/jsonl."""
    docs = spark.createDataFrame(
        [(1, "srcA", "aaaa\nbbbb"), (2, "srcB", "cccc")],
        "doc_id: long, source: string, text: string",
    )
    chunks = explode_chunks(docs, max_len=8).withColumn("content_hash", F.sha2("text", 256))
    chunks = chunks.withColumn(
        "chunk_id", chunk_id(F.col("source"), F.col("content_hash"), F.col("chunk_index"))
    )
    records = chunk_records(chunks, ingested_at="2026-01-01T00:00:00")

    # ORC keeps the nested metadata struct
    orc_path = str(tmp_path / "chunks_orc")
    records.write.mode("overwrite").orc(orc_path)
    orc_back = spark.read.orc(orc_path)
    assert {(r.id, r.metadata.ingested_at) for r in orc_back.collect()} == {
        (r.id, r.metadata.ingested_at) for r in records.collect()
    }

    # CSV is flat: project the struct out, then verify the flat columns
    flat = records.select("id", "chunk_index", "source_path", "text")
    csv_path = str(tmp_path / "chunks_csv")
    flat.write.mode("overwrite").option("header", True).csv(csv_path)
    # multiLine: chunk text legitimately embeds newlines (greedy packing
    # joins lines), which the writer quotes and a line-split reader breaks
    csv_back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(flat.schema)
        .csv(csv_path)
    )
    assert {tuple(r) for r in csv_back.collect()} == {tuple(r) for r in flat.collect()}
