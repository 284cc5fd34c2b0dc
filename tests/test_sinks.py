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


def test_delete_stale_vectors_calls_client_per_id(spark, tmp_path):
    """foreachPartition delete: every stale id is deleted exactly once,
    retryable failures retry, and permanently-failing ids don't fail
    the run (the reference's try/except-per-file, `:609-614`)."""
    import json
    import os

    from notion_vector_store_etl_pipeline_spark.operators.sinks import (
        delete_stale_vectors,
    )

    stale = spark.createDataFrame(
        [(i, f"vec-{i}") for i in range(20)], "block_id long, stale_vector_id string"
    ).repartition(4)

    log_dir = str(tmp_path / "calls")
    os.makedirs(log_dir, exist_ok=True)

    def delete_fn(vid: str) -> None:
        # executor-side: append-log every attempt; fail vec-3 once
        # (transient), fail vec-7 always (permanent)
        import uuid

        with open(os.path.join(log_dir, f"{vid}--{uuid.uuid4().hex}"), "w") as fh:
            fh.write(vid)
        n_prior = sum(1 for f in os.listdir(log_dir) if f.startswith(f"{vid}--"))
        if vid == "vec-3" and n_prior == 1:
            raise RuntimeError("transient")
        if vid == "vec-7":
            raise RuntimeError("permanent")

    # injected no-op sleep (retries back off for real stores); the
    # return value surfaces terminal failures instead of swallowing
    # them invisibly
    n_failed = delete_stale_vectors(
        stale, delete_fn, max_retries=2, sleep=lambda s: None
    )
    assert n_failed == 1  # vec-7, counted though skipped

    attempts = {}
    for f in os.listdir(log_dir):
        vid = f.split("--", 1)[0]
        attempts[vid] = attempts.get(vid, 0) + 1
    assert len({f"vec-{i}" for i in range(20)} - set(attempts)) == 0  # all attempted
    assert attempts["vec-3"] == 2  # one retry after the transient failure
    assert attempts["vec-7"] == 3  # exhausted retries, run still succeeded
    assert all(n == 1 for vid, n in attempts.items() if vid not in ("vec-3", "vec-7"))
