"""End-to-end streaming ETL: paginated stream source -> greedy chunker
-> vector-store sink, with checkpoint resume producing no duplicates.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.operators.chunker import greedy_chunk_text
from notion_vector_store_etl_pipeline_spark.sources.vectorstore import read_store
from notion_vector_store_etl_pipeline_spark.streaming.pipeline import streaming_etl

SOURCE = "/root/testdata/sf0.001/documents.parquet"


def _run(spark, store, ckpt):
    q = streaming_etl(
        spark,
        SOURCE,
        store,
        ckpt,
        page_size=100,
        pages_per_batch=2,
        max_len=200,
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_etl_end_to_end(spark, tmp_path):
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, store, ckpt)

    got = read_store(spark, store)
    docs = spark.read.parquet(SOURCE)

    # chunk totals match the pure-python kernel applied per document
    expected_chunks = sum(
        len(greedy_chunk_text(r.text, 200)) for r in docs.select("text").collect()
    )
    assert got.count() == expected_chunks
    # every document that produces chunks is represented
    n_docs_with_chunks = sum(
        1 for r in docs.select("text").collect() if greedy_chunk_text(r.text, 200)
    )
    assert got.select("doc_id").distinct().count() == n_docs_with_chunks
    # chunk ids are unique (source + content hash + index)
    assert got.select("id").distinct().count() == got.count()

    # restart on the same checkpoint: nothing new -> store unchanged
    _run(spark, store, ckpt)
    assert read_store(spark, store).count() == expected_chunks


def test_streaming_etl_chunks_match_batch_chunker(spark, tmp_path):
    """The streaming path and the batch chunk_stage produce identical
    chunk sets (streaming adds no transform drift)."""
    from notion_vector_store_etl_pipeline_spark.streaming.pipeline import chunk_stage

    store = str(tmp_path / "store")
    _run(spark, store, str(tmp_path / "ckpt"))

    stream_rows = sorted(
        (r.id, r.doc_id, r.chunk_index, r.text)
        for r in read_store(spark, store).collect()
    )
    batch_rows = sorted(
        (r.id, r.doc_id, r.chunk_index, r.text)
        for r in chunk_stage(spark.read.parquet(SOURCE), 200).collect()
    )
    # the sink serializes through JSON, so normalize types
    assert len(stream_rows) == len(batch_rows)
    assert [(i, int(d), int(c), t) for i, d, c, t in stream_rows] == [
        (i, int(d), int(c), t) for i, d, c, t in batch_rows
    ]


@pytest.mark.slow
def test_streaming_etl_kill_and_resume_exactly_once(spark, tmp_path):
    """Stop the query mid-stream (after at least one committed batch),
    restart from the same checkpoint, and the store converges to
    exactly the batch chunk set — no loss, no duplicates."""
    import time

    from notion_vector_store_etl_pipeline_spark.streaming.pipeline import streaming_etl

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    q = streaming_etl(
        spark, SOURCE, store, ckpt, page_size=50, pages_per_batch=1, max_len=200
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2:  # a few batches committed, more remain
            break
        time.sleep(0.2)
    q.stop()  # kill mid-stream

    q2 = streaming_etl(
        spark, SOURCE, store, ckpt, page_size=50, pages_per_batch=1, max_len=200
    )
    q2.processAllAvailable()
    q2.stop()

    docs = spark.read.parquet(SOURCE)
    expected_chunks = sum(
        len(greedy_chunk_text(r.text, 200)) for r in docs.select("text").collect()
    )
    got = read_store(spark, store)
    assert got.count() == expected_chunks
    assert got.select("id").distinct().count() == expected_chunks
