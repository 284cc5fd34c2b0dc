"""The reference's WHOLE ETL as one Structured Streaming job
(`Notion_openai_vector_etl.py:617-778` run_etl): paginated source walk
-> chunk -> upload to the vector store, continuously.

- the cursor walk over the workspace is the **paginated stream
  source** (offsets = cursor, resume owned by the checkpoint);
- chunking is the same Arrow-batched greedy chunker as the batch path;
- the vector-store upload is the **vectorstore sink**, invoked per
  micro-batch through ``foreachBatch`` (batch writers compose with
  streaming this way; the sink's manifest commit gives each batch the
  reference's per-file manifest durability at batch granularity).

Together: kill the job at any point, restart with the same checkpoint,
and every document is chunked and uploaded exactly once — the
reference's "Interrupted Run -> Resumes" contract (README.md:458-466)
with the bookkeeping split between Spark's offset log (what was read)
and the sink manifest (what was durably published).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from notion_vector_store_etl_pipeline_spark.operators.chunker import (
    DEFAULT_CHUNK_CHAR_LEN,
    chunk_id,
    explode_chunks,
)
from notion_vector_store_etl_pipeline_spark.sources.paginated import (
    register_paginated_source,
)
from notion_vector_store_etl_pipeline_spark.sources.vectorstore import (
    register_vectorstore_sink,
)


def chunk_stage(docs: DataFrame, max_len: int = DEFAULT_CHUNK_CHAR_LEN) -> DataFrame:
    """Document rows -> chunk-record rows (id, chunk_index, text, source),
    the reference's per-chunk upload records (`:310-326`)."""
    content_hash = F.sha2(F.col("text"), 256)
    chunks = explode_chunks(docs.withColumn("content_hash", content_hash), "text", max_len)
    return chunks.select(
        chunk_id(F.col("source"), F.col("content_hash"), F.col("chunk_index")).alias("id"),
        F.col("doc_id"),
        F.col("chunk_index"),
        F.col("source"),
        F.col("chunk_text").alias("text"),
    )


def streaming_etl(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_dir: str,
    page_size: int = 100,
    pages_per_batch: int = 2,
    max_len: int = DEFAULT_CHUNK_CHAR_LEN,
) -> StreamingQuery:
    """Wire source -> chunker -> sink and start the query."""
    register_paginated_source(spark)
    register_vectorstore_sink(spark)

    docs = (
        spark.readStream.format("paginated")
        .option("path", source_path)
        .option("page_size", str(page_size))
        .option("pages_per_batch", str(pages_per_batch))
        .load()
    )
    records = chunk_stage(docs, max_len)

    def upload(batch: DataFrame, batch_id: int) -> None:
        # exactly-once across batch REPLAYS: the sink's manifest records
        # each committed txn id; a crash after the sink commit but
        # before the streaming epoch commit replays this batch, and the
        # sink recognizes the txn and publishes nothing the second time
        batch.write.format("vectorstore").option("path", store_path).option(
            "txn_id", f"etl-batch-{batch_id}"
        ).mode("append").save()

    return (
        records.writeStream.foreachBatch(upload)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
