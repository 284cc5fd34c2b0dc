from notion_vector_store_etl_pipeline_spark.operators.chunker import (
    DEFAULT_CHUNK_CHAR_LEN,
    chunk_id,
    chunker_udf,
    explode_chunks,
    greedy_chunk_text,
)

__all__ = [
    "DEFAULT_CHUNK_CHAR_LEN",
    "chunk_id",
    "chunker_udf",
    "explode_chunks",
    "greedy_chunk_text",
]
