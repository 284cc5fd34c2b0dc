"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship pipeline at sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY.md §2 as a
  named (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``: matching DuckDB SQL per query (omitted for
  engine-specific ops -> rows-only check).

Implementation lives in ``notion_vector_store_etl_pipeline_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.chunker import chunk_id, explode_chunks
from notion_vector_store_etl_pipeline_spark.plans import load_registry
from notion_vector_store_etl_pipeline_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's per-file micro-pipeline
    (`process_source`, SURVEY.md §3.3) as one DataFrame pipeline —
    documents -> greedy chunking -> deterministic chunk ids ->
    join embeddings (doc_id = vec_id) -> per-language rollup."""
    docs = load_table(spark, SF0001, "documents")
    emb = load_table(spark, SF0001, "embeddings")
    chunks = explode_chunks(docs, text_col="text", max_len=1200)
    with_ids = chunks.withColumn(
        "chunk_id",
        chunk_id(F.col("source"), F.sha2("text", 256), F.col("chunk_index")),
    )
    return (
        with_ids.join(emb, with_ids.doc_id == emb.vec_id, "left_outer")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_id").alias("n_chunk_ids"),
            F.round(F.avg(F.length("chunk_text")), 2).alias("avg_chunk_chars"),
            F.count("vec_id").alias("n_vectors"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
