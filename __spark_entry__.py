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

from notion_vector_store_etl_pipeline_spark.plans import load_registry
from notion_vector_store_etl_pipeline_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full `run_etl` lifecycle (SURVEY.md §3)
    over sf0.001 — snapshot vs prior state -> incremental plan ->
    chunking -> deterministic chunk ids -> per-language rollup of the
    processed/skipped/chunk outcomes (the reference's run summary,
    `:771-776`), joined to embeddings coverage."""
    return entry_frame(spark, SF0001)


def entry_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship lifecycle parameterized by scale dir — what
    ``entry`` runs at sf0.001 and what bench.py times at the bench SF
    as the ``flagship_pipeline`` row (VERDICT r11 #4: lifecycle cost —
    skip stage, incremental plan, chunk, rollup — tracked per round
    like registry queries)."""
    from notion_vector_store_etl_pipeline_spark.pipeline import run_pipeline
    from notion_vector_store_etl_pipeline_spark.plans.incremental_queries import (
        build_snapshot,
        build_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    snapshot = build_snapshot(spark, sf_dir).join(
        docs.select(F.col("doc_id").alias("block_id"), "text", "lang"), "block_id"
    )
    result = run_pipeline(snapshot, build_state(spark, sf_dir), max_len=1200)

    chunk_stats = (
        result.chunks.join(emb, result.chunks.block_id == emb.vec_id, "left_outer")
        .groupBy("lang")
        .agg(
            F.countDistinct("block_id").alias("n_docs_processed"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_id").alias("n_chunk_ids"),
            F.round(F.avg(F.length("chunk_text")), 2).alias("avg_chunk_chars"),
            F.count("vec_id").alias("n_vectors"),
        )
    )
    skipped = result.plan.to_skip.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_skipped")
    )
    return (
        chunk_stats.join(skipped, "lang", "full_outer")
        .na.fill(0, ["n_docs_processed", "n_chunks", "n_chunk_ids", "n_vectors", "n_docs_skipped"])
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
