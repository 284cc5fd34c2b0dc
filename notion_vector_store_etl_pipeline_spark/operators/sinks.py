"""Sinks (SURVEY.md §2.2): chunk JSONL (K1), state parquet/json commit
(K2), stale-delete set (K4 — computed relationally in
``operators.incremental``; the actual delete is a connector
``foreachPartition`` call).

JSONL is Spark's native JSON output (one object per line, one file per
partition) — at 100 TB the sink parallelism IS the partitioning, so
``repartition(n)`` before write controls file count/size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_chunks_jsonl(chunks: DataFrame, path: str, partitions: int | None = None) -> None:
    """Serialize chunk records `{"text", **metadata}` as JSONL
    (reference `:329-344`): one JSON object per line."""
    out = chunks
    if partitions is not None:
        out = out.repartition(partitions)
    out.write.mode("overwrite").json(path)


def read_chunks_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def chunk_records(chunks: DataFrame, ingested_at: str) -> DataFrame:
    """Shape chunk rows like the reference's upload records
    (`:310-326`): id, chunk_index, source, text, nested metadata.
    ``ingested_at`` is injected (not utcnow()) so output is
    deterministic and oracle-checkable."""
    return chunks.select(
        F.col("chunk_id").alias("id"),
        "chunk_index",
        F.col("source").alias("source_path"),
        F.col("content_hash").alias("source_hash"),
        F.col("chunk_text").alias("text"),
        F.struct(
            F.col("source").alias("source_file"),
            F.lit(ingested_at).alias("ingested_at"),
        ).alias("metadata"),
    )


def delete_stale_vectors(
    stale: DataFrame,
    delete_fn,
    id_col: str = "stale_vector_id",
    max_retries: int = 2,
    backoff_s: float = 0.5,
    sleep=None,
) -> int:
    """Push the stale-vector delete set to the remote store — the
    reference's ``delete_vs_files`` loop (`:609-614`), but parallel per
    partition: each executor task opens one client (``delete_fn`` is a
    factory-or-callable closed over credentials/config) and deletes its
    partition's ids, retrying each id up to ``max_retries`` times with
    exponential backoff (a 429/throttle storm must not be hammered
    back-to-back). A per-id terminal failure never fails the run — the
    reference's try/except-per-file — but it is never INVISIBLE either:
    failures count on a Spark accumulator and the total is returned, so
    a store that starts rejecting every delete (auth expiry, outage)
    shows up as a non-zero failure count instead of stale vectors
    silently accumulating while the run reports success.

    Scale shape: the delete set is usually tiny relative to the corpus
    (ids attached to CHANGED documents only), so partition count is the
    natural concurrency knob (`.repartition(n)` upstream = n parallel
    delete workers = the rate limit).
    """
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    failed = stale.sparkSession.sparkContext.accumulator(0)

    def run_partition(rows) -> None:
        for row in rows:
            vid = row[id_col]
            for attempt in range(max_retries + 1):
                try:
                    delete_fn(vid)
                    break
                except Exception:
                    if attempt == max_retries:
                        failed.add(1)  # skipped, but counted
                        break
                    do_sleep(backoff_s * (2**attempt))

    stale.select(id_col).foreachPartition(run_partition)
    return failed.value
