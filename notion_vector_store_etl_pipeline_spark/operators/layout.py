"""Physical-layout operators: bucketed tables for shuffle-free joins,
and small-file compaction.

These are the two layout levers that matter most at 100 TB:

- **Bucketing**: pre-shuffle both sides of a recurring join ONCE at
  write time (``bucketBy`` on the join key). Every later join on that
  key is exchange-free — Spark's scan reports the bucket
  partitioning, the join's distribution requirement is already
  satisfied, and the sort-merge/hash join runs bucket-to-bucket. For
  a fact table joined daily against the same key, this converts an
  every-run shuffle of the big side into a one-time cost.

- **Compaction**: streaming ingestion and fine-grained incremental
  writes produce many small files; at scale the metadata and open()
  overhead dominate the scan. Compaction rewrites a directory to
  ~``target_bytes`` files with a single coalesce (no shuffle — file
  concatenation, not redistribution) or repartition (when rebalancing
  skewed file sizes matters more than avoiding the shuffle).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the sort step
    of a sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables bucketed on ``on``: with matching bucket counts
    the plan contains NO Exchange on either side (asserted in
    tests/test_layout.py — a regression that re-introduces the shuffle
    fails CI)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def n_data_files(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    rebalance: bool = False,
) -> int:
    """Rewrite the parquet directory at ``path`` to ceil(size/target)
    files. ``rebalance=False`` uses coalesce (narrow — tasks merge
    neighbor files, no shuffle); ``rebalance=True`` uses a round-robin
    repartition (one shuffle, but output files are size-balanced even
    when the inputs are skewed). Returns the new file count.

    The rewrite goes to a sibling temp dir and swaps in only when
    fully written — a crashed compaction leaves the data intact, either
    at ``path`` or as a ``.old-*`` sibling (the same swap discipline —
    and the same ``.old-`` naming — as ``operators.incremental
    .commit_state``, so ``recover_state`` restores it; this function
    calls it on entry, covering a crash between its own two renames on
    the NEXT compaction, and startup readers that call recover_state
    are covered immediately).
    """
    import glob
    import shutil
    import uuid

    from notion_vector_store_etl_pipeline_spark.operators.incremental import (
        recover_state,
    )

    # a prior compaction crash between the two renames left `path`
    # missing and the last good data alive as `.old-*` — restore first
    recover_state(path)
    # tmp droppings from crashed rewrites are safe to clear now
    for stale in glob.glob(f"{path}.compact-*"):
        shutil.rmtree(stale, ignore_errors=True)

    n_files = max(1, math.ceil(dir_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files) if rebalance else df.coalesce(n_files)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_data_files(path)
