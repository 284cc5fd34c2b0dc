"""Custom paginated data source (SURVEY §2.1 S1-S3): page-per-partition
scan must return exactly the rows of a direct parquet read, the number
of planned partitions must equal ceil(rows/page_size) (the reference's
cursor-loop iteration count), and page_size must be tunable.
"""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources.paginated import (
    register_paginated_source,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_paginated_scan_matches_direct_read(spark):
    register_paginated_source(spark)
    via_pages = spark.read.format("paginated").option("path", DOCS).load()
    direct = spark.read.parquet(DOCS)

    assert via_pages.schema == direct.schema
    got = {tuple(r) for r in via_pages.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want


def test_page_partitioning(spark):
    register_paginated_source(spark)
    n_rows = spark.read.parquet(DOCS).count()
    for page_size in (100, 37):
        df = (
            spark.read.format("paginated")
            .option("path", DOCS)
            .option("page_size", str(page_size))
            .load()
        )
        assert df.rdd.getNumPartitions() == math.ceil(n_rows / page_size)
        assert df.count() == n_rows


def test_paginated_supports_downstream_ops(spark):
    register_paginated_source(spark)
    df = spark.read.format("paginated").option("path", DOCS).load()
    agg = df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in agg) == spark.read.parquet(DOCS).count()


@pytest.mark.slow
def test_paginated_stream_reader_cursor_batches(spark, tmp_path):
    """readStream over the paginated source: the cursor advances
    pages_per_batch*page_size rows per micro-batch, all rows arrive
    exactly once, and the checkpointed cursor resumes without
    re-reading (the reference's resumable has_more loop, `:446-456`,
    with offsets owned by Structured Streaming)."""
    import time

    from notion_vector_store_etl_pipeline_spark.sources.paginated import (
        register_paginated_source,
    )

    register_paginated_source(spark)
    path = "/root/testdata/sf0.001/documents.parquet"
    expected = spark.read.parquet(path).count()

    ckpt = str(tmp_path / "pg_ckpt")
    out = str(tmp_path / "pg_out")

    def run_until_caught_up():
        q = (
            spark.readStream.format("paginated")
            .option("path", path)
            .option("page_size", "100")
            .option("pages_per_batch", "2")
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                q.processAllAvailable()
                progress = q.lastProgress
                if progress and progress["numInputRows"] == 0:
                    break
                time.sleep(0.2)
        finally:
            q.stop()

    run_until_caught_up()
    got = spark.read.parquet(out)
    assert got.count() == expected
    assert got.select("doc_id").distinct().count() == expected  # exactly once

    # resume from the checkpoint: nothing new to read -> no duplicates
    run_until_caught_up()
    got2 = spark.read.parquet(out)
    assert got2.count() == expected
    assert got2.select("doc_id").distinct().count() == expected
