"""Streaming session windows equal the batch session_window aggregate
on the same input (the engine merges touching sessions incrementally;
the result set must not depend on micro-batch boundaries).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming.windows import (
    stream_session_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_session_equals_batch(spark, tmp_path):
    import glob
    import os

    events = load_table(spark, SF, "events").select("user_id", "value", "ts")
    staged = str(tmp_path / "ev")
    # several time-ordered files -> several micro-batches that advance
    # the watermark monotonically (random batch order would make the
    # watermark drop genuinely-late data, which is correct behavior but
    # not what this equality test measures). part index = ts range, and
    # the file source picks files in mtime order -> pin mtimes to match.
    events.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.parquet(staged)
    for i, f in enumerate(sorted(glob.glob(f"{staged}/part-*.parquet"))):
        os.utime(f, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    q = (
        stream_session_counts(stream, gap="10 minutes", watermark="30 minutes")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sessions_stream").collect()
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in (
            events.groupBy(
                F.session_window("ts", "10 minutes").alias("w"), "user_id"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id",
                "n_events",
                "sum_value",
            )
        ).collect()
    )
    assert got == want
    assert len(got) > 0
