"""Structured Streaming parity (SURVEY.md §2.10): the streaming
tumbling-window aggregation over a file-source stream must agree with
the batch `window_tumbling_counts` on the same fixed input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming import stream_tumbling_counts

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch_windows(spark, tmp_path):
    # stage the (ns-timestamp-converted) events as a streamable parquet dir
    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    staged = str(tmp_path / "events_stream")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    out = stream_tumbling_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (str(r.w_start), r.event_type): (r.n_events, r.sum_value)
        for r in (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
            .collect()
        )
    }
    assert got == want
    assert len(got) > 0
