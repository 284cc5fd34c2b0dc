"""Stream-static join + streaming-dedup parity (SURVEY.md §2.10):
each streaming shape must agree with its batch twin on the same fixed
input, mirroring how the reference's incremental semantics are the
same whether replayed in one batch or resumed run-by-run
(`README.md:458-466`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming import (
    stream_dedup_first_wins,
    stream_static_enrich,
    stream_status_counts,
)

SF = "/root/testdata/sf0.001"


def _staged_stream(spark, tmp_path, name="events_stream"):
    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    staged = str(tmp_path / name)
    events.write.parquet(staged)
    return events, spark.readStream.schema(events.schema).parquet(staged)


def test_stream_static_join_matches_batch(spark, tmp_path):
    events, stream = _staged_stream(spark, tmp_path)
    users = (
        load_table(spark, SF, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )

    out = stream_static_enrich(stream, users)
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.event_id, r.c_mktsegment)
        for r in spark.sql("SELECT event_id, c_mktsegment FROM enriched").collect()
    }
    want = {
        (r.event_id, r.c_mktsegment)
        for r in events.join(users, "user_id", "left_outer")
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_dedup_matches_batch_key_set(spark, tmp_path):
    events, stream = _staged_stream(spark, tmp_path, "events_dedup")

    out = stream_dedup_first_wins(stream, keys=["user_id", "event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT user_id, event_type FROM deduped").collect()
    got_keys = {(r.user_id, r.event_type) for r in got}
    want_keys = {
        (r.user_id, r.event_type)
        for r in events.select("user_id", "event_type").dropDuplicates().collect()
    }
    # exactly one surviving event per key, same key set as batch dedup
    assert len(got) == len(got_keys)
    assert got_keys == want_keys


def test_stream_status_counts_match_batch(spark, tmp_path):
    events, stream = _staged_stream(spark, tmp_path, "events_counts")

    out = stream_status_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("status_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM status_counts").collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    assert got == want
    assert len(got) > 0
