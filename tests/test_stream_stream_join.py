"""Stream-stream watermarked interval join vs its batch twin
(SURVEY.md §2.10): the same click→purchase pairs must come out of the
Structured Streaming join (with watermark-bounded state) as out of the
batch range/theta join on the same fixed input.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming import stream_stream_interval_join

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_matches_batch(spark, tmp_path):
    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks_b = events.filter(F.col("event_type") == "click")
    purchases_b = events.filter(F.col("event_type") == "purchase")

    c_path, p_path = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks_b.write.parquet(c_path)
    purchases_b.write.parquet(p_path)
    clicks_s = spark.readStream.schema(clicks_b.schema).parquet(c_path)
    purchases_s = spark.readStream.schema(purchases_b.schema).parquet(p_path)

    out = stream_stream_interval_join(clicks_s, purchases_s)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM ss_join").collect()
    }

    c, p = clicks_b.alias("c"), purchases_b.alias("p")
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            F.expr(
                "c.user_id = p.user_id AND p.ts > c.ts "
                "AND p.ts <= c.ts + INTERVAL 10 MINUTES"
            ),
        )
        .select(F.col("c.event_id").alias("click_id"), F.col("p.event_id").alias("purchase_id"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


@pytest.mark.slow
def test_stream_stream_left_outer_join_matches_batch(spark, tmp_path):
    """Outer variant: unconverted clicks appear exactly once with null
    purchase columns once the watermark passes; converted clicks match
    the batch inner pairs."""
    from notion_vector_store_etl_pipeline_spark.streaming.enrich import (
        stream_stream_interval_join_outer,
    )

    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks_b = events.filter(F.col("event_type") == "click")
    purchases_b = events.filter(F.col("event_type") == "purchase")

    import glob
    import os

    c_path, p_path = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks_b.write.parquet(c_path)
    purchases_b.write.parquet(p_path)
    # outer-null rows only flush once the GLOBAL watermark (min across
    # both inputs) passes click_ts + gap; a finite stream needs closing
    # punctuation (the standard heartbeat pattern) — a far-future
    # sentinel event on EACH side, delivered in a LATER micro-batch, so
    # the final watermark advance flushes all pending unconverted clicks
    def add_sentinel(base, path, etype):
        sentinel = base.agg(
            F.lit(-1).cast("long").alias("event_id"),
            F.date_add(F.max("ts"), 10).cast("timestamp").alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit(etype).alias("event_type"),
        )
        sentinel.write.mode("append").parquet(path)
        files = sorted(
            glob.glob(f"{path}/part-*.parquet"), key=os.path.getsize, reverse=True
        )
        for i, f in enumerate(files):  # big data file first, sentinel last
            os.utime(f, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    add_sentinel(purchases_b, p_path, "purchase")
    add_sentinel(clicks_b, c_path, "click")
    clicks_s = (
        spark.readStream.schema(clicks_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(c_path)
    )
    purchases_s = (
        spark.readStream.schema(purchases_b.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(p_path)
    )

    out = stream_stream_interval_join_outer(clicks_s, purchases_s)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM ss_join_outer").collect()
        if r.click_id != -1  # the punctuation event is not data
    }

    c, p = clicks_b.alias("c"), purchases_b.alias("p")
    want = {
        (r.click_id, r.purchase_id)
        for r in c.join(
            p,
            F.expr(
                """
                c.user_id = p.user_id AND
                p.ts > c.ts AND
                p.ts <= c.ts + INTERVAL 10 minutes
                """
            ),
            "left_outer",
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
        )
        .collect()
    }
    assert got == want
    assert any(pid is None for _cid, pid in got), "no unconverted clicks in fixture"
