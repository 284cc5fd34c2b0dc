"""Stream-stream watermarked interval join vs its batch twin
(SURVEY.md §2.10): the same click→purchase pairs must come out of the
Structured Streaming join (with watermark-bounded state) as out of the
batch range/theta join on the same fixed input.
"""

from __future__ import annotations

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
