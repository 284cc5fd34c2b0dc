"""applyInPandasWithState: running per-user totals across microbatches
must equal the batch groupBy on the same data, and state must carry
across batches (two staged input files -> cumulative results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.streaming.stateful import running_user_totals

SF = "/root/testdata/sf0.001"


def test_running_totals_match_batch(spark, tmp_path):
    events = load_table(spark, SF, "events").select("user_id", "value")
    staged = str(tmp_path / "ev")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    # last emitted row per user = final running total
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM user_totals) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert got == want


def test_state_carries_across_microbatches(spark, tmp_path):
    # two staged files + maxFilesPerTrigger=1 -> two microbatches in one
    # run; the second batch must see state accumulated by the first
    staged = str(tmp_path / "ev2")
    b1 = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], "user_id: long, value: double")
    b1.coalesce(1).write.mode("append").parquet(staged)
    b2 = spark.createDataFrame([(1, 2.5), (3, 7.0)], "user_id: long, value: double")
    b2.coalesce(1).write.mode("append").parquet(staged)

    stream = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1).parquet(staged)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("carry")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)

    rows = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM carry) WHERE rn = 1"""
        ).collect()
    }
    # user 1 cumulative across both files; users 2/3 single-batch
    assert rows[1] == (3, 17.5)
    assert rows[2] == (1, 1.0)
    assert rows[3] == (1, 7.0)


def test_transform_with_state_matches_batch(spark, tmp_path):
    """transformWithStateInPandas variant must produce the same final
    running totals as the batch aggregate (and as the
    applyInPandasWithState variant, by transitivity)."""
    import pytest

    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState driver worker needs protobuf (not in container)",
    )
    from notion_vector_store_etl_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = load_table(spark, SF, "events").select("user_id", "value")
    staged = str(tmp_path / "ev_tws")
    events.write.parquet(staged)

    stream = spark.readStream.schema(events.schema).parquet(staged)
    q = (
        running_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("user_totals_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM user_totals_tws) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    }
    assert got == want
