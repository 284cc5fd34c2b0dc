"""Streaming observability: a StreamingQueryListener captures per-batch
progress (rows, batch ids, sink description) — the ops surface a
production pipeline alerts on, asserted against the actual data volume.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


class CollectingListener(StreamingQueryListener):
    def __init__(self):
        self.started = []
        self.progress = []
        self.terminated = []

    def onQueryStarted(self, event):
        self.started.append(event.id)

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append((p.batchId, p.numInputRows, p.sink.description))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated.append(event.id)


def test_listener_observes_batches_and_volume(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    staged = str(tmp_path / "in")
    docs.repartition(3).write.parquet(staged)

    listener = CollectingListener()
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
            .writeStream.format("memory")
            .queryName("observed")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered async; wait for the terminate
        deadline = time.time() + 30
        while time.time() < deadline and not listener.terminated:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    assert listener.started, "no start event"
    assert listener.terminated, "no termination event"
    data_batches = [p for p in listener.progress if p[1] > 0]
    assert len(data_batches) == 3  # one per file
    assert sum(rows for _b, rows, _s in data_batches) == docs.count()
    assert all("Memory" in s for _b, _r, s in data_batches)
