"""Failure/recovery semantics (SURVEY §1.4, §4):

- streaming checkpoint resume: re-running a checkpointed query over a
  source that gained new files processes ONLY the new data — the
  Structured Streaming twin of the reference's interrupted-run resume
  (`README.md:458-466`, manifest saved per file `:731`).
- task-retry fault tolerance: a transiently-failing Arrow stage
  succeeds on Spark's task retry — where the reference's
  retry/backoff loop (`:219-235`, BACKOFF_DELAYS `:50`) lives in the
  engine (SURVEY §2.1 S5: "retries = Spark task retries").
"""

from __future__ import annotations

import pytest

import os

from pyspark.sql import SparkSession, functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    events = load_table(spark, SF, "events").select("event_id", "ts", "user_id", "value")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    first.write.mode("append").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    # "interrupted run resumes": new files arrive, same checkpoint
    second.write.mode("append").parquet(src)
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == events.count()  # no duplicates, nothing missed
    assert result.select("event_id").distinct().count() == events.count()


_RETRY_SCRIPT = """
import os, sys
from pyspark.sql import SparkSession

marker_dir = sys.argv[1]
# local[N, maxFailures]: task retries on (the default local master
# fails fast); getOrCreate would reuse the test session, so this runs
# in its own interpreter/JVM
spark = (SparkSession.builder.master("local[4, 2]").appName("retry-test")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def flaky(it):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
    if not os.path.exists(marker):
        open(marker, "w").close()
        raise RuntimeError("transient failure on first attempt")
    for pdf in it:
        yield pdf

docs = (spark.read.parquet(sys.argv[2] + "/documents.parquet")
        .repartition(2).select("doc_id", "lang"))
n = docs.mapInPandas(flaky, docs.schema).count()
assert n == docs.count(), (n, docs.count())
assert len(os.listdir(marker_dir)) == 2, os.listdir(marker_dir)
print("RETRY_OK", n)
spark.stop()
"""


@pytest.mark.slow
def test_task_retry_recovers_transient_failure(tmp_path):
    import subprocess
    import sys

    marker_dir = str(tmp_path / "attempts")
    os.makedirs(marker_dir, exist_ok=True)
    proc = subprocess.run(
        [sys.executable, "-c", _RETRY_SCRIPT, marker_dir, SF],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RETRY_OK" in proc.stdout
