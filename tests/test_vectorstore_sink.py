"""Vector-store sink (custom Python DataSource writer): parallel task
uploads, manifest-gated atomic commit, overwrite retirement, and the
abort path (a failing job publishes nothing).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.sources import load_table
from notion_vector_store_etl_pipeline_spark.sources.vectorstore import (
    MANIFEST,
    read_store,
    register_vectorstore_sink,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(4)
    )


def test_append_commit_and_readback(spark, tmp_path):
    register_vectorstore_sink(spark)
    store = str(tmp_path / "store")
    docs = _docs(spark)
    docs.write.format("vectorstore").option("path", store).mode("append").save()

    manifest = json.load(open(os.path.join(store, MANIFEST)))
    assert len(manifest["files"]) == 4  # one upload per partition
    assert sum(f["rows"] for f in manifest["files"].values()) == docs.count()

    got = read_store(spark, store)
    assert got.count() == docs.count()
    assert set(got.columns) == {"doc_id", "lang", "n_chars"}

    # append again: file set grows, rows double
    docs.write.format("vectorstore").option("path", store).mode("append").save()
    assert read_store(spark, store).count() == 2 * docs.count()


def test_overwrite_retires_previous_files(spark, tmp_path):
    register_vectorstore_sink(spark)
    store = str(tmp_path / "store")
    docs = _docs(spark)
    docs.write.format("vectorstore").option("path", store).mode("append").save()
    first_files = set(json.load(open(os.path.join(store, MANIFEST)))["files"])

    small = docs.filter(F.col("doc_id") < 10).repartition(1)
    small.write.format("vectorstore").option("path", store).mode("overwrite").save()

    manifest = json.load(open(os.path.join(store, MANIFEST)))
    assert set(manifest["files"]).isdisjoint(first_files)
    assert read_store(spark, store).count() == small.count()
    # retired bytes are gone from disk, not just from the manifest
    for name in first_files:
        assert not os.path.exists(os.path.join(store, name))


def test_failed_job_publishes_nothing(spark, tmp_path):
    register_vectorstore_sink(spark)
    store = str(tmp_path / "store")
    docs = _docs(spark)
    docs.write.format("vectorstore").option("path", store).mode("append").save()
    before = json.load(open(os.path.join(store, MANIFEST)))

    @F.udf("long")
    def boom(v):
        if v >= 0:
            raise RuntimeError("injected upload failure")
        return v

    bad = docs.withColumn("doc_id", boom("doc_id"))
    with pytest.raises(Exception):
        bad.write.format("vectorstore").option("path", store).mode("overwrite").save()

    # the failed overwrite changed NOTHING: same manifest, same data
    after = json.load(open(os.path.join(store, MANIFEST)))
    assert after == before
    assert read_store(spark, store).count() == docs.count()


def test_txn_id_makes_replay_a_noop(spark, tmp_path):
    """A write tagged with an already-committed txn id publishes
    nothing — the exactly-once guarantee for replayed foreachBatch
    epochs."""
    register_vectorstore_sink(spark)
    store = str(tmp_path / "store")
    docs = _docs(spark)

    for _ in range(2):  # second write = replay of the same epoch
        docs.write.format("vectorstore").option("path", store).option(
            "txn_id", "epoch-7"
        ).mode("append").save()

    manifest = json.load(open(os.path.join(store, MANIFEST)))
    # numeric-suffixed ids track as ONE max-epoch per prefix (Delta's
    # appId/version dedup) so the manifest stays O(writers), not
    # O(epochs) — the txns list is only for non-numeric ids
    assert manifest["txn_max"] == {"epoch": 7}
    assert manifest["txns"] == []
    assert read_store(spark, store).count() == docs.count()  # not doubled
    # no staged garbage left behind by the replay
    assert os.listdir(os.path.join(store, "_staging")) == []

    # a NEW txn id still appends
    docs.write.format("vectorstore").option("path", store).option(
        "txn_id", "epoch-8"
    ).mode("append").save()
    assert read_store(spark, store).count() == 2 * docs.count()
    manifest = json.load(open(os.path.join(store, MANIFEST)))
    assert manifest["txn_max"] == {"epoch": 8}

    # an EARLIER epoch than the max is also a replay (epochs of one
    # sequential streaming writer commit in order) — still a no-op
    docs.write.format("vectorstore").option("path", store).option(
        "txn_id", "epoch-7"
    ).mode("append").save()
    assert read_store(spark, store).count() == 2 * docs.count()

    # non-numeric ids keep the explicit-list behavior
    docs.write.format("vectorstore").option("path", store).option(
        "txn_id", "adhoc"
    ).mode("append").save()
    manifest = json.load(open(os.path.join(store, MANIFEST)))
    assert manifest["txns"] == ["adhoc"]
    assert read_store(spark, store).count() == 3 * docs.count()


def test_read_store_never_committed_reads_empty(spark, tmp_path):
    """A store that was never committed to (no manifest — e.g. a
    zero-row streaming run whose foreachBatch never fired) reads as an
    empty frame, not a FileNotFoundError crash."""
    assert read_store(spark, str(tmp_path / "nostore")).count() == 0
