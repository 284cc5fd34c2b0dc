"""SURVEY.md §1.1 / S5: binary document ingestion via Spark's
``binaryFile`` source — the engine-side replacement for the reference's
streaming HTTP download + 8 KiB sha256 hashing
(`Notion_openai_vector_etl.py:219-235`, `:102-107`). The scan carries
(path, modificationTime, length, content); content hashing is
`F.sha2` on the BinaryType column — bit-identical to hashlib over the
same bytes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _write_files(tmp_path, n=8):
    expected = {}
    for i in range(n):
        payload = (f"doc-{i}-" * (i + 1)).encode() + bytes(range(i + 1))
        p = tmp_path / f"doc_{i}.bin"
        p.write_bytes(payload)
        expected[f"doc_{i}.bin"] = (len(payload), hashlib.sha256(payload).hexdigest())
    return expected


def test_binaryfile_scan_matches_hashlib(spark, tmp_path):
    expected = _write_files(tmp_path)
    df = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            F.col("length"),
            F.lower(F.sha2("content", 256)).alias("sha"),
        )
    )
    got = {r["name"]: (r["length"], r["sha"]) for r in df.collect()}
    assert got == expected


def test_binaryfile_glob_and_pruning(spark, tmp_path):
    _write_files(tmp_path)
    (tmp_path / "ignore.txt").write_bytes(b"not a bin")
    # pathGlobFilter prunes at listing time — non-matching files are
    # never opened (the scan-level filter the reference applied by hand)
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(str(tmp_path))
    assert df.count() == 8
    # metadata-only projection must not materialize content
    sizes = df.select("length").agg(F.sum("length").alias("total")).collect()[0]["total"]
    assert sizes > 0


def test_null_payload_decodes_to_null_metadata(spark):
    """NULL payloads must produce NULL metadata from every decode stub —
    not zero-length decodes: the registered oracles compute
    octet_length(NULL) -> NULL and sha256(NULL) -> NULL, and stamping
    real-looking metadata (sha of b'', 1x1 dims) on rows with no
    payload at all both breaks parity and misrepresents the data."""
    from notion_vector_store_etl_pipeline_spark.operators.multimodal import (
        audio_features_stub,
        decode_image_stub,
    )

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, None)], "doc_id: long, payload: binary"
    )
    dec = {r.doc_id: r for r in decode_image_stub(df).collect()}
    assert dec[1].n_bytes == 6 and dec[1].payload_sha is not None
    assert dec[2].n_bytes is None
    assert dec[2].payload_sha is None
    assert dec[2].width is None and dec[2].height is None

    aud = {r.doc_id: r for r in audio_features_stub(df).collect()}
    assert aud[1].n_bytes == 6 and aud[1].n_frames == 0
    assert aud[2].n_bytes is None and aud[2].n_frames is None
    assert aud[2].duration_ms is None and aud[2].tail_bytes is None
