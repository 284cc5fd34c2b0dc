"""Fetch-stage tests: the reference's retry/backoff policy (`:219-235`)
with a deterministic fake transport, driven through the real
mapInPandas stage."""

from __future__ import annotations

import pytest

from notion_vector_store_etl_pipeline_spark.operators.fetch import (
    BACKOFF_DELAYS,
    fetch_urls,
    fetch_with_retry,
)


def _flaky_transport_factory(fail_times: int, status: int = 503):
    calls = {"n": 0}

    def transport(url):
        calls["n"] += 1
        if calls["n"] <= fail_times:
            return status, b""
        return 200, f"payload:{url}".encode()

    return transport


def test_retry_succeeds_after_transient_failures():
    sleeps = []
    status, attempts, payload = fetch_with_retry(
        "u", _flaky_transport_factory(2), sleep=sleeps.append
    )
    assert (status, attempts) == (200, 3)
    assert payload == b"payload:u"
    assert sleeps == [1, 2]  # backoff schedule consumed in order


def test_non_retryable_fails_immediately():
    sleeps = []
    status, attempts, payload = fetch_with_retry(
        "u", lambda url: (404, b""), sleep=sleeps.append
    )
    assert (status, attempts, payload) == (404, 1, None)
    assert sleeps == []


def test_retries_exhausted():
    status, attempts, payload = fetch_with_retry(
        "u", lambda url: (503, b""), sleep=lambda s: None
    )
    assert (status, attempts, payload) == (503, len(BACKOFF_DELAYS), None)


def test_fetch_urls_mapinpandas(spark):
    df = spark.createDataFrame(
        [(1, "http://x/a"), (2, "http://x/b")], "block_id: long, url: string"
    )

    def transport(url):
        if url.endswith("/b"):
            return 404, b""
        return 200, f"ok:{url}".encode()

    out = {r.block_id: (r.status, r.attempts, r.payload) for r in
           fetch_urls(df, transport=transport, sleep=lambda s: None).collect()}
    assert out[1] == (200, 1, b"ok:http://x/a")
    assert out[2] == (404, 1, None)
