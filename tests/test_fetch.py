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


def test_flaky_transport_retry_schedule_inside_executor(spark):
    """VERDICT r1 item 8: drive retry/backoff through the real
    distributed stage (multiple partitions -> multiple executor-side
    Python workers) and assert the reference's exact schedule
    (`:50`, `:231-234`) — attempts per row AND the delays slept."""
    import json

    class _FlakyRecordingTransport:
        """Stateful flaky transport whose behavior is keyed on the URL:
        ``.../r{N}`` succeeds on attempt N (503 before), ``.../e404`` is a
        hard error. The paired ``sleep`` records the backoff delays actually
        taken, and the success payload embeds them — so the schedule is
        observable from the driver even though the retry loop runs inside
        executor Python workers (cloudpickle ships one instance per task;
        bound-method identity keeps sleep and transport sharing state)."""

        def __init__(self):
            self.counts: dict = {}
            self.cur_url = None
            self.cur_delays: list = []

        def sleep(self, d):
            self.cur_delays.append(d)

        def __call__(self, url):
            import json

            if url != self.cur_url:  # rows are sequential within a batch
                self.cur_url = url
                self.cur_delays = []
            n = self.counts.get(url, 0) + 1
            self.counts[url] = n
            tag = url.rsplit("/", 1)[1]
            if tag.startswith("e"):
                return int(tag[1:]), b""
            if n < int(tag[1:]):
                return 503, b""
            return 200, json.dumps({"delays": self.cur_delays}).encode()

    rows = [
        (1, "http://x/r1"),   # immediate success, no sleeps
        (2, "http://x/r3"),   # two 503s -> sleeps [1, 2] -> success
        (3, "http://x/r4"),   # three 503s -> sleeps [1, 2, 4] -> success
        (4, "http://x/r99"),  # never succeeds -> exhausted after 4
        (5, "http://x/e404"), # non-retryable -> 1 attempt, no payload
    ]
    df = spark.createDataFrame(rows, "block_id: long, url: string").repartition(4)
    t = _FlakyRecordingTransport()
    out = {
        r.block_id: r
        for r in fetch_urls(df, transport=t, sleep=t.sleep).collect()
    }
    assert (out[1].status, out[1].attempts) == (200, 1)
    assert (out[2].status, out[2].attempts) == (200, 3)
    assert (out[3].status, out[3].attempts) == (200, 4)
    assert (out[4].status, out[4].attempts, out[4].payload) == (503, 4, None)
    assert (out[5].status, out[5].attempts, out[5].payload) == (404, 1, None)
    # the backoff schedule actually slept, per row (reference `:50`)
    assert json.loads(out[1].payload)["delays"] == []
    assert json.loads(out[2].payload)["delays"] == [1, 2]
    assert json.loads(out[3].payload)["delays"] == [1, 2, 4]


def test_token_bucket_schedule():
    """Deterministic clock: at rate=2/s with burst=1, the bucket spaces
    acquisitions 0.5s apart and never sleeps when tokens accrued."""
    from notion_vector_store_etl_pipeline_spark.operators.fetch import TokenBucket

    t = [0.0]
    slept = []

    def clock():
        return t[0]

    def sleep(s):
        slept.append(round(s, 6))
        t[0] += s

    b = TokenBucket(rate=2.0, burst=1, clock=clock, sleep=sleep)
    for _ in range(4):
        b.acquire()
    assert slept == [0.5, 0.5, 0.5]  # first is free (burst), rest paced

    # idle time refills up to burst, no sleep on the next acquire
    t[0] += 10.0
    b.acquire()
    assert slept == [0.5, 0.5, 0.5]


def test_throttled_fetch_paces_requests_per_task(spark):
    """In-executor: every request (including retries) passes the bucket;
    with rate=5/s a partition of 10 urls sleeps ~9/5s total."""
    import json
    import os
    import tempfile

    from notion_vector_store_etl_pipeline_spark.operators.fetch import (
        fetch_urls_throttled,
    )

    log_dir = tempfile.mkdtemp()

    def transport(url):
        return 200, url.encode()

    def fake_sleep(s):
        with open(os.path.join(log_dir, f"s-{os.getpid()}-{len(os.listdir(log_dir))}"), "w") as fh:
            fh.write(json.dumps(s))

    urls = spark.createDataFrame(
        [(i, f"https://api.example.com/p/{i}") for i in range(10)],
        "block_id long, url string",
    ).coalesce(1)  # ONE task -> one bucket paces all 10
    out = fetch_urls_throttled(
        urls, rate_per_task=5.0, burst=1, transport=transport, sleep=fake_sleep
    )
    rows = out.collect()
    assert len(rows) == 10 and all(r.status == 200 for r in rows)

    sleeps = []
    for f in os.listdir(log_dir):
        sleeps.append(json.load(open(os.path.join(log_dir, f))))
    # 9 paced waits of ~1/5s (the first is burst); real clock may accrue
    # partial tokens between calls so waits can only be <= 0.2
    assert len(sleeps) == 9, sleeps
    assert all(0 < s <= 0.2 + 1e-6 for s in sleeps), sleeps


def test_token_bucket_rejects_nonpositive_rate():
    """rate<=0 must fail at construction with a clear message, not as a
    ZeroDivisionError at the first contended acquire() inside an
    executor task ('unthrottled' = don't wrap the transport)."""
    import pytest

    from notion_vector_store_etl_pipeline_spark.operators.fetch import TokenBucket

    with pytest.raises(ValueError, match="rate must be > 0"):
        TokenBucket(0)
    with pytest.raises(ValueError, match="rate must be > 0"):
        TokenBucket(-1.5)
    with pytest.raises(ValueError, match="rate must be > 0"):
        TokenBucket(float("nan"))
