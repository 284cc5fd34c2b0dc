"""Distributed HTTP fetch stage (reference S5, `Notion_openai_vector_etl.py:219-235`):
download a URL column to binary payloads with retry/backoff, as an
Arrow-batched ``mapInPandas`` stage.

The reference's sequential download loop becomes per-partition
parallelism; its retry policy is mirrored exactly:

- backoff schedule 0/1/2/4 s (4 attempts) — reference `:50`;
- retry only HTTP status in {429, 500, 502, 503, 504}, raise otherwise
  — reference `:231-234`;
- on exhausted retries the row fails (status = last error) rather than
  killing the task: at 100 TB a single dead URL must not fail a
  500k-row partition. Spark task retries (`spark.task.maxFailures`)
  still cover infrastructure faults.

The transport is injectable; there is no network in this environment,
so the default transport raises NotImplementedError and tests inject a
deterministic fake.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BACKOFF_DELAYS = (0, 1, 2, 4)  # reference `:50`
RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})  # reference `:233`

# transport: url -> (status_code, payload bytes)
Transport = Callable[[str], Tuple[int, bytes]]

FETCHED_SCHEMA = StructType(
    [
        StructField("block_id", LongType()),
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("attempts", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _default_transport(url: str) -> Tuple[int, bytes]:
    raise NotImplementedError(
        "no network access in this environment; inject a transport "
        "(requests.get wrapper) via fetch_urls(transport=...)"
    )


def fetch_with_retry(
    url: str,
    transport: Transport,
    delays: tuple = BACKOFF_DELAYS,
    sleep: Callable[[float], None] = time.sleep,
) -> Tuple[int, int, bytes | None]:
    """Returns (final_status, attempts, payload-or-None). Non-retryable
    error statuses return immediately; retryable ones exhaust the
    backoff schedule."""
    last_status = -1
    for attempt, delay in enumerate(delays, start=1):
        if delay:
            sleep(delay)
        status, payload = transport(url)
        last_status = status
        if status == 200:
            return status, attempt, payload
        if status not in RETRYABLE_STATUSES:
            return status, attempt, None
    return last_status, len(delays), None


def fetch_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "block_id",
    transport: Transport = _default_transport,
    delays: tuple = BACKOFF_DELAYS,
    sleep: Callable[[float], None] = time.sleep,
    transport_factory: Callable[[], Transport] | None = None,
) -> DataFrame:
    """(id, url) -> (id, url, status, attempts, payload) via mapInPandas.

    ``transport_factory`` (when given) builds the transport ONCE PER
    PARTITION inside the task — the hook per-partition-stateful
    wrappers (the token bucket) use to share this loop instead of
    duplicating it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tx = transport_factory() if transport_factory is not None else transport
        for pdf in it:
            out = {"block_id": [], "url": [], "status": [], "attempts": [], "payload": []}
            for bid, url in zip(pdf[id_col], pdf[url_col]):
                status, attempts, payload = fetch_with_retry(url, tx, delays, sleep)
                out["block_id"].append(bid)
                out["url"].append(url)
                out["status"].append(status)
                out["attempts"].append(attempts)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.select(id_col, url_col).mapInPandas(batches, FETCHED_SCHEMA)


class TokenBucket:
    """Per-task rate limiter for remote-API operators: ``rate`` tokens
    per second with burst up to ``burst``. One instance per partition =
    the reference's sequential-pages throttle (`:652-653`), but scoped
    so total cluster QPS = rate x partitions — the partition count is
    the cluster-wide rate knob, set it to budget/rate.

    Clock and sleep are injectable so tests measure the schedule
    instead of actually sleeping.
    """

    def __init__(
        self,
        rate: float,
        burst: int = 1,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if not rate > 0:  # also rejects NaN
            # fail at construction with a clear message, not as a
            # ZeroDivisionError at the first contended acquire() deep
            # inside an executor task ('unthrottled' is expressed by
            # not wrapping the transport, not by rate=0)
            raise ValueError(f"TokenBucket rate must be > 0, got {rate!r}")
        self.rate = float(rate)
        self.burst = int(burst)
        self._clock = clock
        self._sleep = sleep
        self._tokens = float(burst)
        self._last = clock()

    def acquire(self) -> None:
        now = self._clock()
        self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
        self._last = now
        if self._tokens < 1.0:
            wait = (1.0 - self._tokens) / self.rate
            self._sleep(wait)
            self._last = self._clock()
            self._tokens = 1.0
        self._tokens -= 1.0


def fetch_urls_throttled(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "block_id",
    transport: Transport = _default_transport,
    rate_per_task: float = 10.0,
    burst: int = 1,
    delays: tuple = BACKOFF_DELAYS,
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> DataFrame:
    """``fetch_urls`` with a per-task token bucket in front of every
    request — retries consume tokens too (a 429 storm must not bypass
    the throttle that prevents it). Delegates to :func:`fetch_urls`'
    loop via ``transport_factory`` so the two operators cannot drift;
    the factory runs once per partition, giving each task its own
    bucket (total cluster QPS = rate x partitions)."""
    # validate on the DRIVER, before any task launches
    TokenBucket(rate_per_task, burst, clock=clock, sleep=sleep)

    def factory() -> Transport:
        bucket = TokenBucket(rate_per_task, burst, clock=clock, sleep=sleep)

        def throttled(url: str) -> Tuple[int, bytes]:
            bucket.acquire()
            return transport(url)

        return throttled

    return fetch_urls(
        df,
        url_col=url_col,
        id_col=id_col,
        delays=delays,
        sleep=sleep,
        transport_factory=factory,
    )
