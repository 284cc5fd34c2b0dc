"""Stream-static join and streaming dedup (SURVEY.md §2.10).

Two more streaming shapes the reference's incremental semantics map to:

- **stream-static enrich**: each micro-batch of events joins a static
  dimension snapshot — the streaming twin of the manifest key-lookup
  (`Notion_openai_vector_etl.py:684`). The static side is re-planned per
  batch, so Catalyst broadcasts it when small; no stream state needed.
- **streaming dedup**: `dropDuplicates` over a watermarked stream — the
  reference's visited-set / skip-already-processed semantics
  (`:492-494`, `:691-694`) on an unbounded input. The watermark bounds
  the dedup state exactly like the manifest bounds reprocessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    events: DataFrame,  # streaming: (event_id, ts, user_id, event_type, value)
    users: DataFrame,  # static dim: (user_id, ...)
) -> DataFrame:
    """Per-batch left join of the event stream against a static dim."""
    return events.join(users, "user_id", "left_outer")


def stream_dedup_first_wins(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First event per key wins; duplicates within the watermark horizon
    are dropped.

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates(keys)``
    only evicts dedup state when the event-time column is part of the key
    subset, so keyed dedup state would grow without bound on an unbounded
    stream. The WithinWatermark variant dedups on the keys alone while
    still evicting each key's state once the watermark passes its first
    event — bounded memory with the same first-wins semantics per horizon.
    """
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_stream_interval_join(
    clicks: DataFrame,  # streaming: (event_id, user_id, ts, ...)
    purchases: DataFrame,  # streaming: (event_id, user_id, ts, ...)
    max_gap: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: purchases within ``max_gap`` after a
    click by the same user — the streaming twin of the batch
    `join_range_theta` query. Both sides are watermarked so the join
    state (buffered rows awaiting matches) is evicted once the event
    time passes the horizon; without watermarks a stream-stream join
    buffers forever. The equi key (user_id) keeps it a hash join;
    the time bound is the state-eviction condition.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            p.ts > c.ts AND
            p.ts <= c.ts + INTERVAL {max_gap}
            """
        ),
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )


def stream_status_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of the reference's run-outcome tallies
    (`:673-676`): global counts per event_type, update mode."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def stream_stream_interval_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its follow-up
    purchase when one lands inside the gap, else nulls — the
    "unconverted clicks" stream. Outer results can only be emitted once
    the watermark proves no match can still arrive, so null rows
    trail the inner rows by the watermark delay: correctness costs
    latency, not state (state is still evicted at the horizon).
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    return c.join(
        p,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            p.ts > c.ts AND
            p.ts <= c.ts + INTERVAL {max_gap}
            """
        ),
        "left_outer",
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )
