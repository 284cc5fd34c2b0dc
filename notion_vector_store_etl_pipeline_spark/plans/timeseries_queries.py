"""Time-series operators wave 2: Spark's native session_window (the
state-store-backed sessionizer, vs the gaps-and-islands batch twin in
`extended_queries.window_session_gap`) and date-spine gap filling
(every hour present, zero-filled — the shape feature pipelines need
before resampling/interpolation).

Boundary semantics: session_window merges an event iff it starts
STRICTLY before current_end = prev_ts + gap, so an exactly-30-min gap
starts a NEW session — the islands oracle uses `>=` accordingly
(window_session_gap's `>` convention merges the boundary instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "session_window_native",
    oracle="""
    SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
           count(*) AS n_events
    FROM (
      SELECT user_id, us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN lag(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    >= 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, session_id
    """,
    doc="Native F.session_window (30-min inactivity gap): merge-on-overlap "
    "sessionization in the aggregation operator itself — in streaming this "
    "is state-store-backed with watermark eviction; the oracle replays the "
    "same strict-boundary semantics as gaps-and-islands.",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


@register(
    "scd2_intervals",
    oracle="""
    SELECT user_id,
           event_type AS state,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(lead(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS BIGINT) AS valid_to_us,
           CASE WHEN lead(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
             THEN TRUE ELSE FALSE END AS is_current
    FROM events
    """,
    doc="SCD type-2 interval construction from a change stream: each "
    "update becomes a versioned row with [valid_from, valid_to) via "
    "lead(), open-ended current row flagged — the state-history twin of "
    "the manifest's last-writer-wins upsert (`state_merge_upsert`). One "
    "shuffle on the entity key; the as-of lookup against these intervals "
    "is `join_asof_latest`.",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    nxt = F.lead(us).over(w)
    return events.select(
        "user_id",
        F.col("event_type").alias("state"),
        us.alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    counts AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           coalesce(counts.n, 0) AS n_errors,
           coalesce(counts.sum_value, 0.0) AS sum_value
    FROM spine LEFT JOIN counts ON spine.h = counts.h
    """,
    doc="Date-spine gap filling: generate the full hourly spine with "
    "sequence()+explode (one row -> N, no shuffle), left-join the sparse "
    "hourly aggregate, zero-fill the holes. The spine generation is O(1) "
    "input rows regardless of data size; the join key is the truncated "
    "hour so AQE broadcasts the small side.",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    counts = (
        events.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    return spine.join(counts, "h", "left_outer").select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.coalesce("n", F.lit(0)).alias("n_errors"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


@register(
    "pit_interval_lookup",
    oracle="""
    WITH versions AS (
      SELECT user_id, event_id AS version_id,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to_us
      FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id AS purchase_id, v.version_id,
           CAST(epoch_us(p.ts) - v.valid_from_us AS BIGINT) AS age_us
    FROM events p
    JOIN versions v
      ON p.user_id = v.user_id
     AND epoch_us(p.ts) >= v.valid_from_us
     AND (v.valid_to_us IS NULL OR epoch_us(p.ts) < v.valid_to_us)
    WHERE p.event_type = 'purchase'
    """,
    doc="Point-in-time interval lookup: each purchase joins the signup "
    "version whose [valid_from, valid_to) contains it — the consumer "
    "side of scd2_intervals and the dimensional form of the as-of join "
    "(join_asof_latest). Equi key (user_id) carries the hash join; the "
    "interval containment is the residual; at most one interval matches "
    "per probe by construction.",
)
def pit_interval_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    versions = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            us.alias("valid_from_us"),
        )
        .withColumn("valid_to_us", F.lead("valid_from_us").over(
            Window.partitionBy("user_id").orderBy("valid_from_us", "version_id")
        ))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), us.alias("p_us")
    )
    return (
        purchases.join(
            versions,
            (purchases.p_user == versions.user_id)
            & (F.col("p_us") >= F.col("valid_from_us"))
            & (F.col("valid_to_us").isNull() | (F.col("p_us") < F.col("valid_to_us"))),
        )
        .select(
            "purchase_id",
            "version_id",
            (F.col("p_us") - F.col("valid_from_us")).cast("long").alias("age_us"),
        )
    )
