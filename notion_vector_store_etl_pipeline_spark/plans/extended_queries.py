"""Extended operator coverage: sliding + session windows, pivot/unpivot,
analytic window functions (lag/lead/percent_rank), PII masking, and
multimodal frame sampling — the remaining shapes a training-data
pipeline engine needs beyond the reference's own surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "window_sliding_counts",
    oracle="""
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS win_start,
             value
      FROM events
    )
    GROUP BY 1
    """,
    doc="1-hour windows sliding every 30 min (each event lands in 2 windows).",
)
def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_session_gap",
    oracle="""
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(min(us) AS BIGINT) AS session_start_us
    FROM (
      SELECT user_id, us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    > 1800000000 OR lag(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      )
    )
    GROUP BY user_id, session_id
    """,
    doc="Session windows (30-min inactivity gap) via gaps-and-islands — "
    "the batch twin of F.session_window for deterministic oracle parity.",
)
def window_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_ord = Window.partitionBy("user_id").orderBy(us, F.col("event_id"))
    prev = F.lag(us).over(w_ord)
    is_new = F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1).otherwise(0)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.sum(is_new).over(w_run).cast("bigint").alias("session_id"),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("session_start_us"),
    )


@register(
    "pivot_counts",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY 1
    """,
    doc="Pivot (long->wide): per-bucket counts by event type.",
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(value, 2) AS value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    ) WHERE l_orderkey <= 200
    """,
    doc="Unpivot/melt (wide->long) of lineitem measures.",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    melted = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"], ["quantity", "price"], "metric", "value"
    )
    return melted.withColumn("value", F.round("value", 2))


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 2)  AS delta_prev,
           lead(event_type) OVER w              AS next_type,
           round(percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id), 6)
             AS value_prank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
    doc="Analytic window functions: lag/lead deltas + percent_rank per user.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    w_val = Window.partitionBy("user_id").orderBy(F.col("value"), F.col("event_id"))
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.percent_rank().over(w_val), 6).alias("value_prank"),
    )


@register(
    "pii_mask",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '[0-9]', '#', 'g'),
                          '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<email>', 'g') AS masked
    FROM documents WHERE doc_id < 100
    """,
    doc="PII masking pass: digit + email redaction via regexp_replace.",
)
def pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    masked = F.regexp_replace(
        F.regexp_replace("text", "[0-9]", "#"),
        "[A-Za-z0-9._]+@[A-Za-z0-9.]+",
        "<email>",
    )
    return docs.select("doc_id", masked.alias("masked"))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(frame_id AS INTEGER) AS frame_id,
           sha256(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_id AS VARCHAR)) AS frame_key
    FROM (
      SELECT doc_id, unnest(range(0, (n_chars // 64) + 1, 4)) AS frame_id
      FROM documents
    )
    """,
    doc="Frame sampling plumbing: every-4th synthetic frame per document "
    "(sequence + posexplode; the decode itself is the stubbed mapInPandas stage).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = (F.col("n_chars") / F.lit(64)).cast("long") + 1
    frames = F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(4).cast("long"))
    exploded = docs.select("doc_id", F.explode(frames).alias("frame_id"))
    return exploded.select(
        "doc_id",
        F.col("frame_id").cast("int").alias("frame_id"),
        F.sha2(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("frame_id").cast("string")),
            256,
        ).alias("frame_key"),
    )
