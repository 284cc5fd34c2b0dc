"""Event-stream queries (SURVEY.md §2.3 F1, §2.7 A1/A6, §2.10, §2.11 JSON):
filters, conditional aggregation, every-Nth sampling, tumbling windows,
range/theta and as-of self-joins, JSON property extraction.

Timestamp discipline: the fixture `events.ts` is nanosecond parquet;
Spark truncates to microseconds while DuckDB keeps nanos. Every
comparison/output therefore goes through `unix_micros` (Spark) ↔
`epoch_us` (DuckDB), which truncate identically — exact integer
arithmetic on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "filter_isin_notnull",
    oracle="""
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type IN ('click', 'purchase') AND props IS NOT NULL AND value > 5.0
    """,
    doc="Type-set membership + null guard (reference F1 block-type filter).",
)
def filter_isin_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("props").isNotNull()
        & (F.col("value") > 5.0)
    ).select("event_id", "event_type", F.round("value", 2).alias("value"))


@register(
    "agg_status_counts",
    oracle="""
    SELECT event_type,
           count(*)                                         AS n_events,
           CAST(sum(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           round(sum(value), 2)                             AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="One-pass conditional aggregation (reference A1 outcome counters).",
)
def agg_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).cast("bigint").alias("n_big"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "every_nth_row",
    oracle="""
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             row_number() OVER (ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn % 25 = 0
    """,
    doc="Every-Nth-row sampling (reference A6 progress cadence).",
)
def every_nth_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id")
    return (
        events.select("event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") % 25 == 0)
        .drop("rn")
    )


@register(
    "window_tumbling_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="1-hour tumbling window aggregation (F.window; streaming-shaped, run batch).",
)
def window_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) AS k_bucket,
           count(*) AS n_events
    FROM events
    WHERE props->>'$.k' IS NOT NULL
    GROUP BY 1
    """,
    doc="JSON property extraction (reference manifest/json fns, `:198-207`).",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select(k.alias("k_bucket"))
        .filter(F.col("k_bucket").isNotNull())
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "from_json_schema_read",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod,
           count(*) AS n_events,
           CAST(sum(CASE WHEN props->>'$.tag' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_tag,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1
    """,
    doc="Schema-on-read with a DECLARED StructType via from_json "
    "(SURVEY §1.3): fields absent from the payload (`tag`) come back "
    "null instead of erroring — the engine-side analogue of the "
    "reference's .get(key, default) tolerance (`:684-685`, `:691`).",
)
def from_json_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        F.from_json("props", "k BIGINT, tag STRING").alias("p")
    )
    return (
        parsed.select((F.col("p.k") % 10).alias("k_mod"), F.col("p.tag").alias("tag"), F.col("p.k").alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("tag").isNull(), 1).otherwise(0)).cast("long").alias("n_missing_tag"),
            F.sum("k").alias("sum_k"),
        )
    )


@register(
    "join_range_theta",
    oracle="""
    SELECT a.user_id,
           count(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + 600000000
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    GROUP BY a.user_id
    """,
    doc="Range/theta self-join: purchases within 10 min after a click. "
    "Equi part (user_id) keeps it a hash join; the theta bound is a post-filter.",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.unix_micros("ts").alias("a_us")
    )
    b = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.unix_micros("ts").alias("b_us")
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (b.b_us > a.a_us)
            & (b.b_us <= a.a_us + 600_000_000),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_asof_latest",
    oracle="""
    SELECT event_id, user_id, last_click_us FROM (
      SELECT event_id, user_id, event_type,
             last_value(click_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_click_us
      FROM (
        SELECT event_id, user_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
        FROM events
      )
    ) WHERE event_type = 'purchase'
    """,
    doc="As-of join: for each purchase, the user's latest strictly-earlier click.",
)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    return (
        events.withColumn("last_click_us", F.last(click_us, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_click_us")
    )


@register(
    "variant_extract_props",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) % 7 AS k_mod,
           count(*) AS n,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
    doc="Spark 4 VARIANT: parse_json once into the binary semi-structured "
    "type, then typed path access via try_variant_get — the store-once/"
    "shred-on-read layout for payloads too irregular for a declared "
    "schema (vs from_json_schema_read's fixed StructType).",
)
def variant_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select(F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.select((k % 7).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
