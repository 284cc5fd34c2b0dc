"""Grouped-map (applyInPandas), merge-upsert, ordering, sampling and
histogram queries — rounding out the API surface a user of the engine
would reach for.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table


@register(
    "group_normalize_pandas",
    oracle="""
    SELECT vec_id, label,
           round((norm - avg(norm) OVER (PARTITION BY label))
                 / nullif(stddev_samp(norm) OVER (PARTITION BY label), 0), 4) AS z_norm
    FROM (
      SELECT vec_id, label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS norm
      FROM embeddings
    )
    """,
    doc="Grouped-map via applyInPandas: per-label z-score of vector norms "
    "(each group one pandas frame — the custom-aggregation escape hatch).",
)
def group_normalize_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        norms = pdf["embedding"].map(
            lambda a: float(np.sqrt(np.dot(np.asarray(a, dtype=np.float64), np.asarray(a, dtype=np.float64))))
        )
        sd = norms.std(ddof=1)  # sample stddev, matches stddev_samp
        if sd and sd > 0:
            z = (norms - norms.mean()) / sd
            # round half-AWAY-from-zero to match Spark/DuckDB round();
            # Series.round is banker's (half-even), which diverges on
            # .00005 boundaries
            z = pd.Series(
                np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4,
                index=pdf.index,
            )
        else:
            # single-row or zero-variance group: the oracle's
            # nullif(stddev,0) division yields NULL — emit real NULLs,
            # not NaN (the parity hash distinguishes them)
            z = pd.Series([None] * len(norms), dtype=object, index=pdf.index)
        return pd.DataFrame(
            {"vec_id": pdf["vec_id"], "label": pdf["label"], "z_norm": z}
        )

    return emb.groupBy("label").applyInPandas(
        normalize, "vec_id bigint, label int, z_norm double"
    )


@register(
    "state_merge_upsert",
    oracle="""
    WITH state AS (
      SELECT doc_id AS block_id, 'v1' AS version, sha256(text) AS h
      FROM documents WHERE doc_id % 2 = 0
    ), updates AS (
      SELECT doc_id AS block_id, 'v2' AS version, sha256(text || '!') AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT coalesce(u.block_id, s.block_id) AS block_id,
           coalesce(u.version, s.version)   AS version,
           coalesce(u.h, s.h)               AS h
    FROM state s FULL OUTER JOIN updates u ON s.block_id = u.block_id
    """,
    doc="MERGE-style upsert (updates win, unmatched rows kept from both "
    "sides) — the relational core of the manifest upsert (`:719-730`) "
    "and of a Delta/Iceberg MERGE at scale.",
)
def state_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    state = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("block_id"),
        F.lit("v1").alias("version"),
        F.sha2("text", 256).alias("h"),
    )
    updates = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("block_id"),
        F.lit("v2").alias("version"),
        F.sha2(F.concat(F.col("text"), F.lit("!")), 256).alias("h"),
    )
    s, u = state.alias("s"), updates.alias("u")
    return s.join(u, F.col("s.block_id") == F.col("u.block_id"), "full_outer").select(
        F.coalesce(F.col("u.block_id"), F.col("s.block_id")).alias("block_id"),
        F.coalesce(F.col("u.version"), F.col("s.version")).alias("version"),
        F.coalesce(F.col("u.h"), F.col("s.h")).alias("h"),
    )


@register(
    "sort_nulls_ordering",
    oracle="""
    SELECT lookup_key, o_totalprice
    FROM (
      SELECT k.lookup_key, round(o.o_totalprice, 2) AS o_totalprice
      FROM (SELECT unnest([1, 3, 999999991, 7, 999999993]) AS lookup_key) k
      LEFT JOIN orders o ON k.lookup_key = o.o_orderkey
    )
    ORDER BY o_totalprice ASC NULLS FIRST, lookup_key DESC
    LIMIT 5
    """,
    doc="Explicit null-ordering parity: Spark defaults NULLS FIRST on ASC, "
    "DuckDB defaults NULLS LAST — both sides pinned explicitly.",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = spark.createDataFrame(
        [(1,), (3,), (999999991,), (7,), (999999993,)], "lookup_key: bigint"
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        keys.join(orders, keys.lookup_key == orders.o_orderkey, "left_outer")
        .select("lookup_key", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").asc_nulls_first(), F.col("lookup_key").desc())
        .limit(5)
    )


@register(
    "sample_deterministic",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE (doc_id * 2654435761) % 100 < 10
    """,
    doc="Deterministic ~10% sample via multiplicative hashing — reproducible "
    "across engines/runs, unlike rng-based df.sample.",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter((F.col("doc_id") * 2654435761) % 100 < 10).select("doc_id", "lang")


@register(
    "histogram_width_bucket",
    oracle="""
    -- width_bucket emulation (DuckDB 1.0 lacks it): bucket i covers
    -- [min + (i-1)*w, min + i*w), 0 below min, n+1 at/above max
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 21
                     ELSE floor(o_totalprice / 25000.0) + 1 END AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket (one shuffle, 20 groups).",
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket", F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20))
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "cogroup_conversion_stats",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS n_clicks, min(epoch_us(ts)) AS first_click_us
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT user_id, count(*) AS n_purchases, min(epoch_us(ts)) AS first_purchase_us
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           CASE WHEN c.first_click_us IS NOT NULL AND p.first_purchase_us IS NOT NULL
                     AND p.first_purchase_us > c.first_click_us
                THEN CAST(p.first_purchase_us - c.first_click_us AS BIGINT) END
             AS first_conversion_us
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    doc="API DEMO — production code should use the relational twin "
    "`join_full_outer_coalesce` (same answer, ~10x cheaper). Co-grouped "
    "applyInPandas (SURVEY §2.11 grouped-map surface, the two-sided "
    "variant): clicks and purchases land as two aligned pandas frames "
    "per user; either side may be empty (outer-cogroup semantics). The "
    "same alignment as a full-outer join of two aggregates — which is "
    "exactly what the oracle computes, so the escape hatch is "
    "correctness-pinned to the relational equivalent. Work bound: "
    "cogroup grouped-map invokes Python once per GROUP and each call "
    "returns a fresh 1-row pandas frame, so cost is O(groups x ~2ms) "
    "regardless of row volume (~1.5k user groups = ~3s at sf0.1) — "
    "intrinsic to the API's execution model, not a batch-size tuning "
    "miss; kept registered as coverage of the cogroup surface only.",
)
def cogroup_conversion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", us.alias("us"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us")
    )

    def stats(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        (uid,) = key
        n_c, n_p = len(left), len(right)
        conv = None
        if n_c and n_p:
            fc, fp = int(left["us"].min()), int(right["us"].min())
            if fp > fc:
                conv = fp - fc
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [n_c],
                "n_purchases": [n_p],
                "first_conversion_us": [conv],
            }
        )

    return clicks.groupBy("user_id").cogroup(purchases.groupBy("user_id")).applyInPandas(
        stats,
        "user_id bigint, n_clicks bigint, n_purchases bigint, first_conversion_us bigint",
    )
