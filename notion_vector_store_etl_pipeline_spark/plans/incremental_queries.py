"""Incremental-state queries (SURVEY.md §2.3 F3/F4, §2.6 J1/J2, §2.2 K4,
§7 phase 2). Snapshot and prior-state tables are derived from
`documents` with identical deterministic expressions on both engines
(FIXTURES.md "state-table queries"): sources src0..src9 are "already
processed"; doc_id%11 rows have a stale edit-time, doc_id%7 a stale
hash, doc_id%5 no vector ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.incremental import plan_increment
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

# Shared DuckDB CTE prefix defining the synthetic snapshot/state pair.
STATE_CTES = """
WITH snapshot AS (
  SELECT doc_id AS block_id, source AS src,
         'let-' || CAST(doc_id % 30 AS VARCHAR) AS let,
         sha256(text) AS content_hash
  FROM documents
), state AS (
  SELECT doc_id AS block_id,
         CASE WHEN doc_id % 11 = 0 THEN 'let-OLD'
              ELSE 'let-' || CAST(doc_id % 30 AS VARCHAR) END AS prior_let,
         CASE WHEN doc_id % 7 = 0 THEN sha256('stale') ELSE sha256(text) END AS prior_hash,
         CASE WHEN doc_id % 5 = 0 THEN CAST([] AS VARCHAR[])
              ELSE ['vf-' || CAST(doc_id AS VARCHAR), 'vf2-' || CAST(doc_id AS VARCHAR)] END
           AS vector_file_ids
  FROM documents
  WHERE regexp_matches(source, '^src[0-9]$')
)
"""


def build_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("block_id"),
        F.col("source").alias("src"),
        F.concat(F.lit("let-"), (F.col("doc_id") % 30).cast("string")).alias("let"),
        F.sha2("text", 256).alias("content_hash"),
    )


def build_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("source").rlike("^src[0-9]$"))
    sid = F.col("doc_id").cast("string")
    return docs.select(
        F.col("doc_id").alias("block_id"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("let-OLD"))
        .otherwise(F.concat(F.lit("let-"), (F.col("doc_id") % 30).cast("string")))
        .alias("prior_let"),
        F.when(F.col("doc_id") % 7 == 0, F.sha2(F.lit("stale"), 256))
        .otherwise(F.sha2("text", 256))
        .alias("prior_hash"),
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .otherwise(F.array(F.concat(F.lit("vf-"), sid), F.concat(F.lit("vf2-"), sid)))
        .alias("vector_file_ids"),
    )


def _plan(spark: SparkSession, sf_dir: str):
    return plan_increment(build_snapshot(spark, sf_dir), build_state(spark, sf_dir))


@register(
    "state_load",
    oracle=STATE_CTES
    + """
    SELECT block_id, prior_let, prior_hash,
           CAST(coalesce(len(vector_file_ids), 0) AS INTEGER) AS n_ids
    FROM state
    """,
    doc="State-table scan (reference S6 manifest load `:190-203`).",
)
def state_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = build_state(spark, sf_dir)
    return state.select(
        "block_id", "prior_let", "prior_hash", F.size("vector_file_ids").alias("n_ids")
    )


@register(
    "left_join_state",
    oracle=STATE_CTES
    + """
    SELECT s.block_id, s.src, s.let,
           t.prior_let,
           t.prior_hash IS NOT NULL AS has_state,
           CAST(coalesce(len(t.vector_file_ids), 0) AS INTEGER) AS n_ids
    FROM snapshot s LEFT JOIN state t ON s.block_id = t.block_id
    """,
    doc="Manifest key lookup as left-outer join (reference J1 `:684`).",
)
def left_join_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = _plan(spark, sf_dir)
    return plan.joined.select(
        "block_id",
        "src",
        "let",
        "prior_let",
        F.col("prior_hash").isNotNull().alias("has_state"),
        F.when(F.col("vector_file_ids").isNull(), F.lit(0))
        .otherwise(F.size("vector_file_ids"))
        .alias("n_ids"),
    )


@register(
    "incremental_changed",
    oracle=STATE_CTES
    + """
    SELECT s.block_id, s.src
    FROM snapshot s LEFT JOIN state t ON s.block_id = t.block_id
    WHERE NOT (t.block_id IS NOT NULL
               AND t.prior_let IS NOT DISTINCT FROM s.let
               AND coalesce(len(t.vector_file_ids), 0) > 0)
    """,
    doc="Cache-hit inverse: rows to process (reference F3 `:691-694`).",
)
def incremental_changed(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = _plan(spark, sf_dir)
    return plan.to_process.select("block_id", "src")


@register(
    "needs_vector_flag",
    oracle=STATE_CTES
    + """
    SELECT s.block_id,
           (t.block_id IS NULL
            OR coalesce(len(t.vector_file_ids), 0) = 0
            OR t.prior_hash IS DISTINCT FROM s.content_hash
            OR t.prior_let IS DISTINCT FROM s.let) AS needs_vector
    FROM snapshot s LEFT JOIN state t ON s.block_id = t.block_id
    """,
    doc="Re-vectorize predicate (reference F4 `:702-706`), null-safe.",
)
def needs_vector_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = _plan(spark, sf_dir)
    return plan.needs_vector.select("block_id", "needs_vector")


@register(
    "anti_join_unchanged",
    oracle=STATE_CTES
    + """
    SELECT s.block_id, s.src
    FROM snapshot s
    WHERE NOT EXISTS (
      SELECT 1 FROM state t
      WHERE t.block_id = s.block_id
        AND t.prior_let IS NOT DISTINCT FROM s.let
        AND coalesce(len(t.vector_file_ids), 0) > 0
    )
    """,
    doc="Incremental anti-join: survivors after dropping unchanged (reference J2).",
)
def anti_join_unchanged(spark: SparkSession, sf_dir: str) -> DataFrame:
    snapshot = build_snapshot(spark, sf_dir)
    state = build_state(spark, sf_dir)
    unchanged = state.filter(
        (F.size("vector_file_ids") > 0)
    ).select("block_id", F.col("prior_let").alias("let"))
    return snapshot.join(unchanged, ["block_id", "let"], "left_anti").select("block_id", "src")


@register(
    "stale_detect",
    oracle=STATE_CTES
    + """
    SELECT s.block_id, unnest(t.vector_file_ids) AS stale_vector_id
    FROM snapshot s JOIN state t ON s.block_id = t.block_id
    WHERE (coalesce(len(t.vector_file_ids), 0) = 0
           OR t.prior_hash IS DISTINCT FROM s.content_hash
           OR t.prior_let IS DISTINCT FROM s.let)
      AND coalesce(len(t.vector_file_ids), 0) > 0
      -- cache hits are excluded: the reference's skip check (:691-694)
      -- returns before the delete branch, so a row with unchanged
      -- last_edited_time + existing ids keeps its vectors even when
      -- the stored hash differs
      AND NOT (t.prior_let IS NOT DISTINCT FROM s.let
               AND coalesce(len(t.vector_file_ids), 0) > 0)
    """,
    doc="Stale vector-id delete set (reference K4 `:609-614`), scoped to "
    "rows being re-vectorized — cache hits (skip `:691-694`) never "
    "delete their live vectors.",
)
def stale_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = _plan(spark, sf_dir)
    return plan.stale_vectors
