"""Graph traversal queries (SURVEY.md §2.9): the reference's recursive
crawl as iterative frontier expansion over an edge relation derived
from the star schema (region -> nation -> customer -> orders), with
anti-join cycle detection. Oracle: recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from notion_vector_store_etl_pipeline_spark.operators.traversal import (
    bfs_reachability,
    expand_frontier,
)
from notion_vector_store_etl_pipeline_spark.plans import register
from notion_vector_store_etl_pipeline_spark.sources import load_table

_EDGES_CTE = """
WITH RECURSIVE edges AS (
  SELECT 'R' || CAST(n_regionkey AS VARCHAR) AS src, 'N' || CAST(n_nationkey AS VARCHAR) AS dst
  FROM nation
  UNION ALL
  SELECT 'N' || CAST(c_nationkey AS VARCHAR), 'C' || CAST(c_custkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'C' || CAST(o_custkey AS VARCHAR), 'O' || CAST(o_orderkey AS VARCHAR) FROM orders
)
"""


def build_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    e1 = nation.select(
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("dst"),
    )
    e2 = customer.select(
        F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("dst"),
    )
    e3 = orders.select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("O"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    return e1.unionByName(e2).unionByName(e3)


def _seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([("R0",), ("R1",)], "node: string")


@register(
    "graph_reachability",
    oracle=_EDGES_CTE
    + """
    , walk(node, depth) AS (
      SELECT node, 0 FROM (VALUES ('R0'), ('R1')) s(node)
      UNION ALL
      SELECT e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.depth < 10
    )
    SELECT node, CAST(min(depth) AS INTEGER) AS depth FROM walk GROUP BY node
    """,
    doc="Full BFS reachability with first-discovery depth (reference crawl "
    "`:480-596`; cycle detection = anti-join vs visited, `:492-494`).",
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = build_edges(spark, sf_dir)
    return bfs_reachability(edges, _seeds(spark), max_depth=10)


@register(
    "graph_reachability_sql",
    oracle=_EDGES_CTE
    + """
    , walk(node, depth) AS (
      SELECT node, 0 FROM (VALUES ('R0'), ('R1')) s(node)
      UNION ALL
      SELECT e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.depth < 10
    )
    SELECT node, CAST(min(depth) AS INTEGER) AS depth FROM walk GROUP BY node
    """,
    doc="Same reachability as `graph_reachability`, but via Spark 4's "
    "native WITH RECURSIVE (UnionLoop execution) instead of the "
    "driver-side iterative loop — the declarative path once recursive "
    "CTEs are available; the loop variant stays as the portable/tunable "
    "one (broadcast-frontier control, per-level persist).",
)
def graph_reachability_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    build_edges(spark, sf_dir).createOrReplaceTempView("crawl_edges")
    _seeds(spark).createOrReplaceTempView("crawl_seeds")
    return spark.sql(
        """
        WITH RECURSIVE walk(node, depth) AS (
          SELECT node, 0 FROM crawl_seeds
          UNION ALL
          SELECT e.dst, w.depth + 1
          FROM walk w JOIN crawl_edges e ON e.src = w.node
          WHERE w.depth < 10
        )
        SELECT node, CAST(min(depth) AS INT) AS depth FROM walk GROUP BY node
        """
    )


@register(
    "traversal_step",
    oracle=_EDGES_CTE
    + """
    SELECT DISTINCT e.dst AS node
    FROM edges e JOIN (VALUES ('R0'), ('R1')) s(node) ON e.src = s.node
    """,
    doc="Single frontier expansion (reference `:581-593`).",
)
def traversal_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = build_edges(spark, sf_dir)
    return expand_frontier(_seeds(spark), edges)
