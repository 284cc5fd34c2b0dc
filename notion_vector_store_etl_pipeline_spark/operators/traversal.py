"""Iterative graph traversal (SURVEY.md §2.9) — the reference's
recursive crawl (`Notion_openai_vector_etl.py:480-596`) as a
driver-side loop of DataFrame joins with anti-join cycle detection
(the `visited_pages` set, `:492-494`).

Each iteration: frontier ⋈ edges → children; anti-join against
visited; union into visited with depth = iteration index. Terminates
at fixpoint (empty frontier) or ``max_depth`` (the MAX_PAGES analogue).

Scale notes: `visited` grows monotonically — it is persisted each
round so the anti-join doesn't recompute the whole lineage, and the
join keys stay the same across iterations so the shuffle partitioning
is reused. For bounded-depth hierarchies (the common case) this is a
handful of shuffles; unbounded graphs would move to GraphFrames/Pregel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def bfs_reachability(
    edges: DataFrame,  # (src, dst)
    seeds: DataFrame,  # (node)
    max_depth: int = 20,
) -> DataFrame:
    """Return (node, depth) for every node reachable from seeds,
    depth = first-discovery level (seeds at 0)."""
    frontier = seeds.select("node").dropDuplicates()
    visited = frontier.withColumn("depth", F.lit(0))
    visited.persist(StorageLevel.MEMORY_AND_DISK)

    for depth in range(1, max_depth + 1):
        children = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
        )
        frontier = children.join(visited.select("node"), "node", "left_anti")
        frontier.persist(StorageLevel.MEMORY_AND_DISK)
        if frontier.isEmpty():
            break
        new_visited = visited.unionByName(frontier.withColumn("depth", F.lit(depth)))
        new_visited.persist(StorageLevel.MEMORY_AND_DISK)
        # cut lineage growth so plan size stays O(1) per iteration
        new_visited = new_visited.localCheckpoint(eager=True)
        visited.unpersist()
        visited = new_visited
    return visited


def expand_frontier(frontier: DataFrame, edges: DataFrame) -> DataFrame:
    """One traversal step (reference `:581-593`): frontier -> children."""
    return (
        frontier.join(edges, frontier.node == edges.src)
        .select(F.col("dst").alias("node"))
        .dropDuplicates()
    )
