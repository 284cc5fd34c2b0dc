"""Traversal tests: cycle safety (the reference's visited-set,
`:492-494`), depth assignment, diamond/shared-subtree dedup."""

from __future__ import annotations

from notion_vector_store_etl_pipeline_spark.operators.traversal import (
    bfs_reachability,
    expand_frontier,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: string, dst: string")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node: string")


def test_cycle_terminates_with_first_discovery_depth(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    out = {r.node: r.depth for r in bfs_reachability(edges, _seeds(spark, ["a"])).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_diamond_counted_once_at_min_depth(spark):
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")])
    out = {r.node: r.depth for r in bfs_reachability(edges, _seeds(spark, ["a"])).collect()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_multiple_seeds_and_unreachable(spark):
    edges = _edges(spark, [("a", "b"), ("x", "y"), ("p", "q")])
    out = {r.node: r.depth for r in bfs_reachability(edges, _seeds(spark, ["a", "x"])).collect()}
    assert out == {"a": 0, "x": 0, "b": 1, "y": 1}  # p/q unreachable


def test_max_depth_bound(spark):
    edges = _edges(spark, [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n4")])
    out = {r.node: r.depth for r in bfs_reachability(edges, _seeds(spark, ["n0"]), max_depth=2).collect()}
    assert out == {"n0": 0, "n1": 1, "n2": 2}


def test_expand_frontier_single_step(spark):
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d")])
    out = {r.node for r in expand_frontier(_seeds(spark, ["a"]), edges).collect()}
    assert out == {"b", "c"}
