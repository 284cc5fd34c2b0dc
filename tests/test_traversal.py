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


def test_bfs_big_frontier_leaf_prune_path_identical(spark):
    # broadcast_rows=0 forces every level down the big-frontier branch
    # (r15: leaf-pruning semi-join against distinct sources before the
    # expand join, then shuffle joins) — depths must match the
    # broadcast path exactly, including nodes whose frontier entry has
    # no out-edges ('e' is a leaf discovered at depth 3)
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")])
    out = {
        r.node: r.depth
        for r in bfs_reachability(
            edges, _seeds(spark, ["a"]), broadcast_rows=0
        ).collect()
    }
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


# --- connected_components convergence (r14: sum-based check for
# numeric ids, join-based fallback otherwise) -------------------------

from notion_vector_store_etl_pipeline_spark.operators.traversal import (  # noqa: E402
    connected_components,
)


def _components(spark, edge_pairs, node_ids, schema="src: long, dst: long"):
    edges = spark.createDataFrame(edge_pairs, schema)
    node_t = schema.split(":", 1)[1].split(",")[0].strip()
    nodes = spark.createDataFrame([(n,) for n in node_ids], f"node: {node_t}")
    return {
        r.node: r.component_id
        for r in connected_components(edges, nodes).collect()
    }


def test_components_long_chain_numeric_sum_check(spark):
    # a 12-node path exercises several pointer-jumping rounds, so the
    # sum-based convergence check must fire only at the true fixpoint —
    # stopping a round early would leave mid-chain labels > min
    chain = [(i, i + 1) for i in range(11)]
    out = _components(spark, chain, list(range(13)))  # node 12 isolated
    assert out == {**{i: 0 for i in range(12)}, 12: 12}


def test_components_two_clusters_and_isolates(spark):
    out = _components(
        spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99]
    )
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_components_string_ids_fallback_join_check(spark):
    # non-numeric node ids take the join-based convergence check (a
    # string label cast to decimal would be NULL and break the sum
    # invariant); components still resolve to the lexicographic min
    out = _components(
        spark,
        [("a", "b"), ("b", "c"), ("x", "y")],
        ["a", "b", "c", "x", "y", "z"],
        schema="src: string, dst: string",
    )
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "z"}


def test_components_fractional_double_ids_fallback_join_check(spark):
    # ADVICE r14: fractional Double ids must NOT take the sum check —
    # cast('decimal(38,0)') rounds, so a chain of ids 0.6..1.4 (all
    # rounding to 1) would collapse to equal sums after round 1 and
    # early-exit with wrong components. The integral gate routes these
    # to the join check; the propagation itself is type-agnostic.
    ids = [round(0.6 + 0.1 * i, 1) for i in range(9)]  # 0.6 .. 1.4
    chain = [(ids[i], ids[i + 1]) for i in range(8)]
    out = _components(spark, chain, ids, schema="src: double, dst: double")
    assert out == {i: 0.6 for i in ids}


def test_components_empty_nodes_terminates_immediately(spark):
    # empty graph: the label sum is NULL every round; the overflow
    # guard ("None sum = changed") must not spin to max_iters here —
    # n_nodes == 0 proves the (empty) fixpoint in round 1
    out = _components(spark, [], [], schema="src: long, dst: long")
    assert out == {}
