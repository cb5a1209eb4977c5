"""Connected components: unit shapes + property test vs a union-find
reference implementation."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from hudi_delete_view_spark.operators.components import (
    assign_components,
    connected_components,
)


def _cc(spark, edge_list, threshold=None):
    edges = spark.createDataFrame(edge_list, "a long, b long")
    rows = connected_components(edges, "a", "b", small_graph_threshold=threshold).collect()
    return {r["node"]: r["component"] for r in rows}


def _union_find(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to the min id of each component
    return {x: find(x) for x in parent}


def test_path_graph(spark):
    # a long path is the worst case for naive propagation (diameter = n);
    # star-contraction collapses it in O(log^2 n) rounds
    comp = _cc(spark, [(i, i + 1) for i in range(30)])
    assert comp == {i: 0 for i in range(31)}


def test_two_triangles_and_bridgeless(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    comp = _cc(spark, edges)
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_self_loops_and_duplicates_ignored(spark):
    comp = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert comp == {1: 1, 2: 1}


def test_assign_components_isolated_nodes(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in assign_components(df, "id", pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=0,
        max_size=60,
    )
)
def test_random_graphs_match_union_find(spark, edges):
    expected = {
        k: v for k, v in _union_find(edges).items()
        if any(a != b and k in (a, b) for a, b in edges)
    }
    # drop nodes only present via self-loops (operator ignores them)
    real = {k for a, b in edges if a != b for k in (a, b)}
    expected = {k: v for k, v in expected.items() if k in real}
    # both execution paths must agree with the reference: the single-task
    # union-find (default for small graphs) and the distributed star
    # contraction (threshold=0 forces it)
    assert _cc(spark, edges) == expected
    assert _cc(spark, edges, threshold=0) == expected


def test_string_node_ids_small_graph(spark):
    edges = spark.createDataFrame(
        [("key:b", "key:a"), ("key:c", "key:b"), ("key:x", "key:y")],
        "a string, b string",
    )
    rows = connected_components(edges, "a", "b").collect()
    got = {r["node"]: r["component"] for r in rows}
    assert got == {
        "key:a": "key:a", "key:b": "key:a", "key:c": "key:a",
        "key:x": "key:x", "key:y": "key:x",
    }
