"""k-core peeling vs the pure-Python oracle (SURVEY §5.2 model)."""

import random

from conftest import SMALL_EDGES
from oracle import k_core_oracle

from web_search_pagerank_project_spark.operators.graph_build import build_graph
from web_search_pagerank_project_spark.operators.kcore import k_core


def _build(spark, rows):
    df = spark.createDataFrame(rows, "src string, dst string")
    return build_graph(df, cache=True)


def _by_url(df, graph):
    return {
        r["url"]: r["core_degree"]
        for r in df.join(graph.vertices, "id").select("url", "core_degree").collect()
    }


def test_kcore_small_graph(spark):
    graph = _build(spark, SMALL_EDGES)
    for k in (1, 2, 3):
        got = _by_url(k_core(graph, k), graph)
        assert got == k_core_oracle(SMALL_EDGES, k), k
    graph.unpersist()


def test_kcore_triangle_with_tail(spark):
    # triangle a-b-c plus a pendant chain: 2-core is exactly the triangle
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    graph = _build(spark, rows)
    got = _by_url(k_core(graph, 2), graph)
    assert got == {"a": 2, "b": 2, "c": 2}
    graph.unpersist()


def test_kcore_empty_core(spark):
    # a tree has no 2-core
    rows = [("r", "a"), ("r", "b"), ("a", "c"), ("a", "d")]
    graph = _build(spark, rows)
    assert k_core(graph, 2).count() == 0
    graph.unpersist()


def test_kcore_deep_peel_chain(spark):
    # path graph: 1-core peels the whole path one layer per... no — a path
    # IS its own 1-core; the 2-core peels from both ends, one layer per
    # round (worst-case round count ~ n/2) — exercises the loop depth
    rows = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(12)]
    graph = _build(spark, rows)
    assert k_core(graph, 2).count() == 0
    got1 = _by_url(k_core(graph, 1), graph)
    assert got1 == k_core_oracle(rows, 1)
    graph.unpersist()


def test_kcore_random_graphs_match_oracle(spark):
    rng = random.Random(7)
    for trial in range(3):
        rows = [
            (f"u{rng.randrange(25)}", f"u{rng.randrange(25)}")
            for _ in range(70 + 15 * trial)
        ]
        graph = _build(spark, rows)
        for k in (2, 3, 4):
            got = _by_url(k_core(graph, k), graph)
            assert got == k_core_oracle(rows, k), (trial, k)
        graph.unpersist()


def test_kcore_duplicate_and_self_edges_collapse(spark):
    # parallel edges must not inflate degrees; self-loops must not count
    rows = [
        ("a", "b"), ("a", "b"), ("b", "a"),
        ("b", "c"), ("c", "a"), ("a", "a"),
    ]
    graph = _build(spark, rows)
    got = _by_url(k_core(graph, 2), graph)
    assert got == {"a": 2, "b": 2, "c": 2}
    graph.unpersist()
