"""HITS hubs/authorities vs the float64 NumPy oracle (SURVEY §5.2 model)."""

import random

import pytest

from conftest import SMALL_EDGES
from oracle import hits_oracle

from web_search_pagerank_project_spark.operators.graph_build import build_graph
from web_search_pagerank_project_spark.operators.hits import hits


def _build(spark, rows):
    df = spark.createDataFrame(rows, "src string, dst string")
    return build_graph(df, cache=True)


def _by_url(result, graph):
    return {
        r["url"]: (r["authority"], r["hub"])
        for r in result.by_url(graph).collect()
    }


def _assert_close(got, expected, atol=1e-9):
    assert set(got) == set(expected)
    for u in expected:
        assert got[u][0] == pytest.approx(expected[u][0], abs=atol), u
        assert got[u][1] == pytest.approx(expected[u][1], abs=atol), u


def test_hits_small_graph_matches_oracle(spark):
    graph = _build(spark, SMALL_EDGES)
    res = hits(graph, max_iterations=3, epsilon=0.0)
    assert res.iterations == 3 and not res.converged
    _assert_close(_by_url(res, graph), hits_oracle(SMALL_EDGES, iters=3))
    graph.unpersist()


def test_hits_star_graph_roles(spark):
    # hub page links out to every leaf: it should get ~all the hub mass,
    # the leaves ~all the authority mass
    rows = [("hub", f"leaf{i}") for i in range(8)]
    graph = _build(spark, rows)
    res = hits(graph, max_iterations=20, epsilon=1e-9)
    got = _by_url(res, graph)
    assert res.converged
    assert got["hub"][1] == pytest.approx(1.0, abs=1e-9)  # hub score
    assert got["hub"][0] == pytest.approx(0.0, abs=1e-9)  # authority
    for i in range(8):
        assert got[f"leaf{i}"][0] == pytest.approx(1.0 / 8**0.5, abs=1e-9)
        assert got[f"leaf{i}"][1] == pytest.approx(0.0, abs=1e-9)
    graph.unpersist()


def test_hits_random_graph_matches_oracle(spark):
    rng = random.Random(13)
    rows = [
        (f"u{rng.randrange(30)}", f"u{rng.randrange(30)}") for _ in range(80)
    ]
    graph = _build(spark, rows)
    res = hits(graph, max_iterations=4, epsilon=0.0)
    _assert_close(_by_url(res, graph), hits_oracle(rows, iters=4))
    graph.unpersist()


def test_hits_duplicate_edges_collapse(spark):
    # duplicated edges must not double-count: the engine's edge table is
    # deduplicated, and the oracle dedups to match
    rows = [("a", "b"), ("a", "b"), ("a", "b"), ("c", "b"), ("b", "d")]
    graph = _build(spark, rows)
    res = hits(graph, max_iterations=3, epsilon=0.0)
    _assert_close(_by_url(res, graph), hits_oracle(rows, iters=3))
    graph.unpersist()


def test_hits_converges_and_residuals_decrease(spark):
    rng = random.Random(5)
    rows = [
        (f"u{rng.randrange(12)}", f"u{rng.randrange(12)}") for _ in range(40)
    ]
    graph = _build(spark, rows)
    res = hits(graph, max_iterations=200, epsilon=1e-10)
    assert res.converged and res.iterations < 200
    # principal-eigenvector iteration: residual tail is (weakly) decreasing
    tail = res.residuals[2:]
    assert all(b <= a * 1.01 for a, b in zip(tail, tail[1:]))
    # converged fixed point matches a long numpy run
    _assert_close(
        _by_url(res, graph), hits_oracle(rows, iters=300), atol=1e-6
    )
    graph.unpersist()
