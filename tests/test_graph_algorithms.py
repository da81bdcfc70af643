"""CC / LPA / triangle-count vs pure-python oracles (SURVEY §5.2)."""

import random

import pytest

from conftest import SMALL_EDGES
from oracle import (
    connected_components_oracle,
    label_propagation_oracle,
    triangle_count_oracle,
)

from web_search_pagerank_project_spark import (
    build_graph,
    connected_components,
    label_propagation,
    triangle_count,
)

MULTI_CC = [
    # component A: a-b-c triangle
    ("a", "b"),
    ("b", "c"),
    ("c", "a"),
    # component B: chain d-e-f-g
    ("d", "e"),
    ("e", "f"),
    ("f", "g"),
    # component C: isolated pair
    ("x", "y"),
]


def build(spark, rows):
    df = spark.createDataFrame(rows, "src string, dst string")
    return build_graph(df, cache=True)


def cc_by_url(spark, graph):
    comp = connected_components(graph)
    joined = comp.join(graph.vertices, comp.id == graph.vertices.id).select(
        "url", "component"
    )
    return {r["url"]: r["component"] for r in joined.collect()}


def test_cc_small_graph(spark):
    graph = build(spark, SMALL_EDGES)
    got = cc_by_url(spark, graph)
    assert len(set(got.values())) == 1
    graph.unpersist()


def test_cc_multiple_components(spark):
    graph = build(spark, MULTI_CC)
    got = cc_by_url(spark, graph)
    expected = connected_components_oracle(MULTI_CC)
    # same partition into components
    from collections import defaultdict

    def groups(d):
        g = defaultdict(frozenset)
        acc = defaultdict(set)
        for k, v in d.items():
            acc[v].add(k)
        return {frozenset(s) for s in acc.values()}

    assert groups(got) == groups(expected)
    # engine labels = id of lexicographically-min url (ids sorted by url)
    v = {r["url"]: r["id"] for r in graph.vertices.collect()}
    assert got["b"] == v["a"] and got["g"] == v["d"] and got["y"] == v["x"]
    graph.unpersist()


def test_cc_random_graph_matches_oracle(spark):
    rng = random.Random(7)
    rows = [
        (f"u{rng.randrange(40)}", f"u{rng.randrange(40)}") for _ in range(60)
    ]
    graph = build(spark, rows)
    got = cc_by_url(spark, graph)
    expected = connected_components_oracle(rows)
    from collections import defaultdict

    acc_g, acc_e = defaultdict(set), defaultdict(set)
    for k, val in got.items():
        acc_g[val].add(k)
    for k, val in expected.items():
        acc_e[val].add(k)
    assert {frozenset(s) for s in acc_g.values()} == {
        frozenset(s) for s in acc_e.values()
    }
    graph.unpersist()


def test_triangle_count_small(spark):
    graph = build(spark, SMALL_EDGES)
    assert triangle_count(graph) == 2  # {1,2,3} and {4,5,6}
    graph.unpersist()


def test_triangle_count_cliques(spark):
    # K4 (4 triangles) + K5 (10 triangles) disjoint, plus dup/reverse noise
    rows = []
    k4 = [f"k4_{i}" for i in range(4)]
    k5 = [f"k5_{i}" for i in range(5)]
    for clique in (k4, k5):
        for i in range(len(clique)):
            for j in range(i + 1, len(clique)):
                rows.append((clique[i], clique[j]))
                rows.append((clique[j], clique[i]))  # bidirectional duplicates
    graph = build(spark, rows)
    assert triangle_count(graph) == 14
    assert triangle_count_oracle(rows) == 14
    graph.unpersist()


def test_triangle_count_random_matches_oracle(spark):
    rng = random.Random(11)
    rows = [
        (f"v{rng.randrange(25)}", f"v{rng.randrange(25)}") for _ in range(80)
    ]
    graph = build(spark, rows)
    assert triangle_count(graph) == triangle_count_oracle(rows)
    graph.unpersist()


def test_label_propagation_two_cliques(spark):
    # two K4 cliques joined by a single bridge edge: LPA should give each
    # clique a uniform label
    rows = []
    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    for clique in (a, b):
        for i in range(4):
            for j in range(i + 1, 4):
                rows.append((clique[i], clique[j]))
    rows.append((a[0], b[0]))
    graph = build(spark, rows)
    labels = label_propagation(graph, max_iterations=10)
    joined = labels.join(graph.vertices, labels.id == graph.vertices.id).select(
        "url", "label"
    )
    got = {r["url"]: r["label"] for r in joined.collect()}
    assert len({got[u] for u in a}) == 1
    assert len({got[u] for u in b}) == 1
    graph.unpersist()


def test_label_propagation_matches_oracle_one_round(spark):
    # after exactly 1 synchronous round the engine must equal the oracle
    rows = MULTI_CC
    graph = build(spark, rows)
    labels = label_propagation(graph, max_iterations=1)
    joined = labels.join(graph.vertices, labels.id == graph.vertices.id).select(
        "url", "label"
    )
    got = {r["url"]: r["label"] for r in joined.collect()}
    expected = label_propagation_oracle(rows, max_iters=1)
    v = {r["url"]: r["id"] for r in graph.vertices.collect()}
    for url in expected:
        assert got[url] == v[expected[url]], url
    graph.unpersist()


def test_triangle_wedge_join_skew_bound(spark):
    """VERDICT r3 item 7: the degree-ordered orientation must bound the
    wedge join's per-key fan-out (= oriented out-degree) by ~sqrt(2m) even
    on an adversarial near-clique-plus-mega-hub graph where one RAW degree
    is ~10x sqrt(m)."""
    import math

    import pyspark.sql.functions as F

    from web_search_pagerank_project_spark.operators.triangles import (
        _oriented_edges,
        triangles_per_vertex,
    )

    k, leaves = 30, 500
    rows = [(f"v{i:04d}", f"v{j:04d}") for i in range(k) for j in range(i + 1, k)]
    rows += [("v0000", f"leaf{t:04d}") for t in range(leaves)]  # hub deg 529
    graph = build(spark, rows)
    m = len(rows)

    oriented = _oriented_edges(graph, 8)
    max_out = (
        oriented.groupBy("a").agg(F.count("*").alias("d"))
        .agg(F.max("d")).first()[0]
    )
    oriented.unpersist()
    assert max_out <= int(math.sqrt(2 * m)) + 1, max_out  # 30 vs raw 529

    assert triangle_count(graph) == math.comb(k, 3)
    vurl = {r["id"]: r["url"] for r in graph.vertices.collect()}
    tpv = {
        vurl[r["id"]]: r["triangles"]
        for r in triangles_per_vertex(graph).collect()
    }
    for i in range(k):
        assert tpv[f"v{i:04d}"] == math.comb(k - 1, 2)
    assert tpv["leaf0000"] == 0
    graph.unpersist()
