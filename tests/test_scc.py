"""SCC (FW-BW coloring) + bow-tie vs pure-python Tarjan oracles.

Same strategy as test_graph_algorithms: hand-built shape fixtures plus
seeded random digraphs, engine labels mapped back to urls and compared
exactly (labels are canonical — min member — so dict equality, not just
partition equality)."""

import random

from conftest import SMALL_EDGES
from oracle import bowtie_oracle, scc_oracle

from web_search_pagerank_project_spark import (
    bowtie_classes,
    build_graph,
    strongly_connected_components,
)


def build(spark, rows):
    df = spark.createDataFrame(rows, "src string, dst string")
    return build_graph(df, cache=True)


def scc_by_url(graph, res=None):
    res = res if res is not None else strongly_connected_components(graph)
    v = graph.vertices
    lab = res.labels.join(v, "id").select("url", "scc")
    min_urls = v.selectExpr("id AS scc", "url AS scc_url")
    rows = lab.join(min_urls, "scc").select("url", "scc_url").collect()
    return {r["url"]: r["scc_url"] for r in rows}


def bowtie_by_url(graph):
    cls = bowtie_classes(graph)
    rows = cls.join(graph.vertices, "id").select("url", "cls").collect()
    return {r["url"]: r["cls"] for r in rows}


def test_scc_small_graph(spark):
    # SMALL_EDGES: 1<->3 via (1,3),(3,1); {4,5,6} via 4->5->6->4 and 5->4;
    # 2 is a sink singleton.
    graph = build(spark, SMALL_EDGES)
    got = scc_by_url(graph)
    assert got == scc_oracle(SMALL_EDGES)
    assert got["1"] == got["3"] == "1"
    assert got["4"] == got["5"] == got["6"] == "4"
    assert got["2"] == "2"
    graph.unpersist()


def test_scc_dag_is_all_singletons(spark):
    # pure DAG: trim must consume everything without a coloring pass
    rows = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    graph = build(spark, rows)
    res = strongly_connected_components(graph)
    got = scc_by_url(graph, res)
    assert got == {u: u for u in "abcde"}
    assert res.phases == 1
    graph.unpersist()


def test_scc_cycle_with_tail_and_selfloop(spark):
    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # core cycle
        ("c", "d"), ("d", "e"),               # out tail
        ("x", "a"),                            # in tail
        ("e", "e"),                            # self loop: singleton
        ("a", "b"),                            # duplicate edge
    ]
    graph = build(spark, rows)
    got = scc_by_url(graph)
    assert got == scc_oracle(rows)
    graph.unpersist()


def test_scc_two_cycles_bridged(spark):
    # two SCCs joined by a one-way bridge stay separate
    rows = [
        ("a", "b"), ("b", "a"),
        ("p", "q"), ("q", "r"), ("r", "p"),
        ("a", "p"),
    ]
    graph = build(spark, rows)
    got = scc_by_url(graph)
    assert got == scc_oracle(rows)
    assert got["a"] == got["b"] == "a"
    assert got["p"] == got["q"] == got["r"] == "p"
    graph.unpersist()


def test_scc_long_cycle(spark):
    # diameter stress: one 24-cycle — coloring + backward mark each need
    # O(cycle length) frontier rounds, exercising the fixpoint loops
    n = 24
    rows = [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)]
    graph = build(spark, rows)
    res = strongly_connected_components(graph)
    got = scc_by_url(graph, res)
    assert set(got.values()) == {"v00"}
    assert res.phases == 1
    graph.unpersist()


def test_scc_random_digraphs_match_tarjan(spark):
    for seed in (7, 21):
        rng = random.Random(seed)
        n = 40
        rows = [
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(110)
        ]
        graph = build(spark, rows)
        got = scc_by_url(graph)
        assert got == scc_oracle(rows), f"seed={seed}"
        graph.unpersist()


def test_scc_deterministic(spark):
    rng = random.Random(3)
    rows = [(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(80)]
    graph = build(spark, rows)
    a = scc_by_url(graph)
    b = scc_by_url(graph)
    assert a == b
    graph.unpersist()


def test_bowtie_hand_built(spark):
    rows = [
        ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),  # CORE
        ("i1", "i2"), ("i2", "c1"),                 # IN chain
        ("c2", "o1"), ("o1", "o2"),                 # OUT chain
        ("i1", "t1"),                                # tendril off IN -> OTHER
        ("z1", "z2"),                                # disconnected -> OTHER
    ]
    graph = build(spark, rows)
    got = bowtie_by_url(graph)
    assert got == bowtie_oracle(rows)
    assert got["c1"] == "CORE" and got["i1"] == "IN" and got["o2"] == "OUT"
    assert got["t1"] == "OTHER" and got["z1"] == "OTHER"
    graph.unpersist()


def test_bowtie_random_matches_oracle(spark):
    rng = random.Random(11)
    rows = [(f"n{rng.randrange(35):02d}", f"n{rng.randrange(35):02d}") for _ in range(90)]
    graph = build(spark, rows)
    got = bowtie_by_url(graph)
    assert got == bowtie_oracle(rows)
    graph.unpersist()
