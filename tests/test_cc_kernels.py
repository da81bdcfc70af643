"""CC kernel parity: star and CSR kernels vs the DataFrame min-label kernel.

All three implement the same contract — component(v) = min dense id in v's
weakly-connected component — so on any graph their outputs must be
IDENTICAL label-for-label (not just same partition).
"""

import random

import pytest

from conftest import SMALL_EDGES

from web_search_pagerank_project_spark import (
    build_graph,
    connected_components,
    connected_components_csr,
    connected_components_star,
)

MULTI_CC = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"), ("f", "g"),
    ("x", "y"),
]


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _build(spark, rows):
    return build_graph(
        spark.createDataFrame(rows, "src string, dst string"), cache=True
    )


@pytest.mark.parametrize("rows", [SMALL_EDGES, MULTI_CC])
def test_star_and_csr_match_dataframe_kernel(spark, rows):
    graph = _build(spark, rows)
    base = _labels(connected_components(graph))
    assert _labels(connected_components_star(graph)) == base
    assert _labels(connected_components_csr(graph, num_blocks=3)) == base
    graph.unpersist()


def test_kernels_match_on_random_graph(spark):
    rng = random.Random(13)
    rows = [
        (f"u{rng.randrange(60):02d}", f"u{rng.randrange(60):02d}")
        for _ in range(90)
    ]
    graph = _build(spark, rows)
    base = _labels(connected_components(graph))
    assert _labels(connected_components_star(graph)) == base
    assert _labels(connected_components_csr(graph, num_blocks=8)) == base
    # batched rounds: same fixed point regardless of action granularity
    assert _labels(
        connected_components_csr(graph, num_blocks=8, rounds_per_action=4)
    ) == base
    # dense rounds (frontier masking off — the scaling protocol's
    # fixed-work mode) reach the identical fixed point
    assert _labels(
        connected_components_csr(graph, num_blocks=8, frontier=False)
    ) == base
    graph.unpersist()


def test_star_converges_logarithmically_on_long_path(spark):
    """VERDICT r1 item 6: a 10^4-node path needs ~10^4 min-label rounds but
    must converge in O(log n) large/small-star rounds. max_rounds=25 would
    fail any linear-round algorithm instantly."""
    n = 10_000
    rows = [(f"p{i:05d}", f"p{i + 1:05d}") for i in range(n - 1)]
    graph = _build(spark, rows)
    labels = _labels(connected_components_star(graph, max_rounds=25))
    assert len(labels) == n
    assert set(labels.values()) == {0}  # single component rooted at min id
    graph.unpersist()


def test_csr_cc_convergence_cap_raises(spark):
    graph = _build(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.raises(RuntimeError):
        connected_components_csr(graph, max_rounds=1, num_blocks=2)
    graph.unpersist()


def test_balanced_block_keys_match_spark_hash(spark):
    """operators/blockmap.py replicates Spark's Murmur3_x86_32.hashInt
    (the expression behind F.hash and HashPartitioning): pin the Python
    implementation against the JVM for a spread of ints, and check the
    balanced keys actually fill partition quotas exactly."""
    import math

    from pyspark.sql import functions as F

    from web_search_pagerank_project_spark.operators.blockmap import (
        _partition_of,
        balanced_block_keys,
        spark_murmur3_int,
    )

    vals = list(range(64)) + [997, 65536, 2**31 - 1]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "x int")
        .select("x", F.hash("x").alias("h"))
        .collect()
    )
    for r in rows:
        expect = r["h"] & 0xFFFFFFFF
        assert spark_murmur3_int(r["x"]) == expect, r["x"]

    for k, p in [(16, 16), (80, 16), (20, 4), (512, 16)]:
        keys = balanced_block_keys(k, p)
        assert len(set(keys)) == k
        loads = {}
        for key in keys:
            pid = _partition_of(key, p)
            loads[pid] = loads.get(pid, 0) + 1
        assert max(loads.values()) == math.ceil(k / p)


def test_cc_csr_edgeless_blocks_not_merged(spark):
    """ADVICE r3: residue classes with no (symmetrized) edges used to be
    absent from the minlabel blocks table, aliasing their state rows onto
    the -1 bkey sentinel. Isolated vertices must come back as their own
    singleton components."""
    from web_search_pagerank_project_spark.operators.graph_build import GraphTables

    vertices = spark.createDataFrame(
        [(i, str(i)) for i in range(8)], "id long, url string"
    )
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 4, 1.0), (4, 5, 1.0), (5, 0, 1.0)],
        "src_id long, dst_id long, weight double",
    )
    graph = GraphTables(vertices, edges, 8)
    # blocks 2 and 3 (ids {2, 6} and {3, 7}) have no edges at num_blocks=4
    got = _labels(connected_components_csr(graph, num_blocks=4))
    want = _labels(connected_components(graph))
    assert set(got) == set(range(8))
    assert got == want
    assert got[2] == 2 and got[3] == 3 and got[6] == 6 and got[7] == 7


def test_csr_cc_chunked_blocks_match(spark):
    """Chunked block rows (bounded Arrow cells, round-4 slow-mode fix) are
    layout-invariant: chunk_edges small enough to split destination runs
    across chunks must reproduce the unchunked labels exactly."""
    import random as _random

    from web_search_pagerank_project_spark.operators.components import (
        build_minlabel_blocks,
    )

    rng = _random.Random(99)
    rows = [
        (f"u{rng.randrange(40):02d}", f"u{rng.randrange(40):02d}")
        for _ in range(120)
    ]
    graph = _build(spark, rows)
    base = _labels(connected_components(graph))
    for ce in (1, 3, 7):  # pathological chunk sizes force run splits
        blocks = build_minlabel_blocks(graph, 5, chunk_edges=ce)
        got = _labels(
            connected_components_csr(graph, blocks=blocks, rounds_per_action=3)
        )
        assert got == base, ce
    graph.unpersist()
