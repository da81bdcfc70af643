#!/usr/bin/env python3
"""Measure fixed per-iteration overhead of the iterative kernels on a tiny
graph (20k edges): at this size the numpy/shuffle work is microseconds, so
iteration wall time ~= pure driver/stage/plan overhead. Used to steer the
round-2 overhead attack (VERDICT.md item 1)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from web_search_pagerank_project_spark.session import get_spark
    from web_search_pagerank_project_spark import pagerank, pagerank_csr, build_csr_blocks
    from web_search_pagerank_project_spark.operators.graph_build import build_graph
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    spark = get_spark(app_name="overhead-probe", master="local[8]", shuffle_partitions=16)
    edges = synth_edges(spark, n_vertices=2000, n_edges=20000, seed=42, zipf_a=1.5)
    graph = build_graph(edges, cache=True)

    blocks = build_csr_blocks(graph, 16)
    # warmup
    pagerank_csr(graph, max_iterations=2, epsilon=0.0, blocks=blocks)
    for ipa in (1, 2, 4, 10):
        t0 = time.monotonic()
        res = pagerank_csr(
            graph, max_iterations=10, epsilon=0.0, blocks=blocks,
            iters_per_action=ipa,
        )
        csr_wall = time.monotonic() - t0
        print(f"CSR ipa={ipa}: 10 iters in {csr_wall:.2f}s -> {csr_wall/10*1000:.0f} ms/iter")
        print("  residual[-1]:", res.residuals[-1])

    pagerank(graph, max_iterations=2, epsilon=0.0)
    t0 = time.monotonic()
    res = pagerank(graph, max_iterations=10, epsilon=0.0)
    df_wall = time.monotonic() - t0
    print(f"DF : 10 iters in {df_wall:.2f}s -> {df_wall/10*1000:.0f} ms/iter")
    print("  per-iter ms:", [round(m.wall_ms) for m in res.metrics])
    spark.stop()


if __name__ == "__main__":
    main()
