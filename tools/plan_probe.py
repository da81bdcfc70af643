#!/usr/bin/env python3
"""Inspect the per-iteration physical plan of the CSR kernel + job/stage
counts, and A/B the AQE setting. Round-2 overhead diagnosis."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from web_search_pagerank_project_spark.session import get_spark
    from web_search_pagerank_project_spark import pagerank_csr, build_csr_blocks
    from web_search_pagerank_project_spark.operators.graph_build import build_graph
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    aqe = sys.argv[1] if len(sys.argv) > 1 else "true"
    spark = get_spark(
        app_name="plan-probe", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": aqe},
    )
    sc = spark.sparkContext
    edges = synth_edges(spark, n_vertices=2000, n_edges=20000, seed=42, zipf_a=1.5)
    graph = build_graph(edges, cache=True)
    blocks = build_csr_blocks(graph, 16)
    pagerank_csr(graph, max_iterations=2, epsilon=0.0, blocks=blocks)

    tracker = sc.statusTracker()
    before_jobs = tracker.getJobIdsForGroup(None) or []
    sc.setJobGroup("probe", "one csr action")
    t0 = time.monotonic()
    pagerank_csr(graph, max_iterations=3, epsilon=0.0, blocks=blocks)
    wall = time.monotonic() - t0
    jobs = tracker.getJobIdsForGroup("probe") or []
    nstages = 0
    for j in jobs:
        ji = tracker.getJobInfo(j)
        if ji:
            nstages += len(ji.stageIds)
    print(f"AQE={aqe}: 3 iters wall={wall:.2f}s jobs={len(jobs)} stages={nstages}")
    spark.stop()


if __name__ == "__main__":
    main()
