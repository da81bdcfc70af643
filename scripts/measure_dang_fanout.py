#!/usr/bin/env python3
"""Measure the cost of the CSR kernel's K^2 dangling-scalar fan-out.

csr_kernel.spmv sends each source block's dangling mass (ONE float64) to
every output block, so beta is computable block-locally with zero driver
round-trips — at the price of K^2 scalar-only partial rows riding the
per-iteration partials shuffle (VERDICT r2 'What's wrong' #3). An exact
per-iteration beta fundamentally needs either those K^2 scalars or an
extra combine STAGE inside the iteration (any tree combine requires an
intermediate shuffle key, and the kernel's one shuffle is keyed by
block_out) — so before adding a stage, measure what the scalars cost.

Protocol (results recorded in csr_kernel.py's module docstring):
  1. real kernel at K=512 on a 2M-edge power-law graph: per-iteration wall
     (6 fused iterations / action, min of repeats);
  2. isolation microbench: shuffle + cogroup-merge of EXACTLY the dang-row
     shape (block_out int32, block_src int32, empty int32[] , empty
     float64[], dang float64) at K^2 = 262_144 rows (K=512) and
     K^2 = 16_777_216 rows (K=4096) — an upper bound on the incremental
     cost because the microbench pays the full shuffle write+read+pandas
     boundary for ONLY these rows, with none of the cost amortized into
     batches that exist anyway.

Run:  python scripts/measure_dang_fanout.py
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd


def real_kernel_iteration_wall(spark, k: int, iters: int = 6) -> float:
    from web_search_pagerank_project_spark import (
        build_csr_blocks,
        build_graph,
        pagerank_csr,
    )
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    edges = synth_edges(
        spark, n_vertices=100_000, n_edges=2_000_000, seed=42, zipf_a=1.5
    )
    graph = build_graph(edges, cache=True)
    blocks = build_csr_blocks(graph, k)
    pagerank_csr(graph, max_iterations=1, epsilon=0.0, blocks=blocks)  # warm
    wall = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        pagerank_csr(
            graph, max_iterations=iters, epsilon=0.0, blocks=blocks,
            iters_per_action=iters,
        )
        wall = min(wall, time.monotonic() - t0)
    blocks.unpersist()
    graph.unpersist()
    return wall / iters


def dang_row_microbench(spark, k: int) -> float:
    """Shuffle + cogroup K^2 scalar-only partial rows (the exact dang-row
    shape) and reduce them per block_out; returns min wall of 3 runs."""
    from pyspark.sql import functions as F

    n = k * k
    rows = (
        spark.range(n)
        .select(
            (F.col("id") % k).cast("int").alias("block_out"),
            (F.col("id") / k).cast("int").alias("block_src"),
            F.array().cast("array<int>").alias("dst_pos"),
            F.array().cast("array<double>").alias("contribs"),
            (F.col("id") % 97 / 97.0).alias("dang_part"),
        )
        .localCheckpoint(eager=True)  # generation excluded from timing
    )
    state = (
        spark.range(k)
        .select(F.col("id").cast("int").alias("block"))
        .localCheckpoint(eager=True)
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(right["block_src"].to_numpy(np.int32), kind="stable")
        tot = float(right["dang_part"].to_numpy(np.float64)[order].sum())
        return pd.DataFrame({"block": [int(key[0])], "beta": [tot]})

    def run() -> float:
        t0 = time.monotonic()
        out = (
            state.groupBy("block")
            .cogroup(rows.groupBy("block_out"))
            .applyInPandas(merge, "block int, beta double")
        )
        assert out.count() == k
        return time.monotonic() - t0

    run()  # warm
    return min(run() for _ in range(3))


def main() -> None:
    from bench import make_spark

    spark = make_spark(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]", 64)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        per_iter = real_kernel_iteration_wall(spark, k=512)
        micro = {k: dang_row_microbench(spark, k) for k in (80, 512, 4096)}
        # K=80 (the headline bench's K, 6_400 rows) measures the FIXED
        # cogroup-stage cost this environment charges any such stage; the
        # dang rows' marginal cost is the delta above that floor.
        floor = micro[80]
        print(
            f"K=80 floor: standalone {80*80:,}-row dang shuffle+merge "
            f"{floor*1000:.0f} ms (fixed stage cost, ~0 row cost)"
        )
        print(
            f"K=512: per-iteration wall {per_iter*1000:.0f} ms; "
            f"standalone {512*512:,}-row dang shuffle+merge {micro[512]*1000:.0f} ms "
            f"=> marginal row cost ~{(micro[512]-floor)*1000:.0f} ms "
            f"({(micro[512]-floor)/per_iter*100:.1f}% of an iteration, upper bound)"
        )
        print(
            f"K=4096: standalone {4096*4096:,}-row dang shuffle+merge "
            f"{micro[4096]*1000:.0f} ms on 32 local cores => marginal "
            f"~{(micro[4096]-floor)*1000:.0f} ms for 16.7M rows "
            f"(~{(micro[4096]-floor)/(4096*4096)*1e9:.0f} ns/row across 32 workers; "
            f"cluster-normalized: {4096*4096*40/4096/1024:.0f} KiB and "
            f"{4096*4096//4096:,} rows per partition at P=K=4096)"
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
