#!/usr/bin/env python3
"""Decompose the CC weak-scaling gap: per-round slope vs fixed setup.

The weak protocol's CC ratio (BENCH/BASELINE.md) compares TOTAL walls of
``connected_components_csr(rounds=4) + .count()`` at local[2]/60M-edges vs
local[8]/240M-edges. A sub-0.8 total ratio can come from two very
different places:

  * the per-ROUND cost (the actual propagation kernel — what the
    north_rule is about), or
  * the per-RUN fixed cost (init_state generation, the final
    posexplode+count, session/stage latency) — O(V) work that is also
    per-core balanced, but has different cache/JIT behavior.

This probe measures each level's wall at TWO round counts (2 and 8) in
the same fresh pinned process, min-of-N repeats, and fits
T(r) = setup + r * slope. The honest kernel-scaling number is the SLOPE
ratio; a setup-dominated gap calls for amortization (more rounds per
measured run), not kernel surgery.

Usage: python tools/cc_scale_probe.py [--repeats 3] [--levels both]
Spawns one pinned subprocess per level (same discipline as bench.py
--scaling) and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS_LO = 2
ROUNDS_HI = 8


def _level_child(cores: int, edges: int, verts: int, repeats: int) -> None:
    import bench  # noqa: E402  (repo root on sys.path)
    from web_search_pagerank_project_spark.operators.components import (
        build_minlabel_blocks,
        connected_components_csr,
    )

    os.environ.setdefault("WSPR_DRIVER_MEM", "48g")
    stage_dir = bench.ensure_staged(edges, verts)
    parts = cores * 2
    spark = bench.make_spark(f"local[{cores}]", parts)
    try:
        from web_search_pagerank_project_spark.operators.graph_build import (
            load_graph,
        )

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        graph = load_graph(spark, stage_dir, num_partitions=parts)
        sym = spark.read.parquet(f"{stage_dir}/sym_edges")
        t0 = time.monotonic()
        blocks = build_minlabel_blocks(graph, 16, symmetric_edges=sym)
        build_s = time.monotonic() - t0
        connected_components_csr(
            graph, max_rounds=1, blocks=blocks, raise_on_cap=False,
            frontier=False,
        ).count()  # warmup (JIT, python workers, arrow paths)

        jt0, js0 = bench._steal_sample(cores)
        walls = {}
        for rounds in (ROUNDS_LO, ROUNDS_HI):
            best = float("inf")
            for _ in range(repeats):
                t0 = time.monotonic()
                connected_components_csr(
                    graph,
                    max_rounds=rounds,
                    blocks=blocks,
                    rounds_per_action=rounds,
                    raise_on_cap=False,
                    frontier=False,
                ).count()
                best = min(best, time.monotonic() - t0)
            walls[rounds] = best
        jt1, js1 = bench._steal_sample(cores)
        slope = (walls[ROUNDS_HI] - walls[ROUNDS_LO]) / (ROUNDS_HI - ROUNDS_LO)
        out = {
            "cores": cores,
            "edges": edges,
            "verts": verts,
            "block_build_s": round(build_s, 2),
            "wall_r2": round(walls[ROUNDS_LO], 3),
            "wall_r8": round(walls[ROUNDS_HI], 3),
            "slope_per_round": round(slope, 3),
            "setup_s": round(walls[ROUNDS_LO] - ROUNDS_LO * slope, 3),
            "steal_pct": round(100.0 * (js1 - js0) / max(1, jt1 - jt0), 3),
        }
        print("CHILD_JSON " + json.dumps(out), flush=True)
    finally:
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--cores", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--edges", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--verts", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        _level_child(args.cores, args.edges, args.verts, args.repeats)
        return 0

    import bench

    levels = [
        ("weak_lo", 2, 60_000_000, 500_000),
        ("big", 8, 240_000_000, 2_000_000),
    ]
    results = {}
    for name, cores, edges, verts in levels:
        bench.ensure_staged(edges, verts)
        bench._settle_box()
        cmd = [
            "taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
            "--child", f"--cores={cores}", f"--edges={edges}",
            f"--verts={verts}", f"--repeats={args.repeats}",
        ]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("CHILD_JSON ")),
            None,
        )
        if line is None:
            print(proc.stdout[-3000:], file=sys.stderr)
            print(proc.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"level {name} failed")
        results[name] = json.loads(line[len("CHILD_JSON "):])

    lo, hi = results["weak_lo"], results["big"]
    summary = {
        "levels": results,
        "weak_eff_total_r4_proxy": round(
            (lo["setup_s"] + 4 * lo["slope_per_round"])
            / (hi["setup_s"] + 4 * hi["slope_per_round"]), 3,
        ),
        "weak_eff_slope": round(lo["slope_per_round"] / hi["slope_per_round"], 3),
        "weak_eff_setup": round(lo["setup_s"] / hi["setup_s"], 3)
        if hi["setup_s"] > 0 else None,
    }
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
