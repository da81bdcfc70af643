#!/usr/bin/env python3
"""Per-thread CPU attribution for the CC big-level slow mode.

cc_slowmode_probe.py established: slow sessions burn ~3x JVM CPU on the
same work with negligible GC, full core occupancy, and no steal. This
probe samples every JVM thread's utime/stime (/proc/<pid>/task/*/stat)
around the timed section and prints the top consumers by delta, so the
extra CPU lands on a named thread family:

  * "C2 CompilerThread*" -> JIT (re)compilation storm
  * "Executor task launch*" (task threads) with utime -> same code
    running slower (deopt / code-cache luck / allocation path)
  * high stime anywhere -> kernel (page faults, THP compaction)

Usage: python tools/cc_thread_probe.py [--sessions 3]
Big level only (8 cores, 240M edges), rounds_per_action=1.
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


def _threads_cpu(pid: int) -> dict[str, tuple[float, float]]:
    """tid -> (utime_s, stime_s, comm) for every thread of pid."""
    hz = os.sysconf("SC_CLK_TCK")
    out = {}
    base = f"/proc/{pid}/task"
    try:
        tids = os.listdir(base)
    except FileNotFoundError:
        return out
    for t in tids:
        try:
            with open(f"{base}/{t}/stat") as f:
                raw = f.read()
            comm = raw[raw.index("(") + 1 : raw.rindex(")")]
            parts = raw.rsplit(")", 1)[1].split()
            out[t] = (int(parts[11]) / hz, int(parts[12]) / hz, comm)
        except (OSError, ValueError, IndexError):
            continue
    return out


def _child(rounds: int) -> None:
    import bench
    from web_search_pagerank_project_spark.operators.components import (
        build_minlabel_blocks,
        connected_components_csr,
    )
    from web_search_pagerank_project_spark.operators.graph_build import load_graph

    os.environ.setdefault("WSPR_DRIVER_MEM", "48g")
    cores, edges, verts = 8, 240_000_000, 2_000_000
    stage_dir = bench.ensure_staged(edges, verts)
    spark = bench.make_spark(f"local[{cores}]", cores * 2)
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        graph = load_graph(spark, stage_dir, num_partitions=cores * 2)
        sym = spark.read.parquet(f"{stage_dir}/sym_edges")
        blocks = build_minlabel_blocks(graph, 16, symmetric_edges=sym)
        connected_components_csr(
            graph, max_rounds=1, blocks=blocks, raise_on_cap=False,
            frontier=False,
        ).count()  # warmup

        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        jvm_pid = int(mf.getRuntimeMXBean().getName().split("@")[0])

        t0 = time.monotonic()
        before = _threads_cpu(jvm_pid)
        connected_components_csr(
            graph, max_rounds=rounds, blocks=blocks, rounds_per_action=1,
            raise_on_cap=False, frontier=False,
        ).count()
        after = _threads_cpu(jvm_pid)
        wall = time.monotonic() - t0

        fam: dict[str, list[float]] = {}
        for tid, (u1, s1, comm) in after.items():
            u0, s0, _ = before.get(tid, (0.0, 0.0, comm))
            du, ds = u1 - u0, s1 - s0
            if du + ds < 0.05:
                continue
            # collapse numbered families: 'C2 CompilerThre0' etc.
            name = comm.rstrip("0123456789# ")
            f = fam.setdefault(name, [0.0, 0.0, 0])
            f[0] += du
            f[1] += ds
            f[2] += 1
        top = sorted(fam.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))[:12]
        print(
            "CHILD_JSON "
            + json.dumps(
                {
                    "wall": round(wall, 2),
                    "per_round": round(wall / rounds, 3),
                    "threads": [
                        {
                            "family": n,
                            "utime_s": round(u, 1),
                            "stime_s": round(s, 1),
                            "n_threads": c,
                        }
                        for n, (u, s, c) in top
                    ],
                }
            ),
            flush=True,
        )
    finally:
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        _child(args.rounds)
        return 0

    import bench

    for s in range(args.sessions):
        bench.ensure_staged(240_000_000, 2_000_000)
        bench._settle_box()
        proc = subprocess.run(
            ["taskset", "-c", "0-7", sys.executable, __file__, "--child",
             f"--rounds={args.rounds}"],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (l for l in proc.stdout.splitlines()
             if l.startswith("CHILD_JSON ")), None,
        )
        if line is None:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"session {s} failed")
        print(json.dumps({"session": s, **json.loads(line[11:])}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
