#!/usr/bin/env python3
"""Attribute the CC big-level "slow mode" (BENCH/BASELINE.md history).

The weak-scaling history shows the 8-core/240M-edge CC measurement is
bimodal: ~4.1 s/round in good sessions, 7-9 s/round in slow ones, decided
per PROCESS (within-session repeats are tight). tools/cc_scale_probe.py
localized the gap to the per-round slope (not fixed setup). This probe
runs N fresh pinned big-level sessions (and lo-level references) and, for
each timed section, records every resource axis that could eat the
missing time:

  * per-round walls (rounds_per_action=1) AND the batched wall (rpa=r)
  * JVM GC time delta (all collector MXBeans)
  * JVM process CPU (utime+stime, /proc/<pid>/stat)
  * python worker CPU (pyspark.daemon subtree: live children's
    utime+stime plus the daemon's reaped-children cutime/cstime)
  * mean busy fraction of the pinned cores, sampled at 200 ms — separates
    "cores busy doing something slow" from "cores idle waiting"
  * hypervisor steal on the pinned cores

Reading the output: wall*cores ~= jvm_cpu + py_cpu + idle + steal.
GC-dominated slow mode shows in gc_ms; allocator/page-fault slow mode
shows as high cpu with normal GC; straggler/scheduling slow mode shows
as low busy_frac with normal per-core CPU.

Usage: python tools/cc_slowmode_probe.py [--sessions 4] [--level big|lo]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _read_stat_cpu(pid: int) -> float:
    """utime+stime (seconds) of one process; 0.0 if gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(parts[11]) + int(parts[12])) / hz  # utime, stime
    except (FileNotFoundError, ProcessLookupError, IndexError):
        return 0.0


def _read_stat_child_cpu(pid: int) -> float:
    """cutime+cstime (seconds): CPU of this process's REAPED children."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(parts[13]) + int(parts[14])) / hz
    except (FileNotFoundError, ProcessLookupError, IndexError):
        return 0.0


def _descendants(root: int) -> list[int]:
    kids: dict[int, list[int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(d))
    out, stack = [], [root]
    while stack:
        p = stack.pop()
        for c in kids.get(p, []):
            out.append(c)
            stack.append(c)
    return out


class _CoreSampler(threading.Thread):
    """Samples busy fraction of the given cores from /proc/stat."""

    def __init__(self, cores: list[int], interval: float = 0.2):
        super().__init__(daemon=True)
        self.cores, self.interval = cores, interval
        self.samples: list[float] = []
        self._halt = threading.Event()

    @staticmethod
    def _snap(cores):
        busy, total = {}, {}
        with open("/proc/stat") as f:
            for line in f:
                if not line.startswith("cpu"):
                    continue
                name = line.split()[0]
                if name == "cpu" or int(name[3:]) not in cores:
                    continue
                v = [int(x) for x in line.split()[1:]]
                idle = v[3] + v[4]  # idle + iowait
                total[name] = sum(v)
                busy[name] = sum(v) - idle
        return busy, total

    def run(self):
        b0, t0 = self._snap(self.cores)
        while not self._halt.wait(self.interval):
            b1, t1 = self._snap(self.cores)
            db = sum(b1[c] - b0[c] for c in b1)
            dt = sum(t1[c] - t0[c] for c in t1)
            if dt > 0:
                self.samples.append(db / dt)
            b0, t0 = b1, t1

    def stop(self) -> float:
        self._halt.set()
        self.join(timeout=2)
        return sum(self.samples) / len(self.samples) if self.samples else -1.0


def _level_child(cores: int, edges: int, verts: int, rounds: int) -> None:
    import bench
    from web_search_pagerank_project_spark.operators.components import (
        build_minlabel_blocks,
        connected_components_csr,
    )
    from web_search_pagerank_project_spark.operators.graph_build import load_graph

    os.environ.setdefault("WSPR_DRIVER_MEM", "48g")
    stage_dir = bench.ensure_staged(edges, verts)
    parts = cores * 2
    spark = bench.make_spark(f"local[{cores}]", parts)
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        graph = load_graph(spark, stage_dir, num_partitions=parts)
        sym = spark.read.parquet(f"{stage_dir}/sym_edges")
        blocks = build_minlabel_blocks(graph, 16, symmetric_edges=sym)
        connected_components_csr(
            graph, max_rounds=1, blocks=blocks, raise_on_cap=False,
            frontier=False,
        ).count()  # warmup

        jvm = spark.sparkContext._jvm
        mf = jvm.java.lang.management.ManagementFactory
        jvm_pid = int(mf.getRuntimeMXBean().getName().split("@")[0])

        def gc_ms() -> int:
            return sum(
                b.getCollectionTime()
                for b in mf.getGarbageCollectorMXBeans()
            )

        def py_cpu() -> float:
            subtree = _descendants(jvm_pid)
            live = sum(_read_stat_cpu(p) for p in subtree)
            reaped = sum(_read_stat_child_cpu(p) for p in subtree)
            return live + reaped

        core_list = list(range(cores))
        out = {"cores": cores, "edges": edges, "rounds": rounds}

        mode_list = [("per_round", 1), ("batched", rounds)]
        if os.environ.get("WSPR_PROBE_BATCHED_FIRST"):
            mode_list.reverse()
        for mode, rpa in mode_list:
            st0, steal0 = bench._steal_sample(cores)
            g0, j0, p0 = gc_ms(), _read_stat_cpu(jvm_pid), py_cpu()
            sampler = _CoreSampler(core_list)
            sampler.start()
            t0 = time.monotonic()
            res = connected_components_csr(
                graph, max_rounds=rounds, blocks=blocks,
                rounds_per_action=rpa, raise_on_cap=False, frontier=False,
            )
            res.count()
            wall = time.monotonic() - t0
            busy = sampler.stop()
            st1, steal1 = bench._steal_sample(cores)
            out[mode] = {
                "wall": round(wall, 3),
                "per_round": round(wall / rounds, 3),
                "gc_ms": gc_ms() - g0,
                "jvm_cpu_s": round(_read_stat_cpu(jvm_pid) - j0, 2),
                "py_cpu_s": round(py_cpu() - p0, 2),
                "busy_frac": round(busy, 3),
                "steal_pct": round(
                    100.0 * (steal1 - steal0) / max(1, st1 - st0), 3
                ),
                "cpu_accounted_frac": round(
                    (_read_stat_cpu(jvm_pid) - j0 + py_cpu() - p0)
                    / (cores * wall), 3,
                ),
            }
        print("CHILD_JSON " + json.dumps(out), flush=True)
    finally:
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--level", choices=["big", "lo", "both"], default="both")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--cores", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--edges", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--verts", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        _level_child(args.cores, args.edges, args.verts, args.rounds)
        return 0

    import bench

    levels = {
        "lo": (2, 60_000_000, 500_000),
        "big": (8, 240_000_000, 2_000_000),
    }
    wanted = ["big", "lo"] if args.level == "both" else [args.level]
    results: dict[str, list] = {n: [] for n in wanted}
    for s in range(args.sessions):
        for name in wanted:
            cores, edges, verts = levels[name]
            bench.ensure_staged(edges, verts)
            bench._settle_box()
            cmd = [
                "taskset", "-c", f"0-{cores - 1}", sys.executable, __file__,
                "--child", f"--cores={cores}", f"--edges={edges}",
                f"--verts={verts}", f"--rounds={args.rounds}",
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
            line = next(
                (l for l in proc.stdout.splitlines()
                 if l.startswith("CHILD_JSON ")), None,
            )
            if line is None:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"session {s} level {name} failed")
            r = json.loads(line[len("CHILD_JSON "):])
            results[name].append(r)
            print(json.dumps({"session": s, "level": name, **r}), flush=True)
    print("SUMMARY " + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
