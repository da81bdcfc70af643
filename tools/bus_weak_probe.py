"""Weak-mode memory-bus microbench (scaling-evidence decomposition).

Measures the HARDWARE's own weak-scaling behavior for the CC kernel's
traffic shape: P OS-pinned processes (no Spark, no Python-worker protocol,
no shuffle) each run identical fixed-size numpy work — a V-sized random
gather followed by a segment reduceat-min over a 30M-edge block, the CC
CSR kernel's inner loop. Perfect weak scaling = equal wall at P=2 and
P=8. Measured on a QUIET host (min-of-3 per level, two runs):
T_2=1.97/2.02 s vs T_8=1.96/1.80 s => efficiency 1.00/1.12 — the
per-core label table (2 MB) is cache-resident and the edge stream does
not saturate the bus at 8 cores, so the hardware imposes NO weak ceiling
on CC-shaped work. (An earlier informal run under background load read
T_2=1.34 vs T_8=1.80 => "0.74 ceiling"; that was host contention, not a
hardware bound — the quiet-host protocol is the one recorded in
BENCH/bus_probe_cc.json.) Contrast the PR kernel's Arrow-transfer shape,
which probes at 0.79: THAT shape is bus-bound, this one is not. The
consequence for scaling evidence: CC variance across collections is
session-level (JVM heap/GC luck, shared-VM neighbors) and is absorbed by
the pre-declared cross-collection median.

Original docstring: Weak-mode memory-bus microbench: P pinned processes, each doing the
SAME fixed amount of CC-kernel-like array work (gather + reduceat-min over
a 30M-edge block set). Perfect weak scaling => equal wall at P=2 and P=8.

Usage:
  python tools/bus_weak_probe.py <nprocs>   # one level
  python tools/bus_weak_probe.py --both     # 2 then 8, min-of-3 each,
                                            # prints the weak efficiency
"""
import json
import os
import sys
import time
import multiprocessing as mp

import numpy as np

EDGES_PER_PROC = 30_000_000
VERTS_PER_PROC = 250_000
REPS = 6


def worker(i, q):
    os.sched_setaffinity(0, {i})
    rng = np.random.default_rng(i)
    sps = rng.integers(0, VERTS_PER_PROC, EDGES_PER_PROC).astype(np.int32)
    labels = rng.integers(0, 1 << 40, VERTS_PER_PROC).astype(np.int64)
    starts = np.arange(0, EDGES_PER_PROC, 120, dtype=np.int32)
    # warm
    np.minimum.reduceat(labels[sps], starts)
    t0 = time.monotonic()
    for _ in range(REPS):
        vals = labels[sps]          # gather (random access, V-sized table)
        np.minimum.reduceat(vals, starts)  # segment min (streaming)
    q.put(time.monotonic() - t0)


def run_level(p: int) -> float:
    """Max worker wall across P pinned processes (the level's wall)."""
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, q)) for i in range(p)]
    for pr in procs:
        pr.start()
    walls = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return max(walls)


def main():
    if "--both" in sys.argv:
        # Same min-of-3 discipline as the Spark scaling levels. Perfect
        # weak scaling would be eff = 1.0; anything the HARDWARE loses
        # here bounds what any memory-bound CC kernel can report on this
        # box, because the probe has no Spark, no shuffle, no Python
        # worker protocol — only the kernel's own traffic shape.
        lo = min(run_level(2) for _ in range(3))
        hi = min(run_level(8) for _ in range(3))
        print(json.dumps({
            "shape": "gather(int64 labels) + minimum.reduceat, "
                     f"{EDGES_PER_PROC:,} edges x {REPS} reps per proc",
            "wall_p2": round(lo, 3), "wall_p8": round(hi, 3),
            "weak_efficiency": round(lo / hi, 3),
        }))
        return
    p = int(sys.argv[1])
    wall = run_level(p)
    print({"procs": p, "max_worker_wall": round(wall, 2)})


if __name__ == "__main__":
    main()
