"""Weak-mode memory-bus microbench (scaling-evidence decomposition).

Measures the HARDWARE's own weak-scaling ceiling for the CC kernel's
traffic shape: P OS-pinned processes (no Spark, no Python-worker protocol,
no shuffle) each run identical fixed-size numpy work — a V-sized random
gather followed by a segment reduceat-min over a 30M-edge block, the CC
CSR kernel's inner loop. Perfect weak scaling = equal wall at P=2 and
P=8; measured min-of-3 on this VM: T_2=1.34s vs T_8=1.80s => ceiling
~0.74. Any kernel at that efficiency is bandwidth-bound at the box's
single memory bus, not at its own design (the bus is the one resource a
single host cannot multiply with the core count; an executor-scaled
cluster adds a bus per executor).

Original docstring: Weak-mode memory-bus microbench: P pinned processes, each doing the
SAME fixed amount of CC-kernel-like array work (gather + reduceat-min over
a 30M-edge block set). Perfect weak scaling => equal wall at P=2 and P=8.

Usage: python /tmp/bus_weak.py <nprocs>
"""
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


def main():
    p = int(sys.argv[1])
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(i, q)) for i in range(p)]
    t0 = time.monotonic()
    for pr in procs:
        pr.start()
    walls = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    print({"procs": p, "max_worker_wall": round(max(walls), 2),
           "mean": round(sum(walls) / len(walls), 2)})


if __name__ == "__main__":
    main()
