#!/usr/bin/env python3
"""Benchmark harness (driver contract + scaling evidence).

Default: runs the headline queries on ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

``--scaling``: N vs 4N cores (default local[2] vs local[8], env
WSPR_SCALE_*) on one pre-staged deterministic power-law graph; times both
PageRank kernels + fixed CC rounds and writes BENCH/BASELINE.md with
throughput at both parallelism levels + scaling efficiency (the sandbox
evidence protocol for the north_rule two-cluster-size criterion; see
BASELINE.md).

Headline queries:
  pagerank      power-law graph (~20M*sf edges), power method to eps=1e-6
                capped at PR_MAX_ITERS; reports iterations/hour derived rate
  cc            connected components on the same graph
  triangles     degree-ordered triangle count on a thinned variant
  extract       HTML->text+outlinks over synthetic pages (~200k*sf pages)
  minhash       MinHash+LSH near-dup pairs over documents
  textstats     token/quality/language stats over documents
  ann           brute-force cosine top-k over embeddings
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = float(SF_DIR.rstrip("/").split("sf")[-1])

# graph sizing per FIXTURES.md §6 (measurable multi-second iterations)
N_EDGES = max(int(20_000_000 * SF), 20_000)
N_VERTS = max(int(1_000_000 * SF), 2_000)
N_PAGES = max(int(200_000 * SF), 2_000)
PR_MAX_ITERS = int(os.environ.get("WSPR_BENCH_PR_ITERS", "8"))


def make_spark(master: str, shuffle_partitions: int):
    from web_search_pagerank_project_spark.session import get_spark

    return get_spark(
        app_name="wspr-bench",
        master=master,
        shuffle_partitions=shuffle_partitions,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        },
    )


def build_bench_graph(spark, n_edges=N_EDGES, n_verts=N_VERTS):
    from web_search_pagerank_project_spark import build_graph
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    edges = synth_edges(
        spark, n_vertices=n_verts, n_edges=n_edges, seed=42, zipf_a=1.5
    )
    return build_graph(edges, cache=True)


def _warmup(spark) -> None:
    """Exercise every engine code path once, untimed, before the headline
    measurements: first-query session costs (JIT, whole-stage-codegen
    compilation, python-worker pool spin-up, AQE machinery) belong to the
    session, not to whichever operator happens to run first. The scaling
    protocol has warmed up per level since round 1; the headline queries
    did not — round 2's minhash line was ~2x its warm cost and
    graph_build_core carried ~7 s of first-window/first-broadcast warmup.
    Documented in BASELINE.md §bench-protocol."""
    import pyspark.sql.functions as F

    from web_search_pagerank_project_spark import (
        build_graph,
        connected_components_csr,
        pagerank,
        pagerank_csr,
        triangle_count,
    )
    from web_search_pagerank_project_spark.functions.html import extract_pages
    from web_search_pagerank_project_spark.operators.dedup import minhash_dedup
    from web_search_pagerank_project_spark.sources.synth import (
        synth_edges,
        synth_pages,
    )

    e = synth_edges(spark, n_vertices=500, n_edges=5_000, seed=1, zipf_a=1.5)
    g = build_graph(e, cache=True)
    pagerank(g, max_iterations=2, epsilon=0.0, iters_per_action=2)
    pagerank_csr(g, max_iterations=2, epsilon=0.0, iters_per_action=2)
    connected_components_csr(g, max_rounds=2, raise_on_cap=False).count()
    triangle_count(g)
    g.unpersist()
    pages = synth_pages(spark, n=200, seed=1, dup_fraction=0.05)
    extract_pages(pages).agg(F.sum(F.length("text"))).collect()
    docs = spark.createDataFrame(
        [(i, f"warm doc number {i} with a little text body") for i in range(50)],
        "doc_id long, text string",
    )
    minhash_dedup(docs, threshold=0.5).count()


def run_benchmarks(spark):
    import pyspark.sql.functions as F

    from web_search_pagerank_project_spark import (
        connected_components_csr,
        pagerank,
        triangle_count,
    )
    from web_search_pagerank_project_spark.functions.html import extract_pages
    from web_search_pagerank_project_spark.functions.textstats import add_text_stats
    from web_search_pagerank_project_spark.operators.dedup import minhash_dedup
    from web_search_pagerank_project_spark.operators.similarity import (
        brute_force_topk,
    )
    from web_search_pagerank_project_spark.sources.synth import synth_pages

    timings: dict[str, float] = {}
    detail: dict[str, object] = {}

    _warmup(spark)
    headline_t0 = time.monotonic()

    # min-of-N (VERDICT r3 item 3): a single-shot headline on a shared host
    # recorded 5 regressed lines in one round while the quiet-host protocol
    # numbers said otherwise — the artifact now uses the same min-of-warm
    # discipline the scaling levels already do, so BENCH_r{N}.json and
    # BENCH/BASELINE.md can't disagree about host noise again.
    repeats = int(os.environ.get("WSPR_BENCH_REPEATS", "3"))

    def timed(name, fn, cleanup=None):
        best = float("inf")
        out = None
        for i in range(repeats):
            if i and cleanup is not None:
                cleanup(out)
            t0 = time.monotonic()
            out = fn()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        return out

    # graph build once; synthetic-data generation and the actual
    # build_graph operator are timed SEPARATELY (VERDICT r2 item 2: the
    # combined timer hid which side the 19 s went to). graph_build is kept
    # as the sum for cross-round comparability.
    from web_search_pagerank_project_spark import build_graph
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    raw_edges = timed(
        "synth_gen",
        lambda: synth_edges(
            spark, n_vertices=N_VERTS, n_edges=N_EDGES, seed=42, zipf_a=1.5
        ).localCheckpoint(eager=True),
        cleanup=lambda df: df.unpersist(),
    )
    graph = timed(
        "graph_build_core",
        lambda: build_graph(raw_edges, cache=True),
        cleanup=lambda g: g.unpersist(),
    )
    timings["graph_build"] = round(
        timings["synth_gen"] + timings["graph_build_core"], 3
    )

    res = timed(
        "pagerank",
        lambda: pagerank(
            graph, max_iterations=PR_MAX_ITERS, epsilon=1e-6,
            iters_per_action=PR_MAX_ITERS,
        ),
    )
    detail["pagerank_iters"] = res.iterations
    detail["pagerank_iters_per_hour"] = round(
        res.iterations / max(timings["pagerank"], 1e-9) * 3600, 1
    )
    detail["pagerank_edges_per_sec"] = round(
        res.iterations * N_EDGES / max(timings["pagerank"], 1e-9), 1
    )

    from web_search_pagerank_project_spark import pagerank_csr

    res_csr = timed(
        "pagerank_csr",
        lambda: pagerank_csr(
            graph, max_iterations=PR_MAX_ITERS, epsilon=1e-6,
            iters_per_action=PR_MAX_ITERS,
        ),
    )
    detail["pagerank_csr_iters_per_hour"] = round(
        res_csr.iterations / max(timings["pagerank_csr"], 1e-9) * 3600, 1
    )
    detail["pagerank_csr_edges_per_sec"] = round(
        res_csr.iterations * N_EDGES / max(timings["pagerank_csr"], 1e-9), 1
    )

    # CC via the CSR min-label kernel (kernels pinned label-for-label in
    # tests/test_cc_kernels.py); block build + symmetrize are inside the
    # timing — the bench measures the full operator, end to end
    # rounds_per_action=1: fused CC batches recompute through the
    # double-consumer DAG at scale (round-4 task-count probe: 2.2x tasks)
    timed(
        "cc",
        lambda: connected_components_csr(
            graph, max_rounds=50, rounds_per_action=1
        ).count(),
    )

    # triangles on a thinned graph (distinct-edge subset) to keep the wedge
    # join bounded at bench scale
    timed("triangles", lambda: triangle_count(graph))

    timed(
        "extract",
        lambda: extract_pages(
            synth_pages(spark, n=N_PAGES, seed=7, dup_fraction=0.05)
        ).select(F.sum(F.length("text")), F.sum(F.size("outlinks"))).collect(),
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash", lambda: minhash_dedup(docs, threshold=0.5).count())
    timed(
        "textstats",
        lambda: add_text_stats(docs)
        .agg(
            F.sum("n_tokens"), F.avg("quality"), F.countDistinct("lang_guess")
        )
        .collect(),
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.limit(1).collect()[0]["embedding"]
    timed("ann", lambda: brute_force_topk(emb, [float(x) for x in qv], k=10).collect())

    # round-4 graph-operator breadth, timed into DETAIL (not the headline
    # total — the headline stays the reference-parity query set so its
    # round-over-round comparison isn't polluted by coverage growth).
    # SCC runs once (it's a multi-fixpoint loop, the costliest op here);
    # the single-pass ops reuse the min-of-N discipline.
    if os.environ.get("WSPR_BENCH_GRAPH_OPS", "1") == "1":
        from web_search_pagerank_project_spark import (
            bfs_distances,
            clustering_coefficient,
            common_neighbors_topk,
            degree_histogram,
            reciprocity,
            strongly_connected_components,
        )

        gops: dict[str, float] = {}

        def timed_gop(name, fn, n=repeats):
            best = float("inf")
            for _ in range(n):
                t0 = time.monotonic()
                fn()
                best = min(best, time.monotonic() - t0)
            gops[name] = round(best, 3)

        timed_gop(
            "bfs",
            lambda: bfs_distances(graph, seed_ids=[0]).count(),
            n=min(2, repeats),
        )
        timed_gop("clustering_coeff", lambda: clustering_coefficient(graph).count())
        timed_gop("reciprocity", lambda: reciprocity(graph))
        timed_gop(
            "degree_histogram", lambda: degree_histogram(graph, "total").count()
        )
        timed_gop(
            "common_neighbors_top20",
            lambda: common_neighbors_topk(
                graph, k=20, max_center_degree=64
            ).count(),
            n=min(2, repeats),
        )
        # min-of-2 for the heavy iterative ops (VERDICT r4 item 8): n=1
        # walls were un-cross-checkable against host noise; two runs bound
        # the same-session jitter while keeping the section's cost sane
        scc_stats: dict[str, object] = {}

        def _scc_run():
            r = strongly_connected_components(graph)
            n = r.labels.count()
            # phase breakdown of the costliest graph-op (VERDICT r4 item
            # 3) — deterministic round counts + this run's stage walls
            scc_stats.update(
                {"phases": r.phases, "rounds": r.rounds, "stats": r.phase_stats}
            )
            return n

        timed_gop("scc", _scc_run, n=min(2, repeats))
        detail["scc_phases"] = scc_stats
        # round-4b breadth: one 64-source MS-BFS wave (the unit of work a
        # cluster fans out across waves), assortativity (single pass),
        # HyperBall to its register fixed point (iterative, run once), and
        # the host collapse over urls minted from the synth edge endpoints
        from pyspark.sql import functions as _F

        from web_search_pagerank_project_spark import (
            degree_assortativity,
            harmonic_centrality,
            host_edges,
            neighborhood_function,
        )

        timed_gop(
            "harmonic_64src_wave",
            lambda: harmonic_centrality(graph, seed_ids=list(range(64))).count(),
            n=min(2, repeats),
        )
        timed_gop("assortativity", lambda: degree_assortativity(graph))
        timed_gop(
            "hyperball_nf",
            lambda: neighborhood_function(graph, m=16).count(),
            n=min(2, repeats),
        )
        # round-5: HyperBall-derived approximate harmonic+closeness — the
        # scale path that replaces all-sources exact MS-BFS (same loop
        # shape as hyperball_nf plus the two accumulator columns). n=1:
        # at ~50 s to its fixed point this is the single costliest detail
        # op, and doubling it pushed the whole bench process toward
        # driver-timeout territory (477 s observed); its loop shape is
        # cross-checked by hyperball_nf's min-of-2 wall.
        from web_search_pagerank_project_spark import hyperball_centralities

        timed_gop(
            "hyperball_centralities",
            lambda: hyperball_centralities(graph, m=16).count(),
            n=1,
        )
        host_urls = raw_edges.select(
            _F.concat(
                _F.lit("http://h"),
                _F.pmod(_F.xxhash64("src"), _F.lit(997)).cast("string"),
                _F.lit(".example/"),
                "src",
            ).alias("src"),
            _F.concat(
                _F.lit("http://h"),
                _F.pmod(_F.xxhash64("dst"), _F.lit(997)).cast("string"),
                _F.lit(".example/"),
                "dst",
            ).alias("dst"),
        )
        timed_gop("host_collapse", lambda: host_edges(host_urls).count())

        # round-5: incremental snapshot maintenance (the Common-Crawl
        # monthly-delta operating mode). Split the synth edges 99/1 by a
        # deterministic hash, build+converge the base snapshot, patch the
        # 1% delta in with update_graph, and re-converge warm (x0 = the
        # base snapshot's ranks) vs cold. Walls are n=1 (three PageRank
        # convergences inside already); the iteration counts are
        # deterministic and the real signal.
        from web_search_pagerank_project_spark import pagerank as _pr
        from web_search_pagerank_project_spark import update_graph

        split = raw_edges.withColumn(
            "_h", _F.pmod(_F.xxhash64("src", "dst"), _F.lit(100))
        )
        base_edges = split.filter("_h != 0").drop("_h")
        delta_edges = split.filter("_h = 0").drop("_h").localCheckpoint(eager=True)
        inc_eps, inc_cap, inc_ipa = 1e-4, 40, 2
        t0 = time.monotonic()
        g_base = build_graph(base_edges, cache=True, keep_mult=True)
        base_build_w = time.monotonic() - t0
        prev = _pr(
            g_base, epsilon=inc_eps, max_iterations=inc_cap,
            iters_per_action=inc_ipa,
        )
        t0 = time.monotonic()
        g_upd = update_graph(g_base, delta_edges)
        update_w = time.monotonic() - t0
        t0 = time.monotonic()
        warm = _pr(
            g_upd, epsilon=inc_eps, max_iterations=inc_cap,
            iters_per_action=inc_ipa, x0=prev.ranks,
        )
        warm_w = time.monotonic() - t0
        t0 = time.monotonic()
        cold = _pr(
            g_upd, epsilon=inc_eps, max_iterations=inc_cap,
            iters_per_action=inc_ipa,
        )
        cold_w = time.monotonic() - t0
        # round-5: batched multi-personalization PageRank — 8 topic
        # vectors through ONE edge scan per round; compare its wall to
        # 8x the single-vector headline wall (timings["pagerank"]) to see
        # the shared-scan win
        from web_search_pagerank_project_spark import pagerank_batch

        topic_vs = {
            f"t{i}": graph.vertices.select(
                "id",
                _F.when(
                    _F.pmod(_F.xxhash64("id"), _F.lit(8)) == i, 1.0
                )
                .otherwise(0.0)
                .alias("v"),
            )
            for i in range(8)
        }
        t0 = time.monotonic()
        bres = pagerank_batch(
            graph, topic_vs, max_iterations=PR_MAX_ITERS, epsilon=1e-6
        )
        bres.ranks.count()
        detail["pagerank_batch8"] = {
            "wall": round(time.monotonic() - t0, 3),
            "iters": bres.iterations,
            "vs_8x_single_wall": round(8 * timings["pagerank"], 3),
        }

        detail["incremental"] = {
            "delta_pct": 1,
            "epsilon": inc_eps,
            "base_build_wall": round(base_build_w, 3),
            "update_wall": round(update_w, 3),
            "warm_pagerank_wall": round(warm_w, 3),
            "cold_pagerank_wall": round(cold_w, 3),
            "warm_iters": warm.iterations,
            "cold_iters": cold.iterations,
            "warm_final_resid": warm.residuals[-1],
            "cold_final_resid": cold.residuals[-1],
        }
        g_base.unpersist()
        g_upd.unpersist()
        delta_edges.unpersist()

        detail["graph_ops"] = gops

    graph.unpersist()
    # headline value = sum of per-query min walls (graph_build is already
    # the synth+core sum, so it is excluded from the total). The raw wall
    # of the whole repeated run goes to detail; comparing THAT across
    # rounds would conflate the repeat count with engine speed.
    headline_total = round(
        sum(v for k, v in timings.items() if k != "graph_build"), 3
    )
    detail["bench_repeats"] = repeats
    detail["wall_with_repeats"] = round(time.monotonic() - headline_t0, 3)

    # one 10x-reference-scale row (20M edges ~= 12.4x the reference's 1.6M):
    # VERDICT r2 item 3 — at sf0.1 the fixed per-stage driver latency
    # dominates; this row shows where the engine actually sits once the
    # work outweighs the overhead. NOT part of the headline total.
    if os.environ.get("WSPR_BENCH_SF1", "1") == "1":
        from web_search_pagerank_project_spark import build_graph, pagerank_csr
        from web_search_pagerank_project_spark.sources.synth import synth_edges

        t0 = time.monotonic()
        edges1 = synth_edges(
            spark, n_vertices=1_000_000, n_edges=20_000_000, seed=42, zipf_a=1.5
        ).localCheckpoint(eager=True)
        synth1 = time.monotonic() - t0
        t0 = time.monotonic()
        g1 = build_graph(edges1, cache=True)
        build1 = time.monotonic() - t0
        t0 = time.monotonic()
        r1 = pagerank_csr(
            g1, max_iterations=PR_MAX_ITERS, epsilon=1e-6,
            iters_per_action=PR_MAX_ITERS,
        )
        pr1 = time.monotonic() - t0
        detail["sf1"] = {
            "edges": 20_000_000,
            "synth_gen": round(synth1, 3),
            "graph_build_core": round(build1, 3),
            "pagerank_csr": round(pr1, 3),
            "pagerank_iters": r1.iterations,
            "pagerank_csr_iters_per_hour": round(r1.iterations / pr1 * 3600, 1),
            "build_plus_pagerank": round(build1 + pr1, 3),
        }
        g1.unpersist()

    return timings, detail, headline_total


SCALE_N = int(os.environ.get("WSPR_SCALE_CORES", "2"))  # N; 4N is 4*this
SCALE_EDGES = int(os.environ.get("WSPR_SCALE_EDGES", str(240_000_000)))
SCALE_VERTS = int(os.environ.get("WSPR_SCALE_VERTS", str(2_000_000)))
SCALE_ITERS = int(os.environ.get("WSPR_SCALE_ITERS", "6"))
# 8 dense rounds (was 4): with the chunked kernel the per-round slope is
# ~1.6-1.9 s at BOTH levels (tools/cc_slowmode_probe.py), so the one-time
# tail (state init + posexplode + count) dominated a 4-round wall and its
# own scaling noise swamped the slope's. A real 10^12-edge CC runs tens of
# rounds; 8 keeps the measured quantity per-round throughput, which is
# what the north_rule's efficiency criterion is about.
SCALE_CC_ROUNDS = int(os.environ.get("WSPR_SCALE_CC_ROUNDS", "8"))
SCALE_REPEATS = int(os.environ.get("WSPR_SCALE_REPEATS", "3"))
# power iterations fused per Spark action (driver-latency amortization;
# identical numerics — see csr_kernel.pagerank_csr)
SCALE_IPA = int(os.environ.get("WSPR_SCALE_IPA", "3"))
# block count, FIXED across levels (identical work), sized so each block's
# CSR arrays stay ~3M edges. Coarser K (= top-level partition count) was
# measured and rejected: with one heavy block per partition, stragglers
# cost the high-parallelism level ~25% despite the smaller partials
# shuffle — many blocks per partition smooths load imbalance.
SCALE_BLOCKS = int(
    os.environ.get("WSPR_SCALE_BLOCKS", str(max(16, SCALE_EDGES // 3_000_000)))
)
# CC block count: FIXED at the same value for every level. Min-label's
# per-destination-block fan-in is one min-array per SOURCE block, so its
# dense-round shuffle volume is min(K*V, ~E); scaling K with the level
# multiplies per-core volume until K*V saturates at E. The 10^12-edge
# target is edge-saturated for any practical K (per-core volume E/cores,
# constant); fixed K mirrors that constant-fan-in property at test scale
# (measured: K growing 20->80 weak-scales 0.71, fixed K=16 at 0.97 with a
# faster absolute high level). PageRank keeps per-level K: its partials
# are float64 sums whose volume is bounded the same way but its wall is
# edge-dominated (bincount over E/core), measured insensitive to this.
SCALE_CC_BLOCKS = int(os.environ.get("WSPR_SCALE_CC_BLOCKS", "16"))
# fresh JVM sessions per level; min across sessions (session-granular
# noise: identical work in two sessions measured 23% apart)
SCALE_SESSIONS = int(os.environ.get("WSPR_SCALE_SESSIONS", "2"))
# CC gets one extra session by default: its big level shows a bimodal
# ~1.7x "slow mode" that hits a whole session at a time (both PR kernels
# in the same collection unaffected; steal <0.2%) — with p(slow)~0.3 per
# session, min-of-2 sessions is corrupted ~9% of collections (observed:
# 1 of 9), min-of-3 cuts that to ~3%. PR stays at 2: its session spread
# never showed the mode.
SCALE_CC_SESSIONS = int(
    os.environ.get("WSPR_SCALE_CC_SESSIONS", str(max(3, SCALE_SESSIONS)))
)
# a session whose timed section sees more hypervisor steal than this gets
# ONE replacement session (see _sessions_with_steal_retry)
STEAL_RETRY_PCT = float(os.environ.get("WSPR_SESSION_STEAL_RETRY_PCT", "2.0"))


def _steal_sample(cores: int) -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) summed over cpu0..cpu(cores-1) from
    /proc/stat — the cores the session is taskset-pinned to. Hypervisor
    steal on a shared VM is the one exclusivity violation the
    collection-start load guard cannot see: it arrives mid-run, lasts
    minutes, and inflates every repeat of a min-of-N equally (round-4
    probe: dedicated back-to-back big-level CC runs spread 18.7-22.9 s,
    while two full collections recorded 29 s as the min of SIX
    measurements — a box-level state, not kernel or JVM noise)."""
    tot = steal = 0
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu"):
                break
            name = line.split()[0]
            if name == "cpu" or int(name[3:]) >= cores:
                continue
            v = [int(x) for x in line.split()[1:]]
            tot += sum(v)
            steal += v[7] if len(v) > 7 else 0
    return tot, steal


def _stage_dir_for(edges: int, verts: int) -> str:
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"wspr_scale_graph_{edges}_{verts}"
    )


def ensure_staged(edges: int, verts: int) -> str:
    """Stage (once, at full parallelism) the deterministic power-law graph
    + its symmetrized distinct edge set. Builds are not the scaled metric;
    every level loads the identical parquet. Content-keyed and reused
    across invocations (deterministic seed => identical graph)."""
    import shutil

    stage_dir = _stage_dir_for(edges, verts)
    marker = os.path.join(stage_dir, "_STAGED2")
    if os.path.exists(marker):
        return stage_dir
    shutil.rmtree(stage_dir, ignore_errors=True)
    spark = make_spark("local[32]", 64)
    try:
        import pyspark.sql.functions as F

        from web_search_pagerank_project_spark.operators.graph_build import (
            save_graph,
        )

        g = build_bench_graph(spark, n_edges=edges, n_verts=verts)
        save_graph(g, stage_dir)
        e = g.edges.select("src_id", "dst_id")
        sym = (
            e.unionAll(
                e.select(
                    F.col("dst_id").alias("src_id"),
                    F.col("src_id").alias("dst_id"),
                )
            )
            .filter(F.col("src_id") != F.col("dst_id"))
            .distinct()
        )
        sym.write.mode("overwrite").parquet(f"{stage_dir}/sym_edges")
        g.unpersist()
        with open(marker, "w") as f:
            f.write("ok")
    finally:
        spark.stop()
    return stage_dir


def scale_level_run(
    cores: int, edges: int, verts: int, blocks_k: int, cc_blocks_k: int,
    mode: str = "pr",
) -> None:
    """One scaling level: local[cores] measurements on the staged
    (edges, verts) graph; ONE JSON line out.

    Invoked by scaling_run as a subprocess under ``taskset -c 0-(cores-1)``
    so the core budget is enforced at the OS level for the whole process
    tree (JVM threads + forked python workers).

    mode="pr" measures both PageRank kernels; mode="cc" measures CC in a
    process of its own. They used to share one session (CC after PR, with
    the PR working set unpersisted + System.gc between them) — and the CC
    measurement was still ~2x slower at the 4N level than a fresh session
    (24.2 s vs 12.7 s at 240M edges, round-4 probe): a JVM whose heap grew
    an 80-block 240M-edge PR working set keeps paying GC/fragmentation tax
    after unpersist, and the tax scales with the level, which is exactly
    what a scaling ratio cannot tolerate. The committed weak-CC 0.51 of
    rounds 2-3 was THIS session-pollution artifact, not kernel behavior.
    One process per kernel family makes every measurement first-in-JVM.
    """
    os.environ.setdefault("WSPR_DRIVER_MEM", "48g")
    stage_dir = _stage_dir_for(edges, verts)
    parts = cores * 2
    spark = make_spark(f"local[{cores}]", parts)
    try:
        from web_search_pagerank_project_spark import (
            build_csr_blocks,
            connected_components_csr,
            pagerank,
            pagerank_csr,
        )
        from web_search_pagerank_project_spark.operators.components import (
            build_minlabel_blocks,
        )
        from web_search_pagerank_project_spark.operators.graph_build import (
            load_graph,
        )

        graph = load_graph(spark, stage_dir, num_partitions=parts)
        # AQE off for ALL kernels: the plans are statically partitioned
        # and fixed-shape, so per-exchange re-planning is pure driver
        # latency. (Round 2 kept AQE on for the DataFrame kernel so its
        # SpMV join got a runtime-stats broadcast of the rank side; round
        # 3 removed that reliance on purpose — a driver-built broadcast
        # of the O(V) iterate is serial in V and cannot scale, so the
        # kernel now pins SHUFFLE_HASH joins that the static planner
        # honors without stats. See pagerank.py module doc.)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        out = {"cores": cores, "edges": edges, "verts": verts,
               "blocks": blocks_k}
        if mode == "pr":
            blocks = build_csr_blocks(graph, blocks_k)
            pagerank_csr(
                graph, max_iterations=1, epsilon=0.0, blocks=blocks,
            )  # warmup
            # min-of-REPEATS: the host is a VM; single local[N] runs jitter
            # by 2x run-to-run, and min is the standard noise-robust
            # statistic for a fixed-work benchmark
            jt0, js0 = _steal_sample(cores)
            pr_wall = float("inf")
            for _ in range(SCALE_REPEATS):
                t0 = time.monotonic()
                res = pagerank_csr(
                    graph, max_iterations=SCALE_ITERS, epsilon=1e-6,
                    blocks=blocks, iters_per_action=SCALE_IPA,
                )
                pr_wall = min(pr_wall, time.monotonic() - t0)
            # DataFrame kernel (semantic-primary path)
            pagerank(graph, max_iterations=1, epsilon=0.0)  # warmup
            prdf_wall = float("inf")
            for _ in range(SCALE_REPEATS):
                t0 = time.monotonic()
                res_df = pagerank(
                    graph, max_iterations=SCALE_ITERS, epsilon=1e-6,
                    iters_per_action=SCALE_IPA,
                )
                prdf_wall = min(prdf_wall, time.monotonic() - t0)
            jt1, js1 = _steal_sample(cores)
            out["steal_pct"] = round(100.0 * (js1 - js0) / max(1, jt1 - jt0), 3)
            out.update({
                "pr_wall": pr_wall,
                "pr_iters": res.iterations,
                "iters_per_hour": res.iterations / pr_wall * 3600,
                "edges_per_sec": res.iterations * edges / pr_wall,
                "prdf_wall": prdf_wall,
                "prdf_iters_per_hour": res_df.iterations / prdf_wall * 3600,
            })
            blocks.unpersist()
        elif mode == "cc":
            # CC: fixed DENSE min-label rounds (frontier=False: every round
            # sends every label, so a fixed round count is fixed WORK —
            # frontier volume depends on where the particular graph
            # converges) over pre-staged symmetric edges; the block build
            # is untimed setup (same discipline as the staged graph
            # build). CC uses its OWN block count, FIXED across levels
            # (default 16): min-label's per-destination fan-in is one
            # min-array per source block, so its dense-round shuffle
            # volume is min(K*V, ~E) — growing K with the level multiplies
            # per-core volume until K*V saturates at E. The 10^12-edge
            # target regime is edge-saturated for any practical K
            # (per-core volume E/cores = constant); fixed K mirrors that
            # constant-fan-in property at test scale.
            sym = spark.read.parquet(f"{stage_dir}/sym_edges")
            cc_blocks = build_minlabel_blocks(
                graph, cc_blocks_k, symmetric_edges=sym
            )
            connected_components_csr(
                graph, max_rounds=1, blocks=cc_blocks, raise_on_cap=False,
                frontier=False,
            )  # warmup
            jt0, js0 = _steal_sample(cores)
            cc_wall = float("inf")
            for _ in range(SCALE_REPEATS):
                t0 = time.monotonic()
                # rounds_per_action=1 (round-4 task-count probe): the fused
                # CC batch recomputes through its double-consumer DAG at
                # scale — 355 tasks vs 164 for the same 6 rounds, ~2x wall
                # and ~2.5x python CPU — while per-round actions compute
                # each round exactly once. (PR's fused batches do NOT
                # inflate tasks; this is CC-specific.)
                connected_components_csr(
                    graph,
                    max_rounds=SCALE_CC_ROUNDS,
                    blocks=cc_blocks,
                    rounds_per_action=1,
                    raise_on_cap=False,
                    frontier=False,
                ).count()
                cc_wall = min(cc_wall, time.monotonic() - t0)
            jt1, js1 = _steal_sample(cores)
            out["steal_pct"] = round(100.0 * (js1 - js0) / max(1, jt1 - jt0), 3)
            out["cc_wall"] = cc_wall
        else:
            raise ValueError(f"unknown scale mode {mode!r}")
        print(json.dumps(out))
        graph.unpersist()
    finally:
        spark.stop()


def _settle_box(max_wait_s: float = 180.0) -> dict:
    """Per-SESSION analogue of the collection-start idle guard: wait (up
    to max_wait_s) until the 1-min load is < 1.0 and dirty writeback has
    drained, so every pinned session starts from a comparable box state.

    Why: the big level runs mid-collection, right after ~10 min of
    full-tilt strong-lo work, while weak-lo runs last — the weak ratio
    compared sessions taken in systematically DIFFERENT box states, and
    the big level's CC is where the ~35 s "slow mode" kept appearing
    (BENCH/scaling_history.json collections 5/8/9; steal <0.2%, so not a
    neighbor — a draining/hot box state the start-of-collection guard
    never saw because it only ran once). The wait is capped, and what was
    observed (load at session start, seconds waited) is recorded in the
    session row for audit rather than silently trusted."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < max_wait_s:
        load1 = os.getloadavg()[0]
        dirty_kb = 0
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(("Dirty:", "Writeback:")):
                    dirty_kb += int(line.split()[1])
        if load1 < 1.0 and dirty_kb < 262_144:  # 256 MB
            break
        time.sleep(5.0)
    return {
        "settle_wait_s": round(time.monotonic() - t0, 1),
        "load1_at_start": round(os.getloadavg()[0], 2),
    }


def _run_one_pinned_session(
    cores: int, edges: int, verts: int, blocks_k: int, cc_blocks_k: int,
    mode: str,
) -> dict:
    import shutil
    import subprocess

    settle = _settle_box()
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--scale-level", str(cores), str(edges), str(verts), str(blocks_k),
        str(cc_blocks_k), mode,
    ]
    if shutil.which("taskset") is not None:
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    else:
        print("WARNING: taskset unavailable; core budgets are task slots only",
              file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not line:
        sys.stderr.write(proc.stderr[-2000:])
        raise RuntimeError(
            f"scale level cores={cores} edges={edges} mode={mode} failed"
        )
    out = json.loads(line[-1])
    out.update(settle)
    return out


def _sessions_with_steal_retry(run, n: int = SCALE_SESSIONS) -> list[dict]:
    """Run ``n`` fresh sessions; a session whose timed section
    measured more than STEAL_RETRY_PCT hypervisor steal on its pinned
    cores gets ONE replacement (at most one per call). A stolen session
    is an exclusivity violation — the mid-run analogue of the
    collection-start load guard — and with only 2 sessions per level a
    single noisy-neighbor window otherwise corrupts the min of every
    kernel it brackets. The stolen session's numbers are KEPT in the
    returned list (never drop data; min() ignores them anyway since
    steal only slows a run)."""
    sessions, retried = [], False
    for _ in range(n):
        r = run()
        if not retried and r.get("steal_pct", 0.0) > STEAL_RETRY_PCT:
            retried = True
            print(
                f"session steal {r['steal_pct']:.2f}% > {STEAL_RETRY_PCT}%:"
                " flagged stolen; taking one replacement session",
                file=sys.stderr,
            )
            sessions.append(r)
            r = run()
        sessions.append(r)
    return sessions


def _run_pinned_level(
    cores: int, edges: int, verts: int, blocks_k: int, cc_blocks_k: int
) -> dict:
    """min across SCALE_SESSIONS fresh JVM sessions of the per-session
    min-of-repeats, with PageRank and CC in SEPARATE processes (see
    scale_level_run: an in-session predecessor's heap history taxed the
    4N level's CC by ~2x). Within one session repeats spread only ~4%,
    but two sessions of identical work measured 23% apart (JVM heap
    placement / JIT-profile luck is decided once per process) —
    min-of-sessions extends the same noise-robust statistic one
    granularity up. Each session reports the hypervisor steal its timed
    section saw (recorded in the collection for audit); heavily stolen
    sessions get one replacement via _sessions_with_steal_retry."""
    pr_sessions = _sessions_with_steal_retry(
        lambda: _run_one_pinned_session(
            cores, edges, verts, blocks_k, cc_blocks_k, "pr"
        )
    )
    out = dict(pr_sessions[0])
    for r in pr_sessions[1:]:
        if r["pr_wall"] < out["pr_wall"]:
            for key in ("pr_wall", "iters_per_hour", "edges_per_sec"):
                out[key] = r[key]
        if r["prdf_wall"] < out["prdf_wall"]:
            out["prdf_wall"] = r["prdf_wall"]
            out["prdf_iters_per_hour"] = r["prdf_iters_per_hour"]
    out["pr_steal_pcts"] = [r.get("steal_pct") for r in pr_sessions]
    out["pr_settle_waits"] = [r.get("settle_wait_s") for r in pr_sessions]
    out.pop("steal_pct", None)
    cc_sessions = _sessions_with_steal_retry(
        lambda: _run_one_pinned_session(
            cores, edges, verts, blocks_k, cc_blocks_k, "cc"
        ),
        n=SCALE_CC_SESSIONS,
    )
    out["cc_wall"] = min(r["cc_wall"] for r in cc_sessions)
    out["cc_walls"] = [round(r["cc_wall"], 2) for r in cc_sessions]
    out["cc_steal_pcts"] = [r.get("steal_pct") for r in cc_sessions]
    out["cc_settle_waits"] = [r.get("settle_wait_s") for r in cc_sessions]
    return out


def scaling_run() -> None:
    """Two-cluster-size scaling evidence -> BENCH/BASELINE.md + history.

    Two complementary protocols, both CPU-affinity-pinned (taskset) so the
    JVM's threads AND every forked python worker are bounded by exactly the
    level's core budget (task slots alone do NOT bound cores: Spark's
    python runner pipelines the Arrow writer thread, the worker process and
    the reader concurrently, so an unpinned local[N] burns ~2-3N cores).

    STRONG scaling: the SAME 240M-edge graph at N vs 4N pinned cores,
    efficiency = (T_N / T_4N) / 4. On this one box the measurement is
    bus-capped (a pure Arrow-transfer microbench of the kernel's own input
    tops out at 0.79 for 2->8) and each run pays a flat per-stage driver
    latency F ~= 11 s, so strong efficiency under-reports what an
    executor-scaled cluster would see.

    WEAK scaling: fixed per-core work — N cores on E edges vs 4N cores on
    4E edges (per-core edges, per-core blocks and per-core shuffle
    partitions all constant), efficiency = T_N(E) / T_4N(4E). This measures
    the design property the north_rule's two-cluster-size criterion is
    after — per-iteration volume scales with the partition, not the graph —
    without multiplying the one resource a single box cannot multiply (its
    memory bus), and both levels pay the same fixed driver latency F once.

    Every collection appends to BENCH/scaling_history.json; the markdown
    consistency table and the acceptance verdict are re-rendered from the
    full history, so regeneration preserves prior (including non-passing)
    results instead of overwriting them.
    """
    os.environ.setdefault("WSPR_DRIVER_MEM", "48g")

    # Exclusivity guard: a collection taken while anything else computes on
    # the box is not a scaling measurement (the 2026-08-18T11:07 history row
    # is one — big-level PR 18.2 s vs 12.4-13.5 s in the quiet collections).
    # Refuse to start unless the 1-min load average says the box is idle;
    # WSPR_SCALING_FORCE=1 overrides for deliberately-loaded experiments.
    load1 = os.getloadavg()[0]
    if load1 > 1.0 and os.environ.get("WSPR_SCALING_FORCE", "0") != "1":
        sys.exit(
            f"scaling collection refused: 1-min load {load1:.2f} > 1.0 — "
            "the box is not idle; rerun when quiet or set WSPR_SCALING_FORCE=1"
        )

    lo, hi = SCALE_N, 4 * SCALE_N
    big_blocks = SCALE_BLOCKS
    weak_edges, weak_verts = SCALE_EDGES // 4, SCALE_VERTS // 4
    weak_blocks = max(4, big_blocks // 4)

    ensure_staged(SCALE_EDGES, SCALE_VERTS)
    ensure_staged(weak_edges, weak_verts)

    # three pinned subprocesses; the hi-core/full-size run serves as both
    # the strong-scaling numerator and the weak-scaling big level
    strong_lo = _run_pinned_level(
        lo, SCALE_EDGES, SCALE_VERTS, big_blocks, SCALE_CC_BLOCKS
    )
    big = _run_pinned_level(
        hi, SCALE_EDGES, SCALE_VERTS, big_blocks, SCALE_CC_BLOCKS
    )
    weak_lo = _run_pinned_level(
        lo, weak_edges, weak_verts, weak_blocks, SCALE_CC_BLOCKS
    )

    strong = {
        k: (strong_lo[w] / big[w]) / (hi / lo)
        for k, w in (("pr_csr", "pr_wall"), ("pr_df", "prdf_wall"), ("cc", "cc_wall"))
    }
    weak = {
        k: weak_lo[w] / big[w]
        for k, w in (("pr_csr", "pr_wall"), ("pr_df", "prdf_wall"), ("cc", "cc_wall"))
    }

    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "levels": [lo, hi],
        "strong": strong,
        "weak": weak,
        "runs": {"strong_lo": strong_lo, "big": big, "weak_lo": weak_lo},
        "params": {
            "edges": SCALE_EDGES, "verts": SCALE_VERTS,
            "weak_edges": weak_edges, "weak_verts": weak_verts,
            "iters": SCALE_ITERS, "cc_rounds": SCALE_CC_ROUNDS,
            "repeats": SCALE_REPEATS, "ipa": SCALE_IPA,
            "blocks": big_blocks, "weak_blocks": weak_blocks,
            "cc_blocks": SCALE_CC_BLOCKS, "sessions": SCALE_SESSIONS,
            "cc_sessions": SCALE_CC_SESSIONS, "session_settle": True,
            "cc_dense_rounds": True, "cc_own_process": True,
            # round-4 kernel fixes: bounded (chunked) min-label block rows
            # + eager intermediate lineage cuts in fused batches — these
            # change what a wall measures, so they key the acceptance pool
            "kernel_rev": "r4-chunked",
            "steal_retry_pct": STEAL_RETRY_PCT,
        },
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.json")
    history = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            history = json.load(f)
    history.append(record)
    with open(hist_path, "w") as f:
        json.dump(history, f, indent=1)

    _render_scaling_md(history)
    print(json.dumps({
        "weak_efficiency": weak, "strong_efficiency": strong,
        "levels": [lo, hi], "record": record,
    }))


def _verdict(effs: dict[str, float], n: int = 1) -> str:
    vals = ", ".join(f"{k}={v:.3f}" for k, v in effs.items())
    met = "met" if min(effs.values()) >= 0.8 else "NOT met"
    tag = f"median of {n} collections" if n > 1 else "single collection"
    return f"**{met}** ({tag}: {vals})"


def _protocol_collections(history: list[dict]) -> list[dict]:
    """Collections comparable under the CURRENT measurement protocol.

    The per-kernel-process + dense-CC-rounds protocol (round 4) changed what
    a CC number MEANS (earlier collections measured a GC-polluted JVM and
    data-dependent frontier work), so the acceptance statistic only pools
    records taken under it. Late round 4 changed the KERNEL itself (chunked
    min-label block rows after the mmap/TLB-shootdown diagnosis + eager
    intermediate cuts in fused batches, see PLANS.md §5d), which again
    changed what a wall measures — the pool is therefore keyed on
    kernel_rev as well. Every record stays in the history table either
    way — the filter picks what is averaged, never what is shown.
    """
    return [
        h for h in history
        if h.get("params", {}).get("cc_own_process")
        and h.get("params", {}).get("cc_dense_rounds")
        and h.get("params", {}).get("kernel_rev") == "r4-chunked"
        # guard against small-parameter experiment runs (env-overridden
        # WSPR_SCALE_*) silently joining the acceptance pool
        and h.get("params", {}).get("edges") == SCALE_EDGES
        and h.get("params", {}).get("verts") == SCALE_VERTS
    ]


def _median_effs(colls: list[dict], proto: str) -> dict[str, float]:
    import statistics

    return {
        k: statistics.median(h[proto][k] for h in colls)
        for k in ("pr_csr", "pr_df", "cc")
    }


def _render_scaling_md(history: list[dict]) -> None:
    rec = history[-1]
    lo, hi = rec["levels"]
    p = rec["params"]
    runs = rec["runs"]
    strong, weak = rec["strong"], rec["weak"]

    # CC-shape bus probe (tools/bus_weak_probe.py --both), committed as
    # BENCH/bus_probe_cc.json. The probe runs the CC kernel's inner loop
    # (gather of an int64 label table + minimum.reduceat over the edge
    # stream) in P bare pinned processes — no Spark, no shuffle, no
    # Python-worker protocol — so its weak efficiency is what the
    # HARDWARE alone does for that traffic shape. Measured on a quiet
    # host: ~1.0 (the per-core label table is cache-resident and the
    # stream does not saturate the bus), i.e. the hardware imposes NO
    # weak ceiling on CC — unlike the PR kernel's Arrow-transfer shape
    # (0.79). The CC spread across collections is therefore
    # session-level variance, which the median estimator absorbs.
    probe_path = os.path.join(REPO, "BENCH", "bus_probe_cc.json")
    cc_probe = None
    if os.path.exists(probe_path):
        with open(probe_path) as f:
            cc_probe = json.load(f)
    cc_ceiling_note = ""
    if cc_probe:
        cc_ceiling_note = (
            f"- the CC kernel's own traffic shape ({cc_probe['shape']}) "
            f"weak-scales at **{cc_probe['weak_efficiency']:.2f}** on bare "
            f"pinned processes (T_2={cc_probe['wall_p2']:.2f}s vs "
            f"T_8={cc_probe['wall_p8']:.2f}s, min-of-3 per level, "
            "quiet host; tools/bus_weak_probe.py --both, "
            "BENCH/bus_probe_cc.json) — the per-core label table "
            "(2 MB) stays cache-resident and the edge stream does not "
            "saturate the bus at 8 cores, so the HARDWARE imposes no "
            "weak-scaling ceiling on CC-shaped work (contrast the PR "
            "kernel's Arrow-transfer shape at 0.79). With the hardware "
            "and the kernel design both flat across levels, the CC "
            "spread seen across collections (0.56-1.05) is session-level "
            "variance — JVM heap placement/GC decided once per process, "
            "shared-VM neighbors — which is exactly what the "
            "pre-declared cross-collection median absorbs;\n"
        )

    def row(tag, r):
        return (
            f"| {tag} | local[{r['cores']}] | {r['edges']:,} | {r['blocks']} "
            f"| {r['pr_wall']:.1f} | {r['iters_per_hour']:.0f} "
            f"| {r['edges_per_sec']:.3e} | {r['prdf_wall']:.1f} "
            f"| {r['cc_wall']:.1f} |"
        )

    def _hrow(h):
        def three(d):
            if not d:
                return "— | — | —"
            return f"{d['pr_csr']:.3f} | {d['pr_df']:.3f} | {d['cc']:.3f}"

        return f"| {h['ts']} | {three(h.get('strong'))} | {three(h.get('weak'))} |"

    hist_rows = "\n".join(_hrow(h) for h in history)

    proto = _protocol_collections(history)
    med_weak = _median_effs(proto, "weak")
    med_strong = _median_effs(proto, "strong")
    n_proto = len(proto)

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Sandbox protocol (BASELINE.md §scaling): no multi-node cluster exists
here, so the north_rule's N -> 4N executor criterion is evidenced with
CPU-AFFINITY-PINNED core budgets: each level runs in its own process under
`taskset -c 0-(N-1)` with Spark master local[N], so the JVM's threads AND
every forked python worker are bounded by exactly N (resp. 4N) physical
cores. (Task slots alone do not bound cores for this workload: Spark's
python runner pipelines the Arrow writer thread, the python worker
process, and the reader concurrently, so an unpinned local[N] burns
~2-3N cores — unpinned local[1] "ran" 6x240M edge traversals in 39 s,
which one core cannot do. Affinity is what makes the levels honest.)

Two protocols, both reported:

- **STRONG**: same {p['edges']:,}-edge graph at local[{lo}] vs
  local[{hi}]; efficiency = (T_{lo} / T_{hi}) / {hi // lo}. Bus-capped on
  this box (see decomposition below).
- **WEAK (fixed per-core work)**: local[{lo}] on {p['weak_edges']:,}
  edges vs local[{hi}] on {p['edges']:,} edges — per-core edge count
  ({p['weak_edges'] // lo:,}), per-core CSR blocks
  ({p['weak_blocks'] // lo}) and per-core shuffle partitions (2) all
  constant; efficiency = T_{lo}(E) / T_{hi}(4E). This is the protocol that
  matches what an executor-scaled cluster experiences: adding executors
  adds memory buses, python workers and heaps along with the data, and the
  per-stage driver latency F is paid once by both levels.

Input: synthetic power-law web graphs, seed=42, zipf(1.5) hubs.
PageRank: both kernels, alpha=0.85, {p['iters']} iterations x
{p['repeats']} repeats after 1 warmup, min wall taken (fixed cap =>
identical work per level; min defeats VM jitter; the min is also taken
across {p.get('sessions', 1)} fresh JVM sessions per level — identical
work in two sessions measured 23% apart, JVM heap-placement/JIT luck
being decided once per process); the CSR kernel fuses
{p['ipa']} iterations per Spark action (identical numerics, driver
latency amortized). CC: {p['cc_rounds']} DENSE min-label rounds (fixed;
frontier masking disabled for the scaled metric — dense-round volume is
a pure function of (K, V, E), so a fixed round count is fixed WORK at
every level, where frontier volume depends on where the particular
input graph happens to converge) over the CSR min-label kernel, one
action per round (fused CC batches recompute through the round's
double-consumer DAG at scale — 2.2x tasks, ~2x wall; task-count probe,
PLANS.md §5d), x {p['repeats']} repeats min; symmetrized edges
and block packing are staged setup, not the scaled metric (same
discipline as the graph build itself). CC runs in its OWN pinned
process, separate from the PageRank measurements: a JVM whose heap had
hosted the 4N level's PR working set still ran CC ~2x slower after
unpersist + System.gc (24.2 s vs 12.7 s fresh at 240M edges, round-4
probe) — a GC/fragmentation tax that grows with the level and therefore
poisons a scaling ratio (the round-2/3 weak-CC numbers, 0.39-1.03 noisy
and 0.51 committed, were this artifact). CC
blocks are FIXED at {p.get('cc_blocks', p['blocks'])} for BOTH levels:
min-label's per-destination fan-in is one min-array per source block, so
its dense-round volume is min(K*V, ~E) — growing K with the level
multiplies per-core volume until K*V saturates at E. The 10^12-edge
target regime is edge-saturated for any practical K (per-core volume
E/cores = constant); fixed K mirrors that constant-fan-in property at
test scale (measured: level-scaled K 20->80 weak-scales 0.71, fixed K=16
0.97, with a faster absolute high level).

| run | level | edges | blocks | PR-CSR wall (s) | PR-CSR iters/hour | edge-traversals/s | PR-DF wall (s) | CC wall (s) |
|---|---|---|---|---|---|---|---|---|
{row('strong-lo', runs['strong_lo'])}
{row('strong-hi / weak-hi', runs['big'])}
{row('weak-lo', runs['weak_lo'])}

STRONG efficiency: PR-CSR **{strong['pr_csr']:.3f}**, PR-DF
**{strong['pr_df']:.3f}**, CC **{strong['cc']:.3f}**
WEAK efficiency:   PR-CSR **{weak['pr_csr']:.3f}**, PR-DF
**{weak['pr_df']:.3f}**, CC **{weak['cc']:.3f}**

Acceptance (north_rule >= 0.8). The statistic is the MEDIAN over every
collection taken under the current protocol AND kernel revision
(kernel_rev=r4-chunked: bounded min-label block rows + per-round
actions, after the mmap/TLB-shootdown diagnosis in PLANS.md §5d turned
the big level's 120-240 MB Arrow cells into pooled 8 MB chunks; earlier
collections measured a different artifact — first GC-polluted JVMs and
data-dependent frontier work, then the unchunked kernel whose big-level
walls were 1.7-3.5x these — and are shown in the history table but not
pooled). A single collection on this shared VM
moves +/-0.06-0.08 run-to-run (visible in the table below); the median is
the pre-declared robust estimator and is recomputed symmetrically every
run — it can move DOWN as easily as up, and no collection is ever
dropped from the history. Since round 4 each session also MEASURES the
hypervisor steal its timed section saw on its pinned cores (/proc/stat
deltas, recorded per session in the history as pr/cc_steal_pcts): steal
is the one exclusivity violation the collection-start load guard cannot
see — it arrives mid-run, lasts minutes, and inflates every repeat of a
min-of-N equally (a round-4 probe caught a 13% steal window; dedicated
back-to-back big-level CC runs spread 18.7-22.9 s while two full
collections recorded 29 s as the min of six measurements). A session
whose steal exceeds {STEAL_RETRY_PCT:.1f}% is kept in the record but
gets one replacement session, so a single noisy-neighbor window can no
longer corrupt both sessions of a level. Two further hardenings (late
round 4): (1) every pinned session now starts behind a SETTLE GATE
(wait, capped at 180 s, until 1-min load < 1.0 and dirty writeback has
drained) — the big level used to launch mid-collection right after
~10 min of full-tilt strong-lo work while weak-lo launched last, so the
weak ratio compared sessions taken in systematically different box
states, which is where the big-level CC "slow mode" (~1.7x, steal
<0.2%) kept appearing; per-session waits and start loads are recorded
in the history. (2) CC takes {SCALE_CC_SESSIONS} fresh sessions per
level (PR stays at {p.get('sessions', 2)}): the slow mode hits a whole
session at a time, and with p~0.3 a min-of-2 is corrupted ~9% of
collections (observed 1 of 9) vs ~3% for min-of-3; all per-session CC
walls are recorded (cc_walls), so the mode stays visible in the data
rather than being silently dropped:
- weak (fixed per-core work): {_verdict(med_weak, n_proto)}
- strong (single shared bus): {_verdict(med_strong, n_proto)}
- latest collection alone: weak {_verdict(weak)}; strong {_verdict(strong)}
{(f"- CC, read against hardware: the bare-metal bus probe of CC's own "
  f"access pattern weak-scales at {cc_probe['weak_efficiency']:.2f} "
  f"(decomposition below) — the hardware imposes NO ceiling on this "
  f"shape. Round 4 found and removed the actual ceiling: the old "
  f"bimodal 'slow mode' was kernel page-fault/TLB-shootdown churn from "
  f"120-240 MB unpooled Arrow cells (per-thread attribution: 190-240 s "
  f"stime vs ~22 s utime per 6 rounds; PLANS.md §5d), fixed by chunked "
  f"block rows — big-level CC fell from 4.1-8.9 s/round to "
  f"1.1-1.6 s/round, on top of the lo level; the pooled median reads "
  f"{med_weak['cc']:.3f}." ) if cc_probe else ""}

Both kernels compute bit-comparable scores (tests pin them at 1e-12);
their relative wall times at a given level depend on where the machine
bottlenecks (the CSR kernel trades shuffle volume for Arrow+numpy memory
traffic), so both are reported.

Consistency across collections (full history, re-rendered every run from
BENCH/scaling_history.json — regeneration cannot overwrite a non-passing
result):

| collection (ts) | strong PR-CSR | strong PR-DF | strong CC | weak PR-CSR | weak PR-DF | weak CC |
|---|---|---|---|---|---|---|
{hist_rows}

Where the ceilings on THIS box come from (decomposed with
microbenchmarks, rounds 2 and 4):
{cc_ceiling_note}- pure Arrow transfer of the block arrays (the kernel's dominant parallel
  work) scales at 0.79 for 2->8 pinned cores and 0.83 for 1->4 — the VM's
  shared memory bus caps ANY memory-bound kernel below ~0.8 before the
  algorithm is even involved;
- fitting T(p) = F + W/p to pinned levels gives parallel work W ~= 53
  core-s per 6-iteration run against a flat F ~= 11 s of per-stage
  latency (driver stage dispatch, python-runner task protocol, barrier
  skew) — F is a property of the single shared local-mode driver, paid
  per stage regardless of data size;
- alternatives measured and rejected: tmpfs shuffle dirs (no change — the
  page cache already absorbs shuffle I/O), executor-process scaling via
  local-cluster[N,4] (cross-executor netty shuffle on one host measures
  0.37), coarse K (stragglers).
The weak protocol is immune to both confounds by construction — the
{hi // lo}x level moves {hi // lo}x the bytes with {hi // lo}x the
nominal bus share, and F appears once on each side of the ratio — which
is exactly why it is the honest single-box stand-in for executor scaling.
The design properties that carry a real cluster are structural and
plan-verified (PLANS.md §5): edges partitioned once by src block and
never re-shuffled; per-iteration shuffle volume is O(distinct dsts per
block) packed contribution arrays, not edges; a mega-hub receives at most
one partial per block (built-in salting); ZERO per-iteration driver
round-trips (the teleport scalar rides the contribution shuffle; only the
once-per-action residual reaches the driver).
""")


def _regressions_vs_last_round(timings: dict, detail: dict) -> dict:
    """Cross-round regression guard (VERDICT r4 item 8): compare this run's
    per-query walls — headline AND graph_ops detail — against the newest
    committed BENCH_r*.json at the SAME sf, and record anything >1.5x
    slower into the artifact itself, so a silent regression of an op that
    is not in the headline total still surfaces in the committed JSON.
    Advisory (host noise exists); the scaling protocol is the arbiter."""
    import glob

    cands = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    for path in reversed(cands):
        try:
            with open(path) as f:
                ref = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if abs(float(ref.get("sf", -1)) - SF) > 1e-12:
            continue
        out = {}
        ref_q = dict(ref.get("queries", {}))
        ref_q.update(ref.get("detail", {}).get("graph_ops", {}))
        cur_q = dict(timings)
        cur_q.update(detail.get("graph_ops", {}))
        for k, prev_w in ref_q.items():
            cur_w = cur_q.get(k)
            if (
                isinstance(prev_w, (int, float))
                and isinstance(cur_w, (int, float))
                and prev_w > 0.2  # sub-200ms walls are pure jitter
                and cur_w > 1.5 * prev_w
            ):
                out[k] = {"prev": prev_w, "cur": cur_w, "vs": os.path.basename(path)}
        return out
    return {}


def main() -> None:
    if "--scale-level" in sys.argv:
        i = sys.argv.index("--scale-level")
        scale_level_run(
            int(sys.argv[i + 1]), int(sys.argv[i + 2]),
            int(sys.argv[i + 3]), int(sys.argv[i + 4]),
            int(sys.argv[i + 5]),
            sys.argv[i + 6] if len(sys.argv) > i + 6 else "pr",
        )
        return
    if "--scaling" in sys.argv:
        scaling_run()
        return
    spark = make_spark(f"local[{CPUS}]", int(CPUS) * 2)
    try:
        timings, detail, total = run_benchmarks(spark)
        reg = _regressions_vs_last_round(timings, detail)
        if reg:
            detail["regressions_vs_last_round"] = reg
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": SF,
                    "detail": detail,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
