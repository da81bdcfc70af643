#!/usr/bin/env python3
"""Print + grep the physical plan of one hyperball_centralities round
(PLANS.md §9 evidence): the register aggregation must show map-side
partial_max combines before its exchange, and the loop must contain no
BroadcastExchange of the O(V) frontier/register state (the pagerank
weak-scaling lesson — driver-built broadcasts serialize on V)."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from pyspark.sql import functions as F

    from web_search_pagerank_project_spark.operators import anf
    from web_search_pagerank_project_spark.operators.graph_build import build_graph
    from web_search_pagerank_project_spark.session import get_spark
    from web_search_pagerank_project_spark.sources.synth import synth_edges

    aqe = sys.argv[1] if len(sys.argv) > 1 else "false"
    spark = get_spark(
        app_name="hyperball-plan-probe", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": aqe},
    )
    edges_df = synth_edges(spark, n_vertices=2000, n_edges=20000, seed=42, zipf_a=1.5)
    graph = build_graph(edges_df, cache=True)
    m = 16
    rcols = [f"r{jj}" for jj in range(m)]

    # one round's plan, EXACTLY as hyperball_centralities builds it
    edges = (
        graph.edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .repartition(16, "src_id")
        .persist()
    )
    regs = (
        anf.hll_init_registers(graph.vertices, m)
        .withColumn("pe", anf._estimate(m))
        .withColumn("h", F.lit(0.0))
        .withColumn("sd", F.lit(0.0))
        .repartition(16, "id")
        .localCheckpoint(eager=True)
    )
    nbr = (
        edges.join(
            regs.withColumnRenamed("id", "src_id")
            .select("src_id", *rcols)
            .hint("shuffle_hash"),
            "src_id",
        )
        .groupBy(F.col("dst_id").alias("id"))
        .agg(*[F.max(c).alias(f"n_{c}") for c in rcols])
    )
    merged = (
        regs.join(nbr.hint("shuffle_hash"), "id", "left")
        .select(
            "id",
            *[
                F.greatest(F.col(c), F.coalesce(F.col(f"n_{c}"), F.lit(0))).alias(c)
                for c in rcols
            ],
            "pe", "h", "sd",
        )
        .withColumn("est", anf._estimate(m))
    )

    plan = merged._jdf.queryExecution().executedPlan().toString()
    print(plan[:4000])
    n_partial = plan.count("partial_max")
    print(f"\npartial_max occurrences: {n_partial}")
    assert n_partial >= m, "map-side partial_max combine missing from the round plan"
    # the only permitted Broadcast nodes are graph_build's dictionary
    # encode (tiny _pid/_off offset table, hinted by design, living in the
    # cached edge/vertex lineage) — NEVER the O(V) register/frontier state
    for line in plan.splitlines():
        if "BroadcastExchange" in line or "BroadcastHashJoin" in line:
            print("  bcast node:", line.strip()[:140])
            assert "r0" not in line and " id" not in line.split("[")[0], line
    bad = [
        ln
        for ln in plan.splitlines()
        if "Broadcast" in ln and ("r0#" in ln or "n_r0#" in ln)
    ]
    assert not bad, f"register state broadcast: {bad[:2]}"
    print("OK: map-side partial_max present; no broadcast of register/frontier state")
    spark.stop()


if __name__ == "__main__":
    main()
