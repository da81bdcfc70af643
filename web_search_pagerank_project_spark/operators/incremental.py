"""Incremental graph snapshot maintenance — the Common-Crawl operating mode.

The reference rebuilds its graph from the full edge file every run
(/root/reference/pagerank.py:18-83 re-reads and re-encodes everything); at
the 10^12-document design point the input is append-mostly (monthly crawl
deltas over an Iceberg pages table), so rebuilding the dictionary and the
weighted edge table from scratch per snapshot is the scale anti-pattern.
This module patches a built graph with an edge delta in work proportional
to the DELTA, then lets PageRank warm-start from the previous converged
state (operators/pagerank.py ``x0``; durable via
operators/checkpoint.py::IterationCheckpointer):

  * dictionary-stable id assignment — existing urls keep their ids; new
    urls get dense ids starting at the old vertex count (one
    assign_dense_ids pass over the DELTA's new urls only);
  * multiplicity patch — the delta's per-pair link counts merge into the
    stored ``mult`` column by a sum over the union (build the base graph
    with ``build_graph(keep_mult=True)``; outdeg-normalized weights alone
    are not mergeable because the per-source scale 1/outdeg(src) changes
    whenever a source gains links);
  * weight refresh — only sources TOUCHED by the delta change outdeg, but
    the refresh is expressed over the merged table as the same
    one-exchange groupBy + window build_graph uses: the merge aggregation
    already paid the hash(src_id) shuffle, so the window adds no exchange.

Equivalence contract (tested + hash-checked by the driver oracle): the
updated graph's (src_url, dst_url, weight) table and vertex set are
IDENTICAL to ``build_graph(base_edges UNION ALL delta_edges)``'s — the
float64 weights bit-equal because both divide the same integer
multiplicities by the same integer out-degrees. Ids of NEW vertices differ
from a fresh build's (fresh sorts all urls globally; incremental appends) —
by design: id stability is the point. Operators whose ORACLE comparison
leans on "id order == url sort order" (CC min-label = min url, labelprop
tie-breaks) remain correct on the ids themselves but lose that url
correspondence on updated snapshots.

Warm-start convergence: the power iteration x' = alpha*(P^T x + v*(a.x)) +
(1-alpha)*v is an affine map with a unique fixed point, so warm and cold
starts converge to IDENTICAL scores; the iteration count is
log(d0/epsilon) contraction steps, so warm-starting saves
log(d0_cold / d0_warm) of them — where d0_warm is the delta-induced
fixed-point displacement. That saving is dramatic exactly in the target
regime (a monthly delta touching a tiny fraction of 10^12 sources:
d0_warm → 0 gives near-instant re-convergence, pinned by the same-graph
test) and honest-but-modest when a delta rewires a visible fraction of a
toy graph. One non-obvious requirement, handled by pagerank(x0=...): the
warm vector must be RESCALED to the iteration's invariant L1 mass —
the reference's cold init is mass-matched by construction, and an
unscaled previous-snapshot vector carries an O(Δn) mass error along the
slowest (alpha-decay) mode that otherwise DOMINATES the warm run
(measured: 109 warm vs 30 cold iterations before the correction; 29
after).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph_build import GraphTables, assign_dense_ids, drop_bad_urls

__all__ = ["update_graph"]


def update_graph(
    graph: GraphTables,
    edge_delta: DataFrame,
    num_partitions: int | None = None,
    cache: bool = True,
) -> GraphTables:
    """Patch a built graph with a (src, dst) url edge delta; returns a new
    GraphTables (the input graph is not mutated; its cached tables are left
    to the caller). Requires ``build_graph(keep_mult=True)`` input; the
    output keeps ``mult`` so updates chain. ``filter_ratio`` graphs are not
    updatable this way (the reference's threshold depends on global
    pre-filter in-degrees, which a delta shifts for every vertex): rebuild
    instead.
    """
    if "mult" not in graph.edges.columns:
        raise ValueError(
            "update_graph needs the raw multiplicities: build the base "
            "graph with build_graph(..., keep_mult=True)"
        )
    spark = graph.edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    clean = drop_bad_urls(edge_delta)
    if cache:
        clean = clean.persist()

    # new urls only — work is proportional to the delta, not the snapshot
    delta_urls = (
        clean.select(F.col("src").alias("url"))
        .unionAll(clean.select(F.col("dst").alias("url")))
        .distinct()
    )
    new_urls = delta_urls.join(
        graph.vertices.select("url").hint("shuffle_hash"), "url", "left_anti"
    )
    new_vertices, n_new = assign_dense_ids(
        new_urls,
        num_partitions=num_partitions,
        return_count=True,
        start_id=graph.n,
    )
    vertices = graph.vertices.select("id", "url").unionByName(
        new_vertices.select("id", "url")
    )
    if cache:
        vertices = vertices.persist()

    # encode the delta against the EXTENDED dictionary (AQE broadcasts it
    # when small; at scale these are the same two equi-joins a fresh build
    # pays, but over delta-sized input)
    e = (
        clean.join(vertices.withColumnRenamed("url", "src"), "src")
        .withColumnRenamed("id", "src_id")
        .join(vertices.withColumnRenamed("url", "dst"), "dst")
        .withColumnRenamed("id", "dst_id")
        .select("src_id", "dst_id")
    )
    delta_mult = e.groupBy("src_id", "dst_id").agg(
        F.count("*").cast("long").alias("mult")
    )

    # merge multiplicities, then refresh weights with build_graph's
    # one-exchange shape: hash by src_id once; the pair-merge groupBy and
    # the outdeg window both run on that partitioning
    w = Window.partitionBy("src_id")
    merged = (
        graph.edges.select("src_id", "dst_id", "mult")
        .unionByName(delta_mult)
        .repartition(num_partitions, "src_id")
        .groupBy("src_id", "dst_id")
        .agg(F.sum("mult").alias("mult"))
        .withColumn("outdeg", F.sum("mult").over(w))
        .select(
            "src_id",
            "dst_id",
            (F.col("mult").cast("double") / F.col("outdeg").cast("double")).alias(
                "weight"
            ),
            "mult",
        )
    )
    if cache:
        merged = merged.persist()
        merged.count()
        clean.unpersist()

    return GraphTables(vertices=vertices, edges=merged, n=graph.n + n_new)
