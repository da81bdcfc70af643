"""Whole-graph structural metrics: reciprocity and degree histograms.

Round-4 breadth: the standard link-graph health numbers a crawl pipeline
reports next to PageRank — edge reciprocity (fraction of hyperlinks that
are mutual; Newman's definition over the deduplicated simple digraph) and
the degree distribution (the power-law shape check for synthetic/crawled
graphs). Both are single-pass Catalyst plans: one self-join semi-probe
resp. one two-level aggregation — no iteration, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_build import GraphTables

__all__ = ["reciprocity", "degree_histogram"]


def _simple_directed(graph: GraphTables) -> DataFrame:
    """Deduplicated directed edges without self-loops."""
    return (
        graph.edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )


def reciprocity(graph: GraphTables) -> float:
    """Fraction of directed edges whose reverse edge also exists, over the
    deduplicated self-loop-free digraph. 0.0 for an edgeless graph. The
    probe is a left-semi self-join on the (dst, src)-swapped table — both
    sides hash-partition on the same key pair, one shuffle each side."""
    e = _simple_directed(graph).persist()
    total = e.count()
    if total == 0:
        e.unpersist()
        return 0.0
    rev = e.select(
        F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
    )
    mutual = e.join(
        rev.hint("shuffle_hash"), ["src_id", "dst_id"], "left_semi"
    ).count()
    e.unpersist()
    return mutual / total


def degree_histogram(graph: GraphTables, direction: str = "out") -> DataFrame:
    """(degree: long, n_vertices: long) — how many vertices have each
    out-/in-/total-degree over the deduplicated simple digraph, including
    the degree-0 row (vertices with no edges in the chosen direction).

    Two aggregations, both with map-side partial combine; the second one's
    key cardinality is the number of DISTINCT degrees (O(sqrt(E)) for
    power-law graphs), so the result is driver-safe at any scale.
    """
    e = _simple_directed(graph)
    if direction == "out":
        ends = e.select(F.col("src_id").alias("id"))
    elif direction == "in":
        ends = e.select(F.col("dst_id").alias("id"))
    elif direction == "total":
        ends = e.select(F.col("src_id").alias("id")).unionAll(
            e.select(F.col("dst_id").alias("id"))
        )
    else:
        raise ValueError(f"direction must be out|in|total, got {direction!r}")
    deg = ends.groupBy("id").agg(F.count("*").alias("degree"))
    dense = (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select(F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
    )
    return dense.groupBy("degree").agg(F.count("*").alias("n_vertices"))
