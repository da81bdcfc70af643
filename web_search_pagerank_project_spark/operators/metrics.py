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

__all__ = ["reciprocity", "degree_histogram", "degree_assortativity"]


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


def degree_assortativity(
    graph: GraphTables, x: str = "out", y: str = "in"
) -> float:
    """Directed degree assortativity: the Pearson correlation, over the
    deduplicated self-loop-free edge set, between the x-degree of the
    source and the y-degree of the destination (Foster et al., PNAS 2010
    — the (out,in) variant is the standard web-graph report). Returns NaN
    for degenerate graphs (constant degree on either side).

    Plan shape: two degree aggregations (map-side combine), two
    shuffle-hash joins keyed on the edge endpoints, one F.corr aggregate —
    single pass, no Python, no driver iteration. The degree tables are
    O(V) and partition on the same keys the edge table already hashes on,
    so at 10^12 edges this is three shuffles total and the final aggregate
    is a scalar.
    """
    if x not in ("out", "in", "total") or y not in ("out", "in", "total"):
        raise ValueError(f"degree kinds must be out|in|total, got {x!r}/{y!r}")
    e = _simple_directed(graph)

    def deg(kind: str, alias: str) -> DataFrame:
        if kind == "out":
            ends = e.select(F.col("src_id").alias("id"))
        elif kind == "in":
            ends = e.select(F.col("dst_id").alias("id"))
        else:
            ends = e.select(F.col("src_id").alias("id")).unionAll(
                e.select(F.col("dst_id").alias("id"))
            )
        return ends.groupBy("id").agg(
            F.count("*").cast("double").alias(alias)
        )

    dx = deg(x, "deg_x").withColumnRenamed("id", "src_id")
    dy = deg(y, "deg_y").withColumnRenamed("id", "dst_id")
    # corr from its moments, divided driver-side: F.corr raises
    # DIVIDE_BY_ZERO under ANSI mode when either degree is constant
    # (regular graphs); the assortativity of such a graph is undefined -> NaN
    # LEFT joins: an endpoint can have zero x-/y-degree (e.g. a pure sink's
    # out-degree) and still sit on an edge — inner joins would drop the row
    row = (
        e.join(dx.hint("shuffle_hash"), "src_id", "left")
        .join(dy.hint("shuffle_hash"), "dst_id", "left")
        .select(
            F.coalesce(F.col("deg_x"), F.lit(0.0)).alias("deg_x"),
            F.coalesce(F.col("deg_y"), F.lit(0.0)).alias("deg_y"),
        )
        .agg(
            F.covar_pop("deg_x", "deg_y").alias("cov"),
            F.stddev_pop("deg_x").alias("sx"),
            F.stddev_pop("deg_y").alias("sy"),
        )
        .collect()[0]
    )
    if not row["sx"] or not row["sy"]:
        return float("nan")
    return float(row["cov"]) / (float(row["sx"]) * float(row["sy"]))
