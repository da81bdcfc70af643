"""Weakly-connected components via iterative min-label hash propagation.

north_star operator X4 (SURVEY.md §2.3): label(v) <- min(label(v),
min_{u in N(v)} label(u)) over the symmetrized edge set, iterated to a fixed
point. Labels are the dense vertex ids, and because ``build_graph`` assigns
ids in url sort order, the converged numeric min-label of a component is the
id of its lexicographically smallest url — which is exactly the oracle
contract (tests/oracle.py::connected_components_oracle).

Scale notes:
  * the symmetrized edge table is persisted hashed by ``src_id`` once; each
    iteration shuffles only the label vector (same co-partitioning discipline
    as PageRank).
  * convergence = zero labels changed, computed in the same action that
    materializes the new labels (sum of change indicators) — one job per
    iteration.
  * iteration count is O(component diameter); web graphs have small diameter.
    For adversarial long-path graphs the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce") halves
    rounds; hook left for a future round.
  * ``localCheckpoint`` per iteration truncates plan/lineage growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_build import GraphTables
from .lineage import cut_lineage


def _symmetrized(graph: GraphTables, num_partitions: int) -> DataFrame:
    e = graph.edges.select("src_id", "dst_id")
    sym = (
        e.unionAll(e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")))
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
        .repartition(num_partitions, "src_id")
        .persist()
    )
    sym.count()
    return sym


def connected_components(
    graph: GraphTables,
    max_iterations: int = 100,
    verbose: bool = False,
    raise_on_cap: bool = True,
) -> DataFrame:
    """Returns (id: long, component: long) — component = min vertex id reachable
    (undirected). Converged exactly (fixed point), or raises if max_iterations
    is hit without convergence."""
    spark = graph.edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = _symmetrized(graph, num_partitions)

    labels = graph.vertices.select(
        "id", F.col("id").alias("label")
    ).transform(cut_lineage)

    converged = False
    for it in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.src_id == labels.id)
            .groupBy("dst_id")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst_id, "left")
            .select(
                labels.id.alias("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
            .transform(cut_lineage)
        )
        changed = (
            new_labels.agg(
                F.sum(F.when(F.col("_changed"), 1).otherwise(0)).alias("c")
            ).collect()[0]["c"]
            or 0
        )
        if verbose:
            print(f"cc iter={it} changed={changed}")
        labels = new_labels.select("id", "label")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged and raise_on_cap:
        raise RuntimeError(f"connected_components: no fixed point in {max_iterations} iters")
    return labels.withColumnRenamed("label", "component")


def component_sizes(components: DataFrame) -> DataFrame:
    """(component: long, size: long) sorted by size desc."""
    return (
        components.groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("component"))
    )
