"""Per-partition CSR block kernel for iterative PageRank (north_star X3).

The pure-DataFrame power method (operators/pagerank.py) re-joins the edge
table with the rank vector every iteration — semantically clean, but each
iteration pays row-level join + aggregation machinery for what is, per
partition, a sparse-matrix-vector multiply. This module materializes the
static graph as **per-partition CSR blocks** (numpy arrays boxed in DataFrame
rows) once, then runs each iteration as vectorized numpy over Arrow-packed
batches:

  block layout (static, built once, cached):
    edges are hash-partitioned by ``src_id % K`` into K blocks. Each block
    row stores, for its local edge set:
      src_pos   int32[nnz_b]   position of the edge's source in the block's
                               sorted local vertex-id list (gather index)
      dst_sort  int64[d_b]     the block's distinct dst ids, sorted by
                               (dst % K, dst) so contribution slices bound
                               for the same output block are contiguous
      dst_inv   int32[nnz_b]   index of each edge's dst into dst_sort
      weight    float64[nnz_b]
      out_ptr   int32[K+1]     slice boundaries of dst_sort per output block

  state layout (dynamic, K rows, localCheckpoint'ed per iteration):
    (block, xs: float64[n_b], res_sq: double, dang_sum: double)

  one iteration = one Spark action:
    1. pack:    state ⋈ static vertex block table (K-row broadcast join)
    2. SpMV:    per block, contrib = bincount(dst_inv, w * x[src_pos]) —
                a map-side combine: every (block, dst) contribution leaves
                the task already summed
    3. shuffle: K² *array* rows (block_out, dst_ids, contribs) — the only
                data movement; volume ≈ Σ_b d_b packed doubles, never raw
                edges
    4. merge:   cogroup by output block: x' = β·v + α·Σ contribs, plus the
                residual term and next iteration's dangling mass computed in
                the same pass
    5. agg:     sqrt(sum(res_sq)), sum(dang_sum) over K rows -> driver

  β for iteration t uses Σ x_t[dangling], which step 4 of iteration t-1
  already produced — so there is no extra dangling-mass job at all (the
  DataFrame path runs a semi-join aggregate for it every iteration).

Numeric semantics are identical to operators/pagerank.py (reference
ws_pagerank.py:121-178, float64): L2-normalized v, x0 = 1/sqrt(n), no
re-normalization, L2 residual stop. Tests cross-check CSR vs DataFrame vs
the NumPy oracle at 1e-12-level agreement on small graphs.

Scale notes: K defaults to ``spark.sql.shuffle.partitions``. At 10^12-edge
scale K grows with the cluster so each block's arrays stay ~100-500 MB
(nnz/K edges); block rows are Arrow-serialized, so executors never hold the
whole graph. A mega-hub dst collects at most one packed partial per block
(K rows total), which is exactly salted two-phase aggregation with salt =
source block — hub skew cannot concentrate on one reducer.
"""

from __future__ import annotations

import math
import time

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .graph_build import GraphTables, dangling_vertices
from .lineage import cut_lineage
from .pagerank import IterationMetrics, PageRankResult

_CSR_SCHEMA = StructType(
    [
        StructField("block", IntegerType()),
        StructField("src_pos", ArrayType(IntegerType())),
        StructField("dst_sort", ArrayType(LongType())),
        StructField("dst_inv", ArrayType(IntegerType())),
        StructField("weight", ArrayType(DoubleType())),
        StructField("out_ptr", ArrayType(IntegerType())),
    ]
)

_VERT_SCHEMA = StructType(
    [
        StructField("block", IntegerType()),
        StructField("ids", ArrayType(LongType())),
        StructField("v", ArrayType(DoubleType())),
        StructField("dang", ArrayType(IntegerType())),
    ]
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("block_out", IntegerType()),
        StructField("dst_ids", ArrayType(LongType())),
        StructField("contribs", ArrayType(DoubleType())),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("block", IntegerType()),
        StructField("xs", ArrayType(DoubleType())),
        StructField("res_sq", DoubleType()),
        StructField("dang_sum", DoubleType()),
    ]
)


def build_csr_blocks(graph: GraphTables, num_blocks: int) -> DataFrame:
    """Materialize the weighted edge table as K cached CSR block rows."""
    k = num_blocks

    def to_block(pdf: pd.DataFrame) -> pd.DataFrame:
        block = int(pdf["block"].iloc[0])
        src = pdf["src_id"].to_numpy(np.int64)
        dst = pdf["dst_id"].to_numpy(np.int64)
        w = pdf["weight"].to_numpy(np.float64)
        # local vertex universe of this block = all ids ≡ block (mod K) —
        # but we only need positions of *sources present here*; the packed
        # x arrays cover every id in the block, sorted, so searchsorted
        # against the sorted block id list is exact. That list is implicit:
        # ids ≡ block (mod K) sorted ascending -> position = (id - block)//K
        # ONLY if ids are dense 0..n-1. They are (dictionary encode), but n
        # may not divide evenly; position arithmetic stays exact regardless.
        src_pos = ((src - block) // k).astype(np.int32)
        # distinct dsts sorted by (out_block, dst) with slice boundaries
        dst_u = np.unique(dst)
        order = np.lexsort((dst_u, dst_u % k))
        dst_sort = dst_u[order]
        out_blocks = (dst_sort % k).astype(np.int64)
        out_ptr = np.searchsorted(out_blocks, np.arange(k + 1)).astype(np.int32)
        # inverse: edge dst -> index in dst_sort
        pos_in_sorted = np.searchsorted(dst_sort, dst)  # dst_sort not sorted by dst!
        # dst_sort is sorted by (mod, value); build a value-sorted view for
        # the inverse lookup then map through the permutation
        val_order = np.argsort(dst_sort, kind="stable")
        dst_valsorted = dst_sort[val_order]
        pos_in_valsorted = np.searchsorted(dst_valsorted, dst)
        dst_inv = val_order[pos_in_valsorted].astype(np.int32)
        return pd.DataFrame(
            {
                "block": [block],
                "src_pos": [src_pos],
                "dst_sort": [dst_sort],
                "dst_inv": [dst_inv],
                "weight": [w],
                "out_ptr": [out_ptr],
            }
        )

    blocks = (
        graph.edges.withColumn(
            "block", F.pmod(F.col("src_id"), F.lit(k)).cast("int")
        )
        .groupBy("block")
        .applyInPandas(to_block, _CSR_SCHEMA)
        .persist()
    )
    blocks.count()
    return blocks


def _pack_vertices(
    graph: GraphTables, v_df: DataFrame | None, num_blocks: int
) -> DataFrame:
    """(block, ids, v, dang) — static per-block vertex arrays; v already
    L2-normalized (the packing UDF receives the norm as a closure scalar)."""
    k = num_blocks
    n = graph.n
    dang = dangling_vertices(graph).withColumn("_d", F.lit(1))
    if v_df is None:
        base = graph.vertices.select(
            "id", F.lit(1.0 / n).cast("double").alias("vraw")
        )
    else:
        base = v_df.select("id", F.col("v").cast("double").alias("vraw"))
    norm = float(
        base.agg(F.sqrt(F.sum(F.col("vraw") * F.col("vraw")))).collect()[0][0]
    )
    rows = (
        base.join(dang, "id", "left")
        .select(
            "id",
            "vraw",
            F.coalesce(F.col("_d"), F.lit(0)).alias("dang"),
            F.pmod(F.col("id"), F.lit(k)).cast("int").alias("block"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        return pd.DataFrame(
            {
                "block": [int(pdf["block"].iloc[0])],
                "ids": [pdf["id"].to_numpy(np.int64)],
                "v": [pdf["vraw"].to_numpy(np.float64) / norm],
                "dang": [pdf["dang"].to_numpy(np.int32)],
            }
        )

    out = rows.groupBy("block").applyInPandas(pack, _VERT_SCHEMA).persist()
    out.count()
    return out


def pagerank_csr(
    graph: GraphTables,
    v: DataFrame | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
    num_blocks: int | None = None,
    checkpointer=None,
    checkpoint_every: int = 10,
    verbose: bool = False,
    blocks: DataFrame | None = None,
) -> PageRankResult:
    """Power method over per-partition CSR blocks; exact reference semantics.

    ``blocks`` may be passed in (from :func:`build_csr_blocks`) to amortize
    the one-time build across multiple runs (e.g. several personalization
    vectors over the same graph).
    """
    spark = graph.edges.sparkSession
    n = graph.n
    if n == 0:
        raise ValueError("empty graph")
    k = num_blocks or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    own_blocks = blocks is None
    if blocks is None:
        blocks = build_csr_blocks(graph, k)
    verts = _pack_vertices(graph, v, k)

    x0_val = 1.0 / math.sqrt(n)
    start_iter = 0
    state = None
    if checkpointer is not None:
        resumed = checkpointer.resume(spark)
        if resumed is not None:
            ranks_df, start_iter = resumed
            state = _state_from_ranks(ranks_df, verts, k)
    if state is None:
        state = verts.select(
            "block",
            F.transform("ids", lambda _: F.lit(x0_val)).alias("xs"),
            F.lit(0.0).alias("res_sq"),
            (
                F.aggregate(
                    "dang", F.lit(0.0), lambda acc, d: acc + d.cast("double")
                )
                * F.lit(x0_val)
            ).alias("dang_sum"),
        )
        state = cut_lineage(state)

    dang_total = float(state.agg(F.sum("dang_sum")).collect()[0][0])

    residuals: list[float] = []
    metrics: list[IterationMetrics] = []
    converged = False
    it = start_iter

    for it in range(start_iter, max_iterations):
        t0 = time.monotonic()
        beta = alpha * dang_total + (1.0 - alpha)

        def spmv(batches) -> "pd.DataFrame":
            for pdf in batches:
                yield _spmv_batch(pdf)

        def _spmv_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            out_blocks, out_dsts, out_contribs = [], [], []
            for _, row in pdf.iterrows():
                x = np.asarray(row["xs"], dtype=np.float64)
                src_pos = np.asarray(row["src_pos"], dtype=np.int32)
                dst_inv = np.asarray(row["dst_inv"], dtype=np.int32)
                w = np.asarray(row["weight"], dtype=np.float64)
                dst_sort = np.asarray(row["dst_sort"], dtype=np.int64)
                out_ptr = np.asarray(row["out_ptr"], dtype=np.int32)
                contrib = np.bincount(
                    dst_inv, weights=w * x[src_pos], minlength=len(dst_sort)
                )
                for ob in range(len(out_ptr) - 1):
                    s, e = out_ptr[ob], out_ptr[ob + 1]
                    if e > s:
                        out_blocks.append(ob)
                        out_dsts.append(dst_sort[s:e])
                        out_contribs.append(contrib[s:e])
            return pd.DataFrame(
                {
                    "block_out": pd.Series(out_blocks, dtype="int32"),
                    "dst_ids": out_dsts,
                    "contribs": out_contribs,
                }
            )

        partials = (
            blocks.join(state.select("block", "xs"), "block")
            .mapInPandas(spmv, _PARTIAL_SCHEMA)
        )

        b, a = float(beta), float(alpha)

        def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            ids = np.asarray(left["ids"].iloc[0], dtype=np.int64)
            vv = np.asarray(left["v"].iloc[0], dtype=np.float64)
            dang_mask = np.asarray(left["dang"].iloc[0], dtype=np.int32)
            x_old = np.asarray(left["xs"].iloc[0], dtype=np.float64)
            contrib = np.zeros(len(ids), dtype=np.float64)
            kk = int(key[0])
            for _, row in right.iterrows():
                dsts = np.asarray(row["dst_ids"], dtype=np.int64)
                cs = np.asarray(row["contribs"], dtype=np.float64)
                pos = np.searchsorted(ids, dsts)
                np.add.at(contrib, pos, cs)
            x_new = b * vv + a * contrib
            diff = x_new - x_old
            return pd.DataFrame(
                {
                    "block": [kk],
                    "xs": [x_new],
                    "res_sq": [float(diff @ diff)],
                    "dang_sum": [float(x_new[dang_mask == 1].sum())],
                }
            )

        packed = verts.join(state.select("block", "xs"), "block")
        # cut_lineage, NOT plain localCheckpoint: this plan has no Aggregate
        # to clamp estimated stats, so inherited sizeInBytes would square
        # every iteration (see operators/lineage.py). Lazy — the residual
        # aggregate below is the one action that materializes it.
        new_state = cut_lineage(
            packed.groupBy("block")
            .cogroup(partials.groupBy("block_out"))
            .applyInPandas(merge, _STATE_SCHEMA)
        )

        row = new_state.agg(
            F.sqrt(F.sum("res_sq")).alias("r"), F.sum("dang_sum").alias("d")
        ).collect()[0]
        residual, dang_total = float(row["r"]), float(row["d"])

        wall_ms = (time.monotonic() - t0) * 1000.0
        residuals.append(residual)
        metrics.append(IterationMetrics(it, residual, wall_ms))
        if verbose:
            print(f"i={it} residual={residual}")

        state = new_state
        if checkpointer is not None and (
            (it + 1) % checkpoint_every == 0 or residual < epsilon
        ):
            checkpointer.write(
                _ranks_from_state(state, verts),
                iteration=it + 1,
                meta={"residual": residual, "alpha": alpha, "wall_ms": wall_ms},
            )
        if residual < epsilon:
            converged = True
            break

    ranks = _ranks_from_state(state, verts)
    if own_blocks:
        blocks.unpersist()
    verts.unpersist()
    return PageRankResult(
        ranks=ranks,
        iterations=(it + 1),
        converged=converged,
        residuals=residuals,
        metrics=metrics,
    )


def _ranks_from_state(state: DataFrame, verts: DataFrame) -> DataFrame:
    """Unpack block arrays back into (id, rank) rows."""
    z = (
        verts.select("block", "ids")
        .join(state.select("block", "xs"), "block")
        .select(F.explode(F.arrays_zip("ids", "xs")).alias("z"))
    )
    return z.select(
        F.col("z.ids").alias("id"), F.col("z.xs").alias("rank")
    )


def _state_from_ranks(ranks: DataFrame, verts: DataFrame, k: int) -> DataFrame:
    """Repack a (id, rank) checkpoint into block state (resume path)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        return pd.DataFrame(
            {
                "block": [int(pdf["block"].iloc[0])],
                "xs": [pdf["rank"].to_numpy(np.float64)],
                "res_sq": [0.0],
                "dang_sum": [0.0],
            }
        )

    packed = (
        ranks.withColumn("block", F.pmod(F.col("id"), F.lit(k)).cast("int"))
        .groupBy("block")
        .applyInPandas(pack, _STATE_SCHEMA)
    )
    # dang_sum must reflect the resumed x: recompute via the verts dang mask
    def fix(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        xs = np.asarray(left["xs"].iloc[0], dtype=np.float64)
        dang = np.asarray(right["dang"].iloc[0], dtype=np.int32)
        return pd.DataFrame(
            {
                "block": [int(key[0])],
                "xs": [xs],
                "res_sq": [0.0],
                "dang_sum": [float(xs[dang == 1].sum())],
            }
        )

    return cut_lineage(
        packed.groupBy("block")
        .cogroup(verts.select("block", "dang").groupBy("block"))
        .applyInPandas(fix, _STATE_SCHEMA),
        eager=True,
    )
