"""Similarity search over an embedding column (array<float>).

Two paths (SURVEY round-1 brief):

  brute_force_topk   exact cosine top-k: dot products via ``F.zip_with`` +
                     ``F.aggregate`` (JVM-side, no Python), then a bounded
                     TakeOrderedAndProject. The correctness baseline.
  lsh_topk           scale path: random-hyperplane LSH (signed projections)
                     bucket join — candidates share >= 1 band bucket; exact
                     cosine re-scoring on candidates only. Probe cost is
                     O(candidates), not O(n).
  all_pairs_above    embedding near-dup mining: LSH buckets -> exact cosine
                     filter >= threshold (the embedding-cosine dedup entry).

At 100 TB the vectors table is bucketed by LSH key so the probe join is a
partition-pruned lookup; signatures are tiny (bands x 4 bytes) next to the
raw vectors, and only candidate rows ever deserialize the full embedding.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Signed-projection signature packed into one long per band of 16 bits...
    here: one long for up to 63 planes (sign bits)."""
    bits = []
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    acc = F.lit(0)
    for b in bits:
        acc = acc + b
    return acc.cast("long")


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
    out = embeddings
    cols = []
    for b in range(bands):
        planes = _hyperplanes(dim, planes_per_band, seed + 1000 * b)
        cols.append(lsh_bucket_col(F.col(vec_col).cast("array<double>"), planes))
    return out.select(
        "*", F.posexplode(F.array(*cols)).alias("band", "bucket")
    )


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
    q = np.asarray(query_vec, dtype=np.float64)
    # driver-side query signature (tiny numpy, mirrors lsh_bucket_col exactly)
    wanted = []
    for b in range(bands):
        planes = _hyperplanes(dim, planes_per_band, seed + 1000 * b)
        sig = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ q) >= 0))
        wanted.append((b, sig))
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
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold)
    via LSH candidate generation + exact verification."""
    first = embeddings.select(vec_col).first()
    dim = len(first[0])
    bucketed = add_lsh_buckets(embeddings, dim, bands, planes_per_band, seed, vec_col)
    a = bucketed.select(
        F.col("band").alias("band_a"), F.col("bucket").alias("bucket_a"),
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
    )
    b = bucketed.select(
        F.col("band").alias("band_b"), F.col("bucket").alias("bucket_b"),
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
    )
    cands = a.join(
        b,
        (F.col("band_a") == F.col("band_b"))
        & (F.col("bucket_a") == F.col("bucket_b"))
        & (F.col("id_a") < F.col("id_b")),
    ).dropDuplicates(["id_a", "id_b"])
    sim = cosine_sim(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>"))
    return cands.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
