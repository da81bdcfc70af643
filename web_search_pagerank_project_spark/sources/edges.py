"""Edge-list sources.

The reference's only persistent input is a gzipped CSV with header
``source,target`` (/root/reference/pagerank.py:18-35, README.md:37-41). Spark
auto-decodes the gzip codec, so the scan is a plain header CSV read; the parse
runs JVM-side (no Python in the loop). Canonical engine schema is
``(src: string, dst: string)``.

At 10^12-document scale the edge table is not CSV but derived from the pages
table (see ``..functions.html.extract_outlinks_df``) and persisted as
Parquet/Iceberg; ``read_edge_parquet`` covers that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", StringType(), nullable=False),
        StructField("dst", StringType(), nullable=False),
    ]
)

# Reference CSV header names (README.md:37-41)
_CSV_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=True),
        StructField("target", StringType(), nullable=True),
    ]
)


def read_edge_csv(spark: SparkSession, path: str, max_nnz: int | None = None) -> DataFrame:
    """Read a (possibly gzipped) ``source,target`` CSV into (src, dst).

    ``max_nnz`` mirrors the reference's row cap, which keeps the first
    ``max_nnz + 1`` rows — an off-by-one the reference never exposes on the
    CLI (pagerank.py:36-37); we reproduce the semantics via ``limit``.

    Note: an explicit schema is passed so no inference pass runs; gzip is a
    non-splittable codec, so for large inputs convert to Parquet first
    (``read_edge_parquet``).
    """
    df = spark.read.schema(_CSV_SCHEMA).option("header", True).csv(path)
    df = df.select(F.col("source").alias("src"), F.col("target").alias("dst"))
    if max_nnz is not None:
        df = limit_nnz(df, max_nnz)
    return df


def limit_nnz(edges: DataFrame, max_nnz: int) -> DataFrame:
    """The reference's row cap keeps the first ``max_nnz + 1`` edges — the
    break fires AFTER the row that crosses the threshold is appended
    (pagerank.py:36-37), an off-by-one never exposed on the CLI. Shared by
    the CSV reader and any pre-ordered edge prefix so the quirk lives in
    exactly one place. The prefix is well-defined only when the input has a
    defined order (a sequential CSV read, or an explicit orderBy upstream)."""
    return edges.limit(max_nnz + 1)


def read_edge_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a Parquet/Iceberg-style edge table; accepts either the canonical
    (src, dst) names or the reference CSV names (source, target)."""
    df = spark.read.parquet(path)
    return edges_from_dataframe(df)


def edges_from_dataframe(df: DataFrame) -> DataFrame:
    """Normalize any 2-column edge-like DataFrame to (src: string, dst: string)."""
    cols = {c.lower(): c for c in df.columns}
    if "src" in cols and "dst" in cols:
        src, dst = cols["src"], cols["dst"]
    elif "source" in cols and "target" in cols:
        src, dst = cols["source"], cols["target"]
    else:
        raise ValueError(f"cannot find edge columns in {df.columns}")
    return df.select(
        F.col(src).cast("string").alias("src"), F.col(dst).cast("string").alias("dst")
    )
