"""Structured Streaming ingest for the engine's tables.

The reference is fully batch (SURVEY §2.2: no streams), so streaming here is
an engine *extension*: continuous edge/page ingest into the same table
shapes the batch operators consume — the standard lambda-free pattern for a
continuously-crawled web graph:

  stream_edges_from_csv   readStream over a landing directory of edge CSVs ->
                          canonical (src, dst) stream.
  streaming_degree_counts watermarked sliding-window in-degree aggregation
                          (the streaming analogue of O6), for hot-hub
                          monitoring during a crawl.
  sink_to_parquet         append-mode parquet/Iceberg-style sink with
                          checkpointLocation for exactly-once file commits.

Stateful custom ops would use applyInPandasWithState; nothing in the current
operator inventory needs bespoke state beyond windowed aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

STREAM_EDGE_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("target", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_edges_from_csv(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Unbounded (src, dst, ts) stream from CSV drops in `landing_dir`."""
    raw = (
        spark.readStream.schema(STREAM_EDGE_SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )
    return raw.select(
        F.col("source").alias("src"),
        F.col("target").alias("dst"),
        F.coalesce(F.col("ts"), F.current_timestamp()).alias("ts"),
    )


def streaming_degree_counts(
    edges: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked sliding-window in-degree per dst (late data dropped after
    `watermark`)."""
    return (
        edges.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("dst"))
        .agg(F.count("*").alias("indeg"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "dst",
            "indeg",
        )
    )


def sink_to_parquet(df: DataFrame, path: str, checkpoint: str, mode: str = "append"):
    """Start an exactly-once file sink; returns the StreamingQuery."""
    return (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )
