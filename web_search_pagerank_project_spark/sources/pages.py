"""The ``pages`` table — source of record for the link graph (input_hint).

Schema (BASELINE.json input_hint):

    url      string       page url (graph vertex key)
    warc_ts  timestamp    capture time; latest capture wins per url
    html     binary       raw page bytes
    text     string       extracted text (may be pre-populated by the crawler)
    lang     string       language tag

At 10^12-document scale the table of record is **Apache Iceberg**, which
buys: snapshot-isolated readers during continuous crawl ingest, partition
evolution without rewrites, and metadata-level file pruning. The intended
layout (``PAGES_TABLE_DDL``) partitions by ``days(warc_ts)`` (time-pruned
incremental extraction) and ``bucket(1024, url)`` (co-locates re-crawls of
the same url for the latest-capture dedupe, and storage-partitions the
url-keyed joins downstream).

This sandbox image ships no Iceberg runtime jar, so ``read_pages`` resolves
in order: (1) an Iceberg/catalog table name if the catalog is configured,
(2) a parquet path. Everything downstream (extract, edges, graph build) is
identical either way — the operators only see the DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Target DDL for the production table (see module doc). Executable verbatim
# on a cluster with an Iceberg catalog named `web`.
PAGES_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS web.crawl.pages (
    url      STRING,
    warc_ts  TIMESTAMP,
    html     BINARY,
    text     STRING,
    lang     STRING
)
USING iceberg
PARTITIONED BY (days(warc_ts), bucket(1024, url))
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.parquet.compression-codec' = 'zstd',
    'read.split.target-size' = '134217728'
)
"""


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath + configured."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table from an Iceberg/catalog table name or a parquet
    path. A ``source`` containing '/' or ending in .parquet is a path."""
    if "/" not in source and not source.endswith(".parquet"):
        return spark.read.table(source)
    return spark.read.schema(PAGES_SCHEMA).parquet(source)


def incremental_pages(
    spark: SparkSession,
    source: str,
    since_ts: str | None = None,
) -> DataFrame:
    """Pages captured after ``since_ts`` — the incremental re-extraction
    input. On Iceberg the ``warc_ts`` predicate prunes day partitions at the
    metadata level; on parquet it is a pushed-down row-group filter
    (visible as PushedFilters in .explain)."""
    df = read_pages(spark, source)
    if since_ts is not None:
        df = df.filter(F.col("warc_ts") > F.lit(since_ts).cast("timestamp"))
    return df


def write_pages(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write a batch of captures. Iceberg table name -> writeTo (snapshot
    commit, honoring ``mode``); path -> parquet with the given save mode.

    ADVICE r1: the table path must branch on ``mode`` — silently appending
    on mode='overwrite' corrupts downstream reads.
    """
    if "/" not in target and not target.endswith(".parquet"):
        if mode == "append":
            df.writeTo(target).append()
        elif mode == "overwrite":
            df.writeTo(target).createOrReplace()
        else:
            raise ValueError(
                f"write_pages: unsupported mode {mode!r} for table targets "
                "(use 'append' or 'overwrite')"
            )
    else:
        df.write.mode(mode).parquet(target)
