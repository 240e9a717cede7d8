"""Storage layout & sink surface: partitioned / bucketed / multi-format.

The 100 TB layout story (SURVEY.md §4.2 "partition pruning" row):

- **Partitioned layout** (`partitionBy`): directory-level pruning — a
  filter on the partition column skips whole directories before any IO
  (shows as ``PartitionFilters`` in the scan node). The right layout for
  low-cardinality scan predicates (date, event_type, lang).
- **Bucketed layout** (`bucketBy` + ``saveAsTable``): pre-shuffled
  co-location — two tables bucketed on the same join key with the same
  bucket count join with ZERO exchange (the shuffle was paid once at
  write time, amortized over every subsequent join). The right layout
  for the fact-fact joins (lineitem ⋈ orders) that dominate at scale.
- **Formats**: parquet is the engine default; csv/json/orc are supported
  for interchange (json mirrors the reference's Kafka byte-stream
  deserialize step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *cols: str, fmt: str = "parquet") -> None:
    """Directory-partitioned write — one dir per distinct value chain."""
    df.write.format(fmt).partitionBy(*cols).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int,
    *cols: str,
    sort: bool = True,
) -> None:
    """Bucketed external table (hash(col) % n_buckets file layout).
    ``sort=True`` additionally sorts within buckets so a downstream
    sort-merge join skips its sort too."""
    w = df.write.bucketBy(n_buckets, *cols).option("path", path).mode("overwrite")
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table_name)


def read_any(spark: SparkSession, path: str, fmt: str, schema: str | None = None) -> DataFrame:
    """Format-dispatched reader; explicit schema for text formats (never
    rely on inference for correctness-graded paths — SURVEY.md §1.2)."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


def write_compacted(
    df: DataFrame, path: str, target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-files-aware write: size output files near ``target_file_bytes``
    using Catalyst's own size estimate for the plan. The small-files
    problem is THE operational failure mode of long-running ingestion at
    100 TB scale (a 1000-executor job writing per-task files produces
    millions of KB-sized objects); compaction at write time keeps scans
    and listings O(data), not O(files). Returns the partition count used."""
    stats_size = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    n = max(1, -(-stats_size // target_file_bytes))
    df.repartition(n).write.format(fmt).mode("overwrite").save(path)
    return n
