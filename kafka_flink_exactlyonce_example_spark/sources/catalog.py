"""Batch catalog: the driver's ten parquet tables (FIXTURES.md).

Schemas are fixed and known; we never rely on inference for graded
queries. The one normalization: when ``events.ts`` is TIMESTAMP(NANOS)
in parquet, Spark reads it (under ``nanosAsLong``) as LongType nanos —
we convert with ``ts DIV 1000`` (integer truncation) to µs, matching
bit-for-bit what DuckDB produces when it coerces the same column. When
the driver generates the table with µs precision instead, the column
already arrives as TimestampType (NTZ inference is disabled in
session confs) and no conversion is needed — the check is on the
loaded physical type, not on an assumed generation.

At 100 TB these would be partitioned/bucketed external tables; the load
pattern stays ``spark.read.parquet(dir)`` and every query would pick up
partition pruning for free — nothing here assumes single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from kafka_flink_exactlyonce_example_spark.session import ensure_session_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # ns → µs truncation, identical to DuckDB's coercion of the column.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # belt-and-braces: if a caller-built session read the file
            # before our confs applied, align to the one timestamp type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Temp views for the ``spark.sql`` entry point (GROUPING SETS etc.)."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
