"""Streaming source abstraction (SURVEY.md §2.1, §2.9).

The reference consumes a Kafka topic (FlinkKafkaConsumer +
SimpleStringSchema — reconstructed, SURVEY.md §0). Our engine exposes
the same pipeline over three interchangeable sources:

- ``kafka_stream``: the production source. This environment has no
  broker (and no network), so it is exercised as a builder (options
  contract tested, not executed).
- ``file_stream``: replayable directory source — CI stand-in for Kafka
  with identical downstream plans and offset-tracked exactly-once
  replay (each file = a batch of records).
- ``rate_stream``: synthetic load for smoke tests.

All return a DataFrame with a ``value: string`` column (plus source
metadata), mirroring Kafka's byte-value contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka source with the reference's consumer contract.

    Downstream of a transactional producer, add
    ``kafka.isolation.level=read_committed`` (the reference's consumer
    requirement for exactly-once). Value bytes are cast to string —
    the SimpleStringSchema equivalent.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .option("kafka.isolation.level", "read_committed")
    )
    return reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic source: monotonically increasing (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            F.col("timestamp"),
            F.col("value").cast("string").alias("value"),
        )
    )


def file_stream(
    spark: SparkSession, path: str, schema: str, fmt: str = "json", **options: str
) -> DataFrame:
    """Replayable file source (offset log = file list, so a restarted
    query re-reads exactly the uncommitted files)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def kafka_sink(
    result: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
    value_col: str = "value",
):
    """Kafka sink with the reference's producer contract, Spark-style.

    The reference's `Semantic.EXACTLY_ONCE` producer (Kafka transactions
    two-phase-committed on checkpoint completion) has no direct Spark
    twin — Spark's built-in Kafka sink is at-least-once on replay. The
    engine's end-to-end exactly-once therefore comes from the OTHER side
    of the contract, exactly as documented for the reference's
    consumers: produce with replayed batches allowed, and require
    downstream readers to be idempotent/`read_committed`-style (dedup
    on a key carried in the message — pair this with
    `exactly_once.IdempotentBatchSink` when the sink is a store we
    control, or put a `(batchId, key)` envelope in the payload for
    Kafka consumers to dedup on). This builder returns the configured
    `DataStreamWriter`; `.start()` it where a broker exists.
    """
    cols = []
    if key_col is not None:
        cols.append(F.col(key_col).cast("string").cast("binary").alias("key"))
    cols.append(F.col(value_col).cast("string").cast("binary").alias("value"))
    return (
        result.select(*cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
