"""The reference pipeline, Spark-native (SURVEY.md §2.9).

Reference (reconstructed): Kafka source → flatMap(tokenize) →
keyBy(word) → 5s tumbling window → sum → transactional Kafka sink.
Here: any source from ``sources.py`` → explode(split) →
groupBy(window, word).count() → IdempotentBatchSink, with watermarking
for late data and checkpoint-based recovery. The transformation is the
SAME expression as the batch q_wordcount / q_tumbling_window — one
logical plan, incrementalized by Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka_flink_exactlyonce_example_spark.streaming.exactly_once import (
    IdempotentBatchSink,
)


def tokenized(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """flatMap(tokenize) — one row per word."""
    return lines.select(
        "*", F.explode(F.split(F.col(value_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")


def streaming_wordcount(
    lines: DataFrame,
    ts_col: str,
    window: str = "5 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Windowed word count: the reference's computation incrementalized.
    Watermark bounds state (late rows beyond it are dropped), the
    streaming analog of q_late_data."""
    return (
        tokenized(lines)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("word"))
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            "word",
            F.col("count").alias("cnt"),
        )
    )


def streaming_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming form of q_tumbling_window (same expression tree),
    with dropDuplicates on the record key = q_stream_dedup's form."""
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicates(["event_id"])
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .count()
        .select(F.col("w.start").alias("window_start"), key_col, "count")
    )


def run_exactly_once(
    result: DataFrame,
    sink: IdempotentBatchSink,
    checkpoint_dir: str,
    trigger_once: bool = True,
    output_mode: str = "complete",
) -> StreamingQuery:
    """Wire a streaming result through the exactly-once sink with a
    checkpoint (offset WAL + state store) — kill/restart resumes from
    the last committed batch with no loss or duplication.

    output_mode: 'complete' for aggregations (read back with
    sink.read_latest), 'append' for row streams (sink.read_committed).
    """
    writer = (
        result.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
