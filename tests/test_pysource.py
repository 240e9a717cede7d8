"""Python DataSource API (Spark 4 connector extension point) + the
Observation metrics API — the 'build a new source / watch a running
query' capabilities a Kafka-class connector rests on."""

from __future__ import annotations

from kafka_flink_exactlyonce_example_spark.sources.pysource import (
    SyntheticEventsDataSource,
    _row,
)


def _registered(spark):
    # idempotent per session
    spark.dataSource.register(SyntheticEventsDataSource)
    return spark


def test_batch_read_matches_reference_rows(spark):
    """Batch read through the connector == the same rows generated
    driver-side: the source is deterministic and partition-complete."""
    df = (
        _registered(spark)
        .read.format("synthetic_events")
        .option("rows", 250)
        .option("partitions", 3)
        .load()
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(_row(i) for i in range(250))
    assert got == want
    assert df.rdd.getNumPartitions() == 3


def test_batch_read_is_pushdown_friendly_projection(spark):
    """Column pruning through the Python source still yields correct
    values (the reader emits full rows; Spark projects)."""
    df = (
        _registered(spark)
        .read.format("synthetic_events")
        .option("rows", 100)
        .load()
        .groupBy("event_type")
        .count()
    )
    from collections import Counter

    want = Counter(_row(i)[2] for i in range(100))
    got = {r["event_type"]: r["count"] for r in df.collect()}
    assert got == dict(want)


def test_stream_read_offsets_and_replay(spark, tmp_path):
    """The streaming side honors the replayable-offset contract: rows
    arrive in offset order with no gaps/dups across micro-batches."""
    from pyspark.sql import functions as F

    stream = (
        _registered(spark)
        .readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        from pyspark.errors.exceptions.captured import AnalysisException

        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            # The file sink commits via _spark_metadata: a part file can be
            # on disk before its batch is committed to the log, in which
            # case the read sees zero committed files and raises — that
            # just means "not ready yet", so keep polling.
            try:
                n = spark.read.parquet(out_dir).count()
            except AnalysisException:
                n = 0
            if n >= 80:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(
        r["event_id"] for r in spark.read.parquet(out_dir).collect()
    )
    # contiguous prefix 0..n-1: no gaps, no duplicates
    assert len(got) >= 80
    assert got == list(range(len(got)))


def test_observation_metrics_match_result(spark, registry_loaded):
    """df.observe(): task-side metrics collected during a normal action
    agree with the query's own result — the engine's run-time
    observability hook (row counts / sums without a second scan)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from tests.conftest import SMOKE_SF

    from kafka_flink_exactlyonce_example_spark.sources import table

    li = table(spark, SMOKE_SF, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("total_qty"),
    )
    agg = observed.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert obs.get["n_rows"] == agg["n"]
    assert obs.get["total_qty"] == agg["q"]
