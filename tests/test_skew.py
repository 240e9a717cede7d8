"""Skew-mitigation correctness: salted plans must equal their plain
counterparts (the optimization is a physical rewrite, never a semantic
one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from kafka_flink_exactlyonce_example_spark.functions.skew import (
    salted_count_sum,
    salted_join,
)
from kafka_flink_exactlyonce_example_spark.sources import table


def _skewed_events(spark, sf_dir):
    """events with a synthetic hot key: fold 80% of user_ids to 0."""
    ev = table(spark, sf_dir, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 5 != 0, F.lit(0)).otherwise(F.col("user_id")),
    )


def test_salted_join_equals_plain_join(spark):
    ev = _skewed_events(spark, SMOKE_SF)
    dims = (
        table(spark, SMOKE_SF, "customer")
        .select((F.col("c_custkey") % 50).alias("user_id"))
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    )
    plain = ev.join(dims, "user_id").groupBy("segment").count()
    salted = (
        salted_join(ev, dims, "user_id", n_salts=8, salt_by="event_id")
        .groupBy("segment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    ev = _skewed_events(spark, SMOKE_SF).limit(200)
    dims = (
        table(spark, SMOKE_SF, "customer")
        .select((F.col("c_custkey") % 7).alias("user_id"))
        .distinct()
        .withColumn("segment", F.lit("s"))
    )
    plain = ev.join(dims, "user_id", "left").count()
    salted = salted_join(ev, dims, "user_id", n_salts=4, how="left", salt_by="event_id").count()
    assert plain == salted


def test_salted_agg_equals_plain_agg(spark):
    ev = _skewed_events(spark, SMOKE_SF)
    plain = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .withColumn("total", F.round("total", 4))
    )
    salted = salted_count_sum(
        ev, ["user_id"], {"total": "value"}, n_salts=8
    ).withColumn("total", F.round("total", 4))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
