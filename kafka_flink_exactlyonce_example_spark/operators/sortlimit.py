"""Global sort + limit (SURVEY.md §2.6).

``orderBy(...).limit(k)`` plans TakeOrderedAndProject: each partition
keeps a k-row heap, the driver merges k·P rows — no global sort ever
materializes, which is exactly the 100 TB-safe top-k plan (asserted in
tests/test_plans.py). Tie-break on the unique key keeps the row set
deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(100)
