"""Set operations (SURVEY.md §2.7).

UNION ALL is a zero-shuffle concat; the distinct variants shuffle on
the full row — at 100 TB prefer UNION ALL + downstream aggregation
when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


def _building(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")


def _positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 0).select("c_custkey")


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).unionByName(_positive(spark, sf_dir))


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).unionByName(_positive(spark, sf_dir)).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).intersect(_positive(spark, sf_dir))


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (bag semantics, like Spark's
    exceptAll): customers' F-order multiplicity minus O-order multiplicity."""
    o = table(spark, sf_dir, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.exceptAll(o_side)
