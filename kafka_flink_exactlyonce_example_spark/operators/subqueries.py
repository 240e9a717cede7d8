"""Subquery surface via the ``spark.sql`` entry point: correlated
scalar subqueries and (NOT) IN subqueries. One SQL text runs on both
engines, which doubles as a cross-check that our DataFrame and SQL
lifecycles resolve against the same catalog (SURVEY.md §3.2b).
Catalyst decorrelates these into joins — no per-row re-execution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import register_views

_SCALAR_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2.0 * (SELECT AVG(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
"""

_IN_SQL = """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'P')
"""


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_SCALAR_SQL)


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_IN_SQL)
