"""Projection / filter / conditional expressions (SURVEY.md §2.2).

All pure-Catalyst: filters and column selection reach the parquet scan
as PushedFilters/ReadSchema (asserted in tests/test_plans.py) — the
property that turns a 100 TB scan into a fraction of itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents, cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_scan_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {cents_sql('l_extendedprice * (1 - l_discount)')} AS disc_price_cents,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "disc_price_cents"
        ),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'O' AND l_tax > 0.05)
      AND l_extendedprice IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & ~((F.col("l_linestatus") == "O") & (F.col("l_tax") > 0.05))
        & F.col("l_extendedprice").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q_case_expr",
    oracle=f"""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS sum_price_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    return (
        o.select(bucket.alias("bucket"), cents("o_totalprice").alias("pc"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("pc").alias("sum_price_cents"),
        )
    )
