"""ROLLUP / CUBE / GROUPING SETS (SURVEY.md §2.4).

Spark expands these into a single Expand + HashAggregate — one pass
over the fact table regardless of how many grouping sets, which is the
scale-correct plan (vs. unioning N aggregations).
q_grouping_sets additionally exercises the ``spark.sql`` entry point
over registered temp views (query lifecycle (b), SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents, cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import register_views, table


@query(
    "q_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM({cents_sql('c_acctbal')}) AS BIGINT) AS acct_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(cents("c_acctbal")).alias("acct_cents"),
        )
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT c_mktsegment, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS price_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE(c_mktsegment, o_orderstatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("price_cents"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT event_type,
           CAST(user_id % 10 AS BIGINT) AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(GROUPING(event_type) AS BIGINT) AS g_type
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS BIGINT)), ())
"""


@query("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "q_grouping_id",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
           CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id() over a rollup — the disambiguator that
    makes subtotal rows machine-readable (a NULL n_name could be data;
    g_nation=1 says 'this row IS the region subtotal'). Same plan as
    q_rollup (single Expand + hash agg); the flags are computed from
    the grouping-set id Spark already carries, zero extra cost."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping_id("r_name", "n_name").alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .select(
            "r_name", "n_name", "g_region", "g_nation", "gid", "n_cust"
        )
    )
