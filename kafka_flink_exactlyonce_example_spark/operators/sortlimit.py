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


@query(
    "q_diversity_topk",
    oracle="""
    WITH capped AS (
        SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rank_in_group
        FROM orders
        QUALIFY rank_in_group <= 4
    )
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
           CAST(rank_in_group AS BIGINT) AS rank_in_group
    FROM capped
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_diversity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-constrained global top-k — 'top 10 orders by value,
    but at most 4 per priority class': the result-diversification
    pattern search/retrieval layers apply so one dominant group cannot
    monopolize the page (same shape: max-N-per-source in RAG contexts,
    per-seller caps in marketplace ranking).

    Composition of the two scale-safe ranking plans, in the right
    order: the per-group cap is a rank filter that Catalyst executes
    as WindowGroupLimit (map-side partial top-4 per group — the full
    table never sorts), and the global top-10 over the capped
    survivors (≤ 4·|groups| rows) is TakeOrderedAndProject. Filter
    FIRST, then global top-k: the global heap only ever sees the
    bounded capped relation. Both keyed on (o_totalprice, o_orderkey)
    so the row set is engine-identical."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    capped = (
        o.select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .withColumn("rank_in_group", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_in_group") <= 4)
    )
    return capped.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(10)
