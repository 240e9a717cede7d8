"""Aggregation family (SURVEY.md §2.4).

Scale notes: every groupBy here gets automatic map-side partial
aggregation (HashAggregate partial→final in the plan), so the shuffle
carries one row per (partition, group) — the only safe shape at 100 TB.
Distinct counts shuffle by (group, value) first; approx_count_distinct
is the single-pass sketch alternative for high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents, cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_agg_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(SUM({cents_sql('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
           CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
               AS sum_disc_cents,
           CAST(SUM({cents_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')})
               AS BIGINT) AS sum_charge_cents,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure hash aggregate + HAVING.

    sum_qty is exact (quantities are integral doubles; integer sums in
    float64 are associative below 2^53); money sums are exact via cents().
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(cents(disc)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .filter(F.col("count_order") > 100)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem
    """,
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .distinct()
    )


@query("q_approx_distinct")  # rows-only: HLL sketches differ across engines
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the sketch path for
    high-cardinality distinct counts at 100 TB (no per-value shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
    )


@query(
    "q_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_discount, l_tax), 6) AS covar_disc_tax,
           ROUND(MIN(l_extendedprice), 6) AS min_price,
           ROUND(MAX(l_extendedprice), 6) AS max_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates over bounded-magnitude columns (quantity
    ≤50, discount ≤0.1) so cross-engine float error (~1e-12) is far
    inside the round-to-6 grid."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_discount", "l_tax"), 6).alias("covar_disc_tax"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
    )


@query("q_hll_merge", oracle=None)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg) — the 100 TB pattern for COUNT
    DISTINCT across shards: each partition/source builds a fixed-size
    sketch, sketches merge associatively (no re-scan, no shuffle of
    raw values), and the merged estimate must agree with the
    single-pass global sketch. This query PROVES that property on real
    data: it builds per-source sketches, merges them, builds a global
    sketch directly, and reports both estimates next to the exact
    count — merged == global is the mergeability invariant (identical
    binary sketch state), and the relative error vs exact sits inside
    the published HLL bound for lgK=12 (~1.6%).

    rows-only by the same contract as q_approx_distinct: sketch
    internals are engine-specific (DuckDB's approx_distinct is a
    different HLL implementation), so values can't hash-match an
    oracle; the driver checks rows+schema, the test suite asserts the
    invariants."""
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda w: w != "")).alias(
            "word"
        ),
    )
    per_src = words.groupBy("source").agg(
        F.hll_sketch_agg("word", F.lit(12)).alias("sk")
    )
    merged = per_src.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    global_ = words.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(12))).alias(
            "est_global"
        )
    )
    exact = words.agg(F.countDistinct("word").alias("n_exact"))
    return (
        exact.crossJoin(F.broadcast(global_))
        .crossJoin(F.broadcast(merged))
        .select(
            "n_exact",
            F.col("est_global").cast("long").alias("est_global"),
            F.col("est_merged").cast("long").alias("est_merged"),
            (F.col("est_merged") == F.col("est_global")).alias(
                "merged_matches_global"
            ),
            F.round(
                F.abs(F.col("est_global") - F.col("n_exact"))
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
        )
    )
