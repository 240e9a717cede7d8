"""Wider analytics surface: pivot, arg-extrema, ordered string_agg,
exact percentiles, histograms, funnel/retention (event analytics), null
handling, regex cleanup, sampling. Everything but the seeded samples is
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS BIGINT) AS "A",
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS BIGINT) AS "N",
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS BIGINT) AS "R"
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation). Values enumerated explicitly — at scale
    an unenumerated pivot needs a collect of distinct values first;
    declaring them keeps the plan single-pass."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity").cast("long"))
    )


@query(
    "q_minmax_by",
    oracle=f"""
    SELECT l_returnflag,
           arg_max(l_orderkey,
                   lpad(CAST({cents_sql('l_extendedprice')} AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || CAST(l_linenumber AS VARCHAR)) AS max_price_orderkey,
           arg_min(l_orderkey,
                   lpad(CAST({cents_sql('l_extendedprice')} AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || CAST(l_linenumber AS VARCHAR)) AS min_price_orderkey
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin). The ordering key is made unique
    (price-cents ++ orderkey ++ linenumber, zero-padded so lexicographic
    = numeric) because arg-extrema with ties are nondeterministic."""
    li = table(spark, sf_dir, "lineitem")
    from kafka_flink_exactlyonce_example_spark.functions.money import cents

    key = F.concat(
        F.lpad(cents("l_extendedprice").cast("string"), 12, "0"),
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.col("l_linenumber").cast("string"),
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", key).alias("max_price_orderkey"),
        F.min_by("l_orderkey", key).alias("min_price_orderkey"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic via explicit
    sort of the collected set before concatenation."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the type-7 linear interpolation (verified
    identical on this data); rounded to 6 for safety."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25_qty"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing (floor is exact —
    no cross-engine drift)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel (view → click → purchase ordered by first
    occurrence): one conditional-min aggregation per user, one global
    rollup — two shuffles total at any scale."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    clicked = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_clicked_after_view"),
        F.sum(
            F.when(clicked & (F.col("t_purchase") > F.col("t_click")), 1).otherwise(0)
        ).alias("n_full_funnel"),
    )


@query(
    "q_retention",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-08'
                    THEN user_id END) AS BIGINT) AS w1_users,
           CAST(COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-08'
                         AND ts < TIMESTAMP '2024-01-15'
                    THEN user_id END) AS BIGINT) AS w2_users,
           CAST(COUNT(DISTINCT CASE WHEN user_id IN (
                        SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08')
                         AND ts >= TIMESTAMP '2024-01-08'
                         AND ts < TIMESTAMP '2024-01-15'
                    THEN user_id END) AS BIGINT) AS retained
    FROM events
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: distinct actives per window + the
    intersection (semi-join of week-2 activity against week-1 users)."""
    ev = table(spark, sf_dir, "events")
    w1_end = F.lit("2024-01-08").cast("timestamp")
    w2_end = F.lit("2024-01-15").cast("timestamp")
    in_w1 = F.col("ts") < w1_end
    in_w2 = (F.col("ts") >= w1_end) & (F.col("ts") < w2_end)
    w1_users = ev.filter(in_w1).select("user_id").distinct()
    w2_active = ev.filter(in_w2)
    retained = (
        w2_active.join(w1_users, "user_id", "left_semi")
        .agg(F.countDistinct("user_id").alias("retained"))
    )
    counts = ev.agg(
        F.countDistinct(F.when(in_w1, F.col("user_id"))).alias("w1_users"),
        F.countDistinct(F.when(in_w2, F.col("user_id"))).alias("w2_users"),
    )
    return counts.crossJoin(F.broadcast(retained))


@query(
    "q_null_handling",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS n_big
        FROM customer
    )
    SELECT c_custkey,
           COALESCE(NULLIF(n_big, 0), -1) AS n_big_or_flag,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           IFNULL(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
               AS bal_nonneg
    FROM per_cust
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics surface: COALESCE / NULLIF / IFNULL over an outer
    aggregation that genuinely produces missing groups."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    n_big = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return (
        c.join(n_big, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("n_big"), F.lit(0)), F.lit(-1)).alias(
                "n_big_or_flag"
            ),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            F.ifnull(
                F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")),
                F.lit(0.0),
            ).alias("bal_nonneg"),
        )
    )


@query(
    "q_regex_clean",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '[aeiou]', '', 'g'),
                               ' +', ' ', 'g')) AS devoweled,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT)
               AS n_vowels
    FROM documents
    """,
)
def q_regex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex text normalization (the cleanup stage of a data pipeline).
    DuckDB needs the 'g' flag to match Spark's replace-all semantics."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.regexp_replace("text", "[aeiou]", ""), " +", " ")
        ).alias("devoweled"),
        F.length(F.regexp_replace("text", "[^aeiou]", "")).cast("long").alias(
            "n_vowels"
        ),
    )


@query("q_sample")  # rows-only: engine-specific sampling RNG
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + stratified sampleBy — the data-diet
    stage of a training pipeline (deterministic per engine, but RNG
    streams are engine-specific so no SQL oracle)."""
    ev = table(spark, sf_dir, "events")
    uniform = ev.sample(fraction=0.1, seed=42)
    strat = ev.sampleBy(
        "event_type",
        {"view": 0.05, "click": 0.2, "purchase": 1.0, "signup": 1.0, "error": 0.5},
        seed=42,
    )
    u = uniform.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_uniform"))
    s = strat.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_stratified"))
    return u.join(s, "event_type", "full")


@query("q_approx_quantile")  # rows-only: t-digest/GK sketches differ across engines
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch): the single-pass mergeable-sketch
    path for quantiles at 100 TB — no per-group sort, partials merge
    associatively across executors (the same reason q_approx_distinct
    uses HLL). Exact twin with full oracle: q_percentile."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile_approx("l_extendedprice", 0.5, 10000), 2).alias("p50_approx"),
        F.round(F.percentile_approx("l_extendedprice", 0.9, 10000), 2).alias("p90_approx"),
    )
