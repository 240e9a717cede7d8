"""Scalar function families: string / date / math / JSON / array
(SURVEY.md §2.8).

All built-in ``pyspark.sql.functions`` — every expression here stays
inside whole-stage codegen (no Python boundary). Cross-engine traps
handled per function: integer results cast to long on both sides;
``round`` only applied at exactly-representable boundaries or to
bounded-magnitude values; regex patterns restricted to the common
Java/RE2 subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 4) AS name_pfx,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat_ws('-', p_brand, p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           trim('  ' || p_name || ' ') AS name_trimmed,
           (p_name LIKE '%re%') AS has_re
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.col("p_name").like("%re%").alias("has_re"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + posexplode — the reference's flatMap, one row per token
    with position (generator inside codegen, no UDF)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
           CAST(day(o_orderdate) AS BIGINT) AS o_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS abs_dev,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(p_retailprice, 0) AS price_round0,
           sqrt(p_retailprice) AS price_sqrt,
           ROUND(ln(p_retailprice + 1.0), 6) AS price_ln,
           pow(2.0, CAST(p_size AS DOUBLE)) AS size_pow2,
           CAST(p_size % 7 AS BIGINT) AS size_mod7
    FROM part
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round at 0 digits only (the .5 boundary of 2-decimal data is the
    exactly-representable x.50, where HALF_UP and away-from-zero agree);
    ln rounded to 6 (libm vs JVM may differ in the last ulp)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("abs_dev"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.round("p_retailprice", 0).alias("price_round0"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("price_ln"),
        F.pow(F.lit(2.0), F.col("p_size").cast("double")).alias("size_pow2"),
        (F.col("p_size") % 7).cast("long").alias("size_mod7"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val_typed
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column promotion two ways: path extraction
    (get_json_object) and schema-on-read (from_json → typed struct)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.from_json("props", "k INT").getField("k").cast("long").alias("k_val_typed"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_elem,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
           ROUND(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE))), 6) AS head_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_elem"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("head_sum"),
    )
