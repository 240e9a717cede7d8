"""The reference's own computation as a batch query.

``liyue2008/kafka-flink-exactlyonce-example`` is a Kafka→Flink word
count: flatMap(tokenize) → keyBy(word) → window → sum (SURVEY.md §0,
reconstructed — reference checkout is empty). Batch form here;
the true streaming form lives in ``streaming/jobs.py``.

Spark-first shape: ``explode(split(...))`` is a generator inside
whole-stage codegen and ``groupBy().count()`` gets map-side partial
aggregation automatically — at 100 TB the shuffle carries one partial
count per (partition, word), not one row per token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_serialize",
    oracle="""
    WITH wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    )
    SELECT word || ':' || CAST(cnt AS VARCHAR) AS line,
           to_json(struct_pack(word := word, cnt := cnt))::VARCHAR AS json_line
    FROM wc
    """,
)
def q_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows→string serialization for a byte-oriented sink (the
    reference formats (word, count) lines for its Kafka producer):
    delimited and JSON forms, both pure expressions."""
    wc = q_wordcount(spark, sf_dir)
    return wc.select(
        F.concat_ws(":", "word", F.col("cnt").cast("string")).alias("line"),
        F.to_json(F.struct("word", "cnt")).alias("json_line"),
    )


@query(
    "q_wordcount",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
