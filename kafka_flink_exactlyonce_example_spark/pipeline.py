"""End-to-end training-data curation pipeline — the composition a
100 TB corpus actually runs, as one lazily-planned DataFrame:

    documents
      → near-dup dedup, keep best per duplicate group   (operators/dedup)
      → quality filter (length + empty-token guards)
      → tokenize + count
      → deterministic content-hash shard assignment

Every stage is a declared transformation, so Catalyst sees ONE logical
plan end to end: the quality filter pushes toward the scan, column
pruning drops `text` after tokenization, and the only materialization
before the final write is the component-label checkpoint inside the
dedup loop. At scale the output feeds `write_partitioned(df, path,
"shard")` (sources/io.py) so downstream trainers read balanced,
reproducible shards.

The whole composition is DuckDB-oracle-verified (q_pipeline_curate):
a recursive-CTE mirror of the dedup groups plus the same filters —
the strongest end-to-end correctness statement in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.operators.dedup import (
    _LSH_CC_PREFIX,
    q_dedup_keep_best,
)
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table

MIN_CHARS = 80  # quality floor: drop the bottom tail of fragments
N_SHARDS = 16


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated corpus: one surviving document per near-dup group,
    quality-filtered, token-counted, shard-assigned."""
    keepers = q_dedup_keep_best(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id"), "group_size"
    )
    d = table(spark, sf_dir, "documents")
    kept = d.join(keepers, "doc_id")  # one row per group by construction
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    shard = (
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % N_SHARDS
    )
    return (
        kept.filter(F.col("n_chars") >= MIN_CHARS)
        .select(
            "doc_id",
            "lang",
            "source",
            F.col("group_size").cast("long").alias("n_dups_folded"),
            F.size(toks).cast("long").alias("n_tokens"),
            shard.alias("shard"),
        )
    )


@query(
    "q_pipeline_curate",
    oracle=_LSH_CC_PREFIX
    + f"""
    , groups AS (
        SELECT d.doc_id, d.n_chars,
               CAST(LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS BIGINT) AS group_id
        FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        GROUP BY d.doc_id, d.n_chars
    ),
    keep AS (
        SELECT CAST(arg_max(doc_id, n_chars * 1000000 - doc_id) AS BIGINT) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups_folded
        FROM groups
        GROUP BY group_id
    )
    SELECT d.doc_id, d.lang, d.source, k.n_dups_folded,
           CAST(len(list_filter(string_split(d.text, ' '), w -> w <> ''))
                AS BIGINT) AS n_tokens,
           CAST(CAST(concat('0x', substring(md5(d.text), 1, 8)) AS UBIGINT)
                % {N_SHARDS} AS BIGINT) AS shard
    FROM documents d
    JOIN keep k ON k.doc_id = d.doc_id
    WHERE d.n_chars >= {MIN_CHARS}
    """,
)
def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See :func:`curate` — registered so the driver grades the whole
    pipeline end-to-end against the recursive-CTE oracle."""
    return curate(spark, sf_dir)
