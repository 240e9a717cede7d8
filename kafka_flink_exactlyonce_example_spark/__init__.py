"""PySpark-native analytics engine with the capabilities of
``liyue2008/kafka-flink-exactlyonce-example``.

The reference is a Kafka→Flink→Kafka exactly-once streaming word-count
demo (reconstructed from public knowledge; the local checkout at
/root/reference is empty — see SURVEY.md §0). This package re-expresses
that surface Spark-first:

- batch analytics over the driver's TPC-H-ish star schema (DataFrame /
  Spark SQL, Catalyst-optimized, no custom planner),
- Structured Streaming pipelines with watermarks, windowed aggregation,
  dedup, and an exactly-once ``foreachBatch`` sink (checkpoint + idempotent
  commit keyed by ``batchId`` — Spark's translation of Flink's
  checkpoint + transactional two-phase-commit Kafka sink),
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash),
  similarity search over embeddings, text analysis, TF-IDF.

Design rules (100 TB posture, SURVEY.md §4):
- declarative DataFrame/SQL only; zero RDD code, zero collect() in
  operators; Python UDFs exist only as capability demos off the hot path.
- every float aggregate that is oracle-graded is made cross-engine
  deterministic (integer-cents quantization or bounded-magnitude
  rounding) — see ``functions.money``.
"""

from kafka_flink_exactlyonce_example_spark.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)
