"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kafka_flink_exactlyonce_example_spark``; this
module re-exports the registry (SURVEY.md §2 inventory). Keys without
an ``oracle_sql`` entry are the explicitly rows-only ops — approx
sketches (HLL/GK differ by engine), seeded ``.sample()``, and the
UDF/UDTF/multimodal Python-stage demos. Everything else, including the
approximate indexes (MinHash LSH, SimHash, IVF, hyperplane LSH), is
fully DuckDB-oracled via engine-portable deterministic hashing.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_flink_exactlyonce_example_spark import registry

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5-shaped star join) on sf0.001."""
    return registry.QUERIES["q_star_join"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for every hash-graded query."""
    return dict(registry.ORACLES)
