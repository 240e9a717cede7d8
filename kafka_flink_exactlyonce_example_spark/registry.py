"""Query registry: the graded surface of SURVEY.md §2.

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable and
(unless marked rows-only) a DuckDB oracle SQL string with IDENTICAL
column names and deterministic values. ``__spark_entry__.py`` re-exports
these dicts to the driver.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_exactlyonce_example_spark.session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query. ``oracle=None`` → rows-only check
    (non-SQL-expressible ops: approx sketches, UDF demos, MinHash)."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str, *a: Any, **kw: Any) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir, *a, **kw)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run."""
    from kafka_flink_exactlyonce_example_spark import operators  # noqa: F401

    operators.load_all()

    from kafka_flink_exactlyonce_example_spark import pipeline  # noqa: F401
