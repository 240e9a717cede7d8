"""Operator families — one module per SURVEY.md §2 family.

Importing a module registers its graded queries in ``registry.QUERIES``
/ ``registry.ORACLES``.
"""

from __future__ import annotations

import importlib

_MODULES = (
    "wordcount",
    "relational",
    "joins",
    "aggregates",
    "grouping",
    "windows",
    "sortlimit",
    "sqlsurface",
    "setops",
    "scalar",
    "streaming_batch",
    "analytics",
    "subqueries",
    "dedup",
    "simsearch",
    "textstats",
    "udf_demo",
    "multimodal",
    "datamgmt",
    "mining",
    "ingest",
)


def load_all() -> None:
    for m in _MODULES:
        importlib.import_module(f"kafka_flink_exactlyonce_example_spark.operators.{m}")
