"""Deterministic money arithmetic for oracle-graded aggregates.

Summing 60k+ doubles is order-dependent (floating-point addition is not
associative), and Spark's partial-aggregation order differs from
DuckDB's — so ``SUM(double)`` over prices can differ in the last ~1e-5
at sf0.01 magnitudes, which no amount of "round to 6" fixes reliably.

Fix: quantize each value to integer cents BEFORE aggregating.
``FLOOR(x*100 + 0.5)`` is a pure chain of IEEE-754 ops, so Spark and
DuckDB produce the identical long for the identical input double, and
integer sums are exact and order-independent. Aggregates built on
``cents()`` hash-match bit-for-bit. (The data's money columns are
2-decimal doubles — FIXTURES.md — so cents is also the natural unit.)

This is also the right call at 100 TB: long-sum aggregation is cheaper
than double-sum + no precision drift across 10^9-row partials.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """2-decimal quantization to integer cents (LongType), deterministic
    across engines: FLOOR(x*100 + 0.5) — mirror with :data:`CENTS_SQL`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")


def cents_sql(expr: str) -> str:
    """DuckDB mirror of :func:`cents` for oracle SQL strings."""
    return f"CAST(FLOOR(({expr})*100.0 + 0.5) AS BIGINT)"


CENTS_SQL = cents_sql
