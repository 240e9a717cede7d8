"""Skew mitigation: salting for hot keys (SURVEY.md §3.3 / prompt
"salting for skew").

AQE's skew-join handling (on by default in this engine's sessions)
splits oversized shuffle partitions at runtime and covers most cases.
Salting is the explicit fallback for the two shapes AQE can't fix:

- **join** where one key holds a constant fraction of all rows (AQE can
  split the partition, but every split still joins the full build side
  for that key — salting replicates the build side N ways so the probe
  side fans out);
- **aggregation** on a hot key (partial aggregation already combines
  map-side, but a single reducer still merges all partials for the hot
  key — two-phase salted agg spreads the merge).

Both are pure DataFrame compositions — no custom partitioner, no RDDs —
so they inherit AQE/codegen like everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, *cols: str) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``cols``
    (deterministic → reproducible plans and retriable tasks, unlike
    rand()-based salts which break task retry idempotence)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join where ``skewed``'s join-key distribution is hot.

    The skewed (probe) side gets a deterministic salt from ``salt_by``
    (default: a non-key column giving per-row spread); the other (build)
    side is replicated once per salt value. The shuffle key becomes
    (key, salt): the hot key's rows land on n_salts reducers instead of
    one. Cost: build side × n_salts — use for dim-sized build sides;
    for fact-fact skew prefer AQE's split-and-replicate.
    """
    salt_col = salt_by or [c for c in skewed.columns if c != on][0]
    probe = with_salt(skewed, n_salts, salt_col)
    build = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return probe.join(build, [on, "_salt"], how).drop("_salt")


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column | str],
    n_salts: int,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggs (count + sums):
    groupBy(keys, salt) partial → groupBy(keys) final. The hot key's
    merge work spreads over n_salts reducers in phase 1; phase 2 merges
    n_salts tiny partials per key."""
    # salt from ALL columns: row-level spread even when the group key
    # is the hot column itself
    spread = df.withColumn("_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))
    partial = spread.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_pc"),
        *[
            F.sum(c if isinstance(c, Column) else F.col(c)).alias(f"_ps_{name}")
            for name, c in sum_cols.items()
        ],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pc").alias("cnt"),
        *[F.sum(f"_ps_{name}").alias(name) for name in sum_cols],
    )
