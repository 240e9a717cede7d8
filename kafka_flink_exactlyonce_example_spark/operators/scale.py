"""Distributed global-order primitives — the scale path for queries that
need a TOTAL ordering of an unbounded grain (customers, parts).

A bare ``Window.orderBy(...)`` with no partition key is correct but
single-partition: Spark warns ``WindowExec: No Partition Defined`` and
one task sorts everything. Fine on a 30-row day spine; not fine on a
customer grain that grows with the dataset. These helpers implement the
classic two-pass alternative, fully parallel end to end:

1. ``repartitionByRange(P, keys)`` — range shuffle puts partition *i*'s
   keys wholly before partition *i+1*'s (per the requested ordering),
   with an explicit ``P`` so AQE never re-plans it mid-pattern. The
   result is PERSISTED (lazy, memory-and-disk): the pattern has 3-4
   consumers (local windows, per-partition totals, grand totals) and
   measured plans showed zero exchange reuse across those branches —
   without the persist each consumer would re-run the upstream fact
   scan + contraction. The persisted relation is the contracted grain,
   orders of magnitude smaller than the fact table it came from.
2. A window partitioned by ``spark_partition_id()`` computes LOCAL
   row_numbers / prefix sums — P parallel sorts of ~rows/P each.
3. Per-partition totals (a P-row aggregate) turn into EXCLUSIVE prefix
   offsets via a triangular join on the P-row relation (no window, so
   no single-partition warning even on the tiny side), broadcast back,
   and added to the local values.

Global row_number = local + offset; global prefix sum likewise. A
global ``ntile(k)`` follows from the exact ANSI piecewise form (first
``N mod k`` buckets take ``N div k + 1`` rows, the rest ``N div k`` —
the same rule Spark and DuckDB implement; see :func:`global_ntile`),
so the oracle keeps using plain ``ntile`` while the Spark side stays
parallel.

Reference parity note: the reference (a ~150-line Flink word-count demo,
SURVEY.md §0 ``[R]``) has no global-sort surface; this module exists for
the 100 TB posture of the mandated analytics extensions.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Every relation ordered_scan persists, so long-lived services can
# release them: each call appends here, and unpersist_all() drains the
# list. One-shot jobs (bench, crosscheck, tests) can ignore this — the
# blocks die with the session — but without it repeated invocations in
# one session accumulate MEMORY_AND_DISK blocks indefinitely.
_PERSISTED: list[DataFrame] = []


def unpersist_all() -> int:
    """Unpersist every relation ordered_scan has cached; return count."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def widen_small_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across every core before a CPU-heavy
    map stage (per-row md5 chains, higher-order-function dot products,
    position explodes).

    Why this exists: Spark splits files by ``maxPartitionBytes``, but a
    parquet file smaller than one split — and any file, at row-group
    granularity — arrives as ONE task. A heavy map stage planned on top
    of it then runs single-threaded no matter how many cores the
    cluster has (measured: the LSH sign build at sf0.1 was 8.7 s on one
    task, 0.8 s after widening to 32). At 100 TB every scan already has
    ≥ defaultParallelism splits, the branch is false, and NO shuffle is
    added — this is a small-input parallelization guard, not a scale
    crutch. Round-robin repartition is partition-count-deterministic
    (Spark sorts batch-locally before distributing), and every consumer
    below it is either per-row or key-aggregated, so results do not
    depend on the redistribution."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def ordered_scan(
    df: DataFrame,
    order_exprs: list[Column],
    sums: dict[str, Column] | None = None,
    rn: str | None = "_rn",
    totals_of: dict[str, Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach global-order columns to ``df`` without a global window.

    ``order_exprs`` must define a TOTAL order (include a unique
    tie-break key — same discipline the single-node form needed for
    engine-identical results). Adds:

    - ``rn``: global 1-based row_number in that order (skip if None);
    - one column per ``sums`` entry: the global inclusive prefix sum of
      that expression in that order;
    - one column per ``totals_of`` entry: a grand-total AGGREGATE
      expression (e.g. ``F.sum("x")``, ``F.count(F.lit(1))``) evaluated
      over all rows and broadcast onto every row — computed from the
      persisted scan, not from a second pass over the input lineage.
    """
    sums = sums or {}
    totals_of = totals_of or {}
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )

    part = (
        df.repartitionByRange(num_partitions, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PERSISTED.append(part)
    w = Window.partitionBy("_pid").orderBy(*order_exprs)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    local = part.select(
        "*",
        F.row_number().over(w).alias("_lrn"),
        *[F.sum(c).over(wcum).alias(f"_lcum_{name}") for name, c in sums.items()],
    )

    totals = part.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_t_rn"),
        *[F.sum(c).alias(f"_t_{name}") for name, c in sums.items()],
    )
    # exclusive prefix over the P-row totals: triangular join, not a
    # window — P² pairs with P = shuffle partitions is trivial and keeps
    # the whole pattern warning-free.
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(b, F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._t_rn"), F.lit(0)).alias("_off_rn"),
            *[
                F.coalesce(F.sum(f"b._t_{name}"), F.lit(0)).alias(f"_off_{name}")
                for name in sums
            ],
        )
    )
    out = local.join(F.broadcast(offsets), "_pid")

    proj = [F.col(c) for c in df.columns]
    if rn is not None:
        proj.append((F.col("_lrn") + F.col("_off_rn")).alias(rn))
    for name in sums:
        # coalesce the LOCAL cumulative to 0 so an all-NULL prefix inside
        # one range partition still picks up the earlier partitions' sum
        # (a global window ignores NULLs, so its running sum there is the
        # prior partitions' total, not NULL). Known residual difference:
        # if EVERY value in the whole prefix is NULL the global window
        # yields NULL where this yields 0.
        proj.append(
            (F.coalesce(F.col(f"_lcum_{name}"), F.lit(0)) + F.col(f"_off_{name}")).alias(
                name
            )
        )
    out = out.select(*proj)

    if totals_of:
        grand = part.agg(
            *[expr.alias(name) for name, expr in totals_of.items()]
        )
        out = out.crossJoin(F.broadcast(grand))
    return out


def global_ntile(
    df: DataFrame,
    order_exprs: list[Column],
    k: int,
    out: str,
    totals_of: dict[str, Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``ntile(k)`` in the given total order, no global window.

    Uses the exact ANSI piecewise form. With ``N = q*k + r`` the first
    ``r`` buckets get ``q+1`` rows and the rest ``q`` (the rule both
    Spark's and DuckDB's ``ntile`` implement), so with ``T = (q+1)*r``:

    - ``rn <= T``  → ``ceil(rn / (q+1)) = (rn + q) div (q+1)``
    - ``rn  > T``  → ``r + ceil((rn - T) / q)``

    (The simpler ``floor((rn-1)*k/N) + 1`` identity an earlier round
    used is NOT ntile once ``N mod k >= 2`` — it spreads the remainder
    rows over alternating buckets instead of the first ``r``; caught by
    the sf0.001 parity run where N=150, k=4 puts row 76 in bucket 3
    instead of ANSI's bucket 2.) All arithmetic is integer ``div``/
    ``%``, exact at any N; when ``N < k`` the first branch always takes
    (``T = N``) and yields ``bucket = rn``, matching ANSI, so the
    ``q = 0`` division in the untaken ELSE never evaluates.

    ``totals_of`` passes through to :func:`ordered_scan` for callers
    that also need grand totals (computed from the same persisted scan).
    """
    all_totals = {"_n_total": F.count(F.lit(1))}
    all_totals.update(totals_of or {})
    scanned = ordered_scan(
        df,
        order_exprs,
        rn="_rn",
        totals_of=all_totals,
        num_partitions=num_partitions,
    )
    kk = int(k)
    tile = F.expr(
        f"CASE WHEN _rn <= ((_n_total div {kk}) + 1) * (_n_total % {kk}) "
        f"THEN (_rn + (_n_total div {kk})) div ((_n_total div {kk}) + 1) "
        f"ELSE (_n_total % {kk}) "
        f"  + (_rn - ((_n_total div {kk}) + 1) * (_n_total % {kk}) "
        f"     + (_n_total div {kk}) - 1) div (_n_total div {kk}) "
        f"END"
    ).cast("long")
    keep = [F.col(c) for c in df.columns] + [tile.alias(out)]
    keep += [F.col(name) for name in (totals_of or {})]
    return scanned.select(*keep)
