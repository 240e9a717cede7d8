"""Plan-regression baseline: one scale-relevant fingerprint per graded
query (VERDICT r07 item 9's "plan-regression CI").

The hand-written assertions in tests/test_plans.py pin the ~45 plans a
round explicitly touched; this tool closes the gap for the OTHER ~210:
it reduces every registered query's physical plan to the counts that
matter at 100 TB — how many shuffles, which join strategies, whether
Python eval appeared, whether a Window runs unpartitioned — and writes
them to tests/plan_baseline.json. tests/test_plan_regression.py
recomputes the same fingerprints and diffs, so an accidental plan
regression (a lost broadcast, a new Exchange, a UDF sneaking onto an
oracled path) fails the suite naming the query and the feature that
moved, even when no hand-written assertion covers that query.

The fingerprint counts NODE KINDS, not plan text: expression IDs, file
paths, and partition counts never enter it, so it is stable across
sessions and machines for a fixed query tree. Session-level shared
relations (the shingle/band/sign caches) appear as InMemoryRelation
nodes in the analyzed-but-unmaterialized plan exactly as in the
materialized one, so cache build order does not move the counts.

Usage:
    python tools/plan_fingerprints.py            # verify vs baseline
    python tools/plan_fingerprints.py --update   # regenerate baseline
Exit 1 on drift in verify mode, printing a per-query feature diff.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASELINE = REPO / "tests" / "plan_baseline.json"
SF_DIR = "/root/testdata/sf0.001"

#: feature name -> regex counted over the simple-mode physical plan.
#: Only node KINDS that change the 100 TB story; nothing that encodes
#: expression ids, partition counts, or paths.
FEATURES: dict[str, re.Pattern[str]] = {
    "exchange_hash": re.compile(r"Exchange hashpartitioning"),
    "exchange_rr": re.compile(r"Exchange RoundRobinPartitioning"),
    "exchange_range": re.compile(r"Exchange rangepartitioning"),
    "exchange_single": re.compile(r"Exchange SinglePartition"),
    "broadcast_exchange": re.compile(r"BroadcastExchange"),
    "sort_merge_join": re.compile(r"SortMergeJoin"),
    "broadcast_hash_join": re.compile(r"BroadcastHashJoin"),
    "shuffled_hash_join": re.compile(r"ShuffledHashJoin"),
    "broadcast_nl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "cartesian": re.compile(r"CartesianProduct"),
    "hash_agg": re.compile(r"HashAggregate"),
    "object_hash_agg": re.compile(r"ObjectHashAggregate"),
    "sort_agg": re.compile(r"SortAggregate"),
    "window": re.compile(r"\bWindow\b(?! ?GroupLimit)"),
    "window_group_limit": re.compile(r"WindowGroupLimit"),
    "take_ordered": re.compile(r"TakeOrderedAndProject"),
    "global_limit": re.compile(r"GlobalLimit"),
    "generate": re.compile(r"\bGenerate\b"),
    "expand": re.compile(r"\bExpand\b"),
    "python_row_udf": re.compile(r"BatchEvalPython"),
    "python_arrow_udf": re.compile(r"ArrowEvalPython"),
    "pandas_group_map": re.compile(r"FlatMapGroupsInPandas"),
    "pandas_map": re.compile(r"\bMapInPandas"),
    "python_udtf": re.compile(r"BatchEvalPythonUDTF"),
    "parquet_scan": re.compile(r"Scan parquet"),
    "cache_scan": re.compile(r"InMemoryTableScan|Scan ExistingRDD"),
}

#: Join-TYPE-aware counts (round 13, VERDICT r12 item 2): the round-12
#: inner→left flip on frozen_top1 left every count above byte-identical
#: — the gate could not see it and the consumers had to be hand-pinned
#: via _CHANGED_IN_ROUND. Each typed-join physical node prints its join
#: type on the same line (e.g. ``SortMergeJoin [k], [k], LeftOuter``;
#: ExistenceJoin prints as ``ExistenceJoin(exists#N)``), so the
#: fingerprint now also carries ``<strategy>:<JoinType>`` counts and a
#: join-type change moves the fingerprint even when the per-strategy
#: totals do not. Seeded red-test:
#: tests/test_plan_regression.py::test_join_type_flip_moves_fingerprint.
_JOIN_STRATEGY_SNAKE = {
    "SortMergeJoin": "sort_merge_join",
    "BroadcastHashJoin": "broadcast_hash_join",
    "ShuffledHashJoin": "shuffled_hash_join",
    "BroadcastNestedLoopJoin": "broadcast_nl_join",
}
_JOIN_TYPED_RX = re.compile(
    r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin)[^\n]*?"
    r"\b(Inner|FullOuter|LeftOuter|RightOuter|LeftSemi|LeftAnti|Cross|"
    r"ExistenceJoin)\b"
)


def fingerprint(plan: str) -> dict[str, int]:
    counts = {name: len(rx.findall(plan)) for name, rx in FEATURES.items()}
    for strategy, jtype in _JOIN_TYPED_RX.findall(plan):
        key = f"{_JOIN_STRATEGY_SNAKE[strategy]}:{jtype}"
        counts[key] = counts.get(key, 0) + 1
    return {k: v for k, v in counts.items() if v}


def compute_all() -> dict[str, dict[str, int]]:
    from kafka_flink_exactlyonce_example_spark import registry
    from kafka_flink_exactlyonce_example_spark.plans import plan_string
    from kafka_flink_exactlyonce_example_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        app_name="plan-fingerprints", master="local[8]", shuffle_partitions=8
    )
    out: dict[str, dict[str, int]] = {}
    for name in sorted(registry.QUERIES):
        df = registry.QUERIES[name](spark, SF_DIR)
        out[name] = fingerprint(plan_string(df, mode="simple"))
    # plan-aux relations (registry.PLAN_AUX): lazy data-touching stages
    # a query's returned frame hides behind a licensed driver-side
    # collect — fingerprinted explicitly so the gate keeps sight of
    # them (ADVICE r08: q_pca_power's moments scan).
    for name in sorted(registry.PLAN_AUX):
        df = registry.PLAN_AUX[name](spark, SF_DIR)
        out[name] = fingerprint(plan_string(df, mode="simple"))
    spark.stop()
    return out


def diff(
    base: dict[str, dict[str, int]], now: dict[str, dict[str, int]]
) -> list[str]:
    lines: list[str] = []
    for name in sorted(set(base) | set(now)):
        b, n = base.get(name), now.get(name)
        if b is None:
            lines.append(f"{name}: NEW query (not in baseline) {n}")
        elif n is None:
            lines.append(f"{name}: REMOVED from registry (baseline {b})")
        elif b != n:
            feats = sorted(set(b) | set(n))
            moved = [
                f"{f}: {b.get(f, 0)}->{n.get(f, 0)}"
                for f in feats
                if b.get(f, 0) != n.get(f, 0)
            ]
            lines.append(f"{name}: " + ", ".join(moved))
    return lines


def main() -> None:
    now = compute_all()
    if "--update" in sys.argv:
        BASELINE.write_text(json.dumps(now, indent=1, sort_keys=True) + "\n")
        print(f"wrote {BASELINE} ({len(now)} queries)")
        return
    base = json.loads(BASELINE.read_text())
    drift = diff(base, now)
    if drift:
        print(f"PLAN DRIFT in {len(drift)} queries:")
        print("\n".join(drift))
        sys.exit(1)
    print(f"plans stable: {len(now)} queries match baseline")


if __name__ == "__main__":
    main()
