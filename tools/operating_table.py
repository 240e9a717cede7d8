"""Regenerate the ANN planner's operating table from the graded
instruments — the derivation the catalog's provenance claim names.

`simsearch._ANN_OPERATING_TABLE` ships engine-graded sf0.1 rows and
its docstring promises "a deployment regenerates it with the same
instrument queries on its own corpus". This tool IS that
regeneration: it runs the instruments (the q_ivf_nprobe_sweep audit
for the ivf rows, `_mp_recall_frame` at the two graded H1 bit depths
for the mp rows) at the given sf dir and derives each catalog row the
way the shipped constants were derived —

- ivf:  recall = Σn_hit / (|panel|·K) at 3 dp, HALF-UP in exact
        integer arithmetic (57/240 = .2375 is a half-way case a float
        round() would send to .237 — the shipped row says .238),
        cand/probe = ⌈Σn_cand / |panel|⌉   (the sweep docstring's
        "Σcand over the 24-probe panel / 24, rounded up"),
- mp:   recall as above,
        cand/probe = round(mean n_cand)    (the frontier's
        "0.938 @ 1198.4" convention).

Usage:
    python tools/operating_table.py [sf_dir]     # verify vs shipped
    python tools/operating_table.py [sf_dir] --print   # just print

Exit 1 in verify mode if the regenerated rows differ from the shipped
catalog — which is exactly what SHOULD happen on a different corpus:
the planner logic never changes, only the rows. The provenance test
(tests/test_operating_table.py) runs this at sf0.1, where the rows
must match the shipped constants bit-for-bit.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_SF = "/root/testdata/sf0.1"

#: The graded ivf probe depths and mp bit depths — the catalog's rows.
IVF_NPROBES = (1, 2, 4, 6)
MP_BITS = (7, 6)


# ONE definition (round 15): the half-up 3-dp recall convention moved
# to the package so the generation-level derivation
# (lifecycle.derive_generation_table) and this fixture-level tool can
# never drift.
from kafka_flink_exactlyonce_example_spark.lifecycle import _recall_3dp  # noqa: E402


def derive(spark, sf_dir: str) -> tuple[tuple[str, int, float, int], ...]:
    """Regenerate the (kind, param, recall, cand/probe) rows from the
    live instruments, cheapest-first (the catalog's invariant)."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch as ss

    panel, k = ss._RECALL_PROBES, ss._RECALL_K
    rows: list[tuple[str, int, float, int]] = []
    for nprobe in IVF_NPROBES:
        agg = (
            ss._ivf_recall_frame(spark, sf_dir, nprobe)
            .groupBy()
            .sum("n_cand", "n_hit")
            .first()
        )
        rows.append(
            (
                "ivf",
                nprobe,
                _recall_3dp(int(agg[1]), panel * k),
                -(-int(agg[0]) // panel),
            )
        )
    for bits in MP_BITS:
        agg = (
            ss._mp_recall_frame(spark, sf_dir, bits)
            .groupBy()
            .sum("n_cand", "n_hit")
            .first()
        )
        rows.append(
            (
                "mp",
                bits,
                _recall_3dp(int(agg[1]), panel * k),
                (2 * int(agg[0]) + panel) // (2 * panel),
            )
        )
    return tuple(sorted(rows, key=lambda r: r[3]))


def derive_filtered_floor(spark, sf_dir: str) -> float:
    """Regenerate `_FILTERED_IVF_RECALL_FLOOR`: the minimum 3-dp
    recall over the q_filtered_sweep tiers the crossover rule routes
    to ivf — the only recall the composed planner may PROMISE for
    post-filter IVF (its docstring's provenance claim)."""
    from kafka_flink_exactlyonce_example_spark import registry

    registry.load_all()
    rows = registry.QUERIES["q_filtered_sweep"](spark, sf_dir).collect()
    ivf = [r for r in rows if r["route"] == "ivf"]
    assert ivf, "no ivf-routed tier in the sweep — floor undefined"
    return min(_recall_3dp(r["n_hit"], r["n_true"]) for r in ivf)


def main() -> None:
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _ANN_OPERATING_TABLE,
        _FILTERED_IVF_RECALL_FLOOR,
    )
    from kafka_flink_exactlyonce_example_spark.session import get_spark

    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = positional[0] if positional else DEFAULT_SF
    spark = get_spark(
        app_name="operating-table", master="local[8]", shuffle_partitions=8
    )
    rows = derive(spark, sf_dir)
    floor = derive_filtered_floor(spark, sf_dir)
    spark.stop()
    print("_ANN_OPERATING_TABLE = (")
    for r in rows:
        print(f"    {r!r},")
    print(")")
    print(f"_FILTERED_IVF_RECALL_FLOOR = {floor}")
    if "--print" in sys.argv:
        return
    ok = True
    if rows != _ANN_OPERATING_TABLE:
        print("MISMATCH vs shipped catalog:")
        print(f"  shipped:     {_ANN_OPERATING_TABLE}")
        print(f"  regenerated: {rows}")
        ok = False
    if floor != _FILTERED_IVF_RECALL_FLOOR:
        print(
            f"MISMATCH floor: shipped {_FILTERED_IVF_RECALL_FLOOR}, "
            f"regenerated {floor}"
        )
        ok = False
    if not ok:
        sys.exit(1)
    print("regenerated rows and floor match the shipped catalog")


if __name__ == "__main__":
    main()
