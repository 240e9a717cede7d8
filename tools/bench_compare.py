"""Compare two (or more) BENCH_FULL maps with the noise-band
discipline built in (SURVEY §6: sub-second queries swing ±60–96% on
this sandbox, multi-second ones ±0.3–1.3 s, and whole-run totals moved
228.9 → 278.4 s across four same-code runs under host-side load).

Given N bench files, the LAST is the candidate and the others are the
baseline pool: each query's baseline is the MEDIAN across the pool,
and a move is flagged only when it clears BOTH the relative band and
an absolute floor — so single-run jitter doesn't read as a regression
and a real one isn't hidden inside a noisy total.

Usage:
    python tools/bench_compare.py BENCH_FULL_r08.json BENCH_FULL.json
    python tools/bench_compare.py run1.json run2.json run3.json candidate.json

Exit 0 always (informational — the plan-regression gate is the
enforced one; timing on this sandbox is advisory by policy).
"""

from __future__ import annotations

import json
import statistics
import sys

#: flag only moves that clear BOTH bounds (either direction)
REL_BAND = 0.6   # ±60% — the measured sub-second swing floor
ABS_FLOOR = 1.0  # seconds — the measured multi-second swing band


def load(path: str) -> dict[str, float]:
    d = json.loads(open(path).read())
    out = dict(d.get("queries", {}))
    # cache line items (present since round 9) compare like queries
    for k, v in d.get("caches", {}).items():
        out[f"cache:{k}"] = v
    return out


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        print(__doc__)
        sys.exit(0)
    pool = [load(p) for p in paths[:-1]]
    cand = load(paths[-1])
    keys = sorted(set(cand) | {k for m in pool for k in m})
    moved: list[tuple[float, str, float, float]] = []
    for k in keys:
        base_vals = [m[k] for m in pool if k in m]
        if not base_vals or k not in cand:
            status = "NEW" if k in cand else "GONE"
            print(f"{status:10s} {k}")
            continue
        base = statistics.median(base_vals)
        now = cand[k]
        delta = now - base
        if abs(delta) >= ABS_FLOOR and abs(delta) >= REL_BAND * max(base, 1e-9):
            moved.append((delta, k, base, now))
    # totals compare ONLY keys present on both sides (round-10 ADVICE:
    # missing-as-0.0 medians dragged the baseline down for keys absent
    # from some pool runs — e.g. cache: items pre-round-9 — while the
    # candidate total summed everything, an asymmetric headline). NEW
    # and GONE key totals print separately so nothing hides.
    shared = [k for k in keys if k in cand and any(k in m for m in pool)]
    tot_base = sum(
        statistics.median([m[k] for m in pool if k in m]) for k in shared
    )
    tot_now = sum(cand[k] for k in shared)
    new_tot = sum(v for k, v in cand.items() if k not in shared)
    gone_tot = sum(
        statistics.median([m[k] for m in pool if k in m])
        for k in keys
        if k not in cand
    )
    print(
        f"total over {len(shared)} shared keys: baseline-median "
        f"{tot_base:.1f}s -> candidate {tot_now:.1f}s "
        f"({len(pool)} baseline run(s)); "
        f"NEW keys add {new_tot:.1f}s, GONE keys dropped {gone_tot:.1f}s"
    )
    if not moved:
        print("no per-query move clears the noise band "
              f"(|Δ| >= {ABS_FLOOR}s AND >= {REL_BAND:.0%} of baseline)")
        return
    for delta, k, base, now in sorted(moved):
        print(f"{'-' if delta < 0 else '+'}{abs(delta):5.2f}s  {k}: "
              f"{base:.2f} -> {now:.2f}")


if __name__ == "__main__":
    main()
