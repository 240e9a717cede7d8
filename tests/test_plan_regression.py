"""Full-surface plan-regression gate (VERDICT r07 item 9).

tests/test_plans.py pins the plans rounds explicitly engineered; this
module covers the whole registry: every query's physical plan is
reduced to scale-relevant node counts (shuffles by kind, join
strategies, agg kinds, windows, Python-eval nodes, scans) and compared
against the committed tests/plan_baseline.json. A lost broadcast, an
extra Exchange, or a Python UDF appearing on a previously-JVM-only path
fails here naming the query and the feature that moved — even when no
hand-written assertion covers that query.

When a plan change is INTENTIONAL, regenerate the baseline and commit
the diff alongside the code change:

    python tools/plan_fingerprints.py --update

The fingerprint counts node kinds only (no expression ids, paths, or
partition counts), so it is stable across sessions; the two-fresh-
session determinism check was recorded when the baseline landed.

Isolation (VERDICT r08's one defect): fingerprints DO depend on
session-level cache/persist state — mid-suite, earlier tests
unpersist/rebuild the shared session relations, so the contracted-
grain subtree inlines at every consumer and ~14 queries' node counts
double vs a fresh session. The live collection therefore runs in a
SUBPROCESS with its own SparkSession (the exact standalone path
``tools/plan_fingerprints.py`` uses, and the state the committed
baseline was recorded in), making the gate order-independent: it
passes or fails identically alone and mid-suite. Seeded-regression
proof: breaking a broadcast hint makes the subprocess exit 1 naming
the query and the moved feature (recorded in SURVEY §6).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

BASELINE = Path(__file__).resolve().parent / "plan_baseline.json"
REPO = Path(__file__).resolve().parent.parent


def test_all_query_plans_match_baseline():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "plan_fingerprints.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        "plan drift vs tests/plan_baseline.json (regenerate with "
        "`python tools/plan_fingerprints.py --update` if intentional):\n"
        + proc.stdout
        + proc.stderr[-2000:]
    )


def test_baseline_has_no_python_eval_on_oracled_paths():
    """The baseline itself is an auditable artifact: assert the invariant
    test_plans.py checks live also holds over the committed snapshot, so
    a bad `--update` cannot quietly bless a UDF on an oracled path."""
    from kafka_flink_exactlyonce_example_spark import registry

    registry.load_all()
    base = json.loads(BASELINE.read_text())
    offenders = {
        name: feats
        for name, feats in base.items()
        # "<query>::<stage>" plan-aux entries inherit the owning
        # query's oracled status (ADVICE r08)
        if name.split("::")[0] in registry.ORACLES
        and (feats.get("python_row_udf") or feats.get("python_udtf"))
    }
    assert not offenders, f"row-Python on oracled paths in baseline: {offenders}"


def test_join_type_flip_moves_fingerprint():
    """Seeded red-test for VERDICT r12 item 2: two plans identical
    except for a join TYPE must produce different fingerprints, and
    the diff must NAME the typed feature — the round-12 inner→left
    flip on frozen_top1 was invisible to the untyped counts and had to
    be hand-pinned; this pins the guard hole closed."""
    sys.path.insert(0, str(REPO / "tools"))
    import plan_fingerprints as pf

    inner = (
        "AdaptiveSparkPlan\n"
        "+- SortMergeJoin [icell#5L], [icell#9L], Inner\n"
        "   +- Exchange hashpartitioning(icell#5L, 8)\n"
    )
    left = inner.replace(", Inner", ", LeftOuter")
    fp_i, fp_l = pf.fingerprint(inner), pf.fingerprint(left)
    # untyped counts are blind to the flip — the r12 hole, reproduced
    assert fp_i["sort_merge_join"] == fp_l["sort_merge_join"] == 1
    assert fp_i != fp_l
    assert fp_i.get("sort_merge_join:Inner") == 1
    assert fp_l.get("sort_merge_join:LeftOuter") == 1
    drift = pf.diff({"q": fp_i}, {"q": fp_l})
    assert len(drift) == 1 and "q: " in drift[0]
    assert "sort_merge_join:Inner" in drift[0]
    assert "sort_merge_join:LeftOuter" in drift[0]


def test_baseline_typed_join_counts_are_consistent():
    """Every typed-join node in the committed baseline must carry a
    join-type tag: per query and strategy, the untyped count equals
    the sum of its typed counts — a plan line the type regex failed to
    parse would silently re-open the join-type blind spot."""
    sys.path.insert(0, str(REPO / "tools"))
    from plan_fingerprints import _JOIN_STRATEGY_SNAKE

    base = json.loads(BASELINE.read_text())
    for name, feats in base.items():
        for snake in _JOIN_STRATEGY_SNAKE.values():
            typed = sum(
                v for k, v in feats.items() if k.startswith(f"{snake}:")
            )
            assert typed == feats.get(snake, 0), (
                f"{name}: {snake} has {feats.get(snake, 0)} nodes but "
                f"{typed} typed tags — a join type went unparsed"
            )
