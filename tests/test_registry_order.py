"""Registration-order contract: the driver's correctness gate grades the
FIRST 50 keys of ``queries()`` in dict order (round-1 evidence:
CORRECTNESS_r01.json keys == list(QUERIES)[:50]). These tests pin that
the 50-key window (a) spans every SURVEY.md §2 family, (b) rotates in
keys that have NEVER had a driver row — asserted against the
CORRECTNESS files of rounds STRICTLY BEFORE ``registry._ROTATION_ROUND``
(the round-4 guard globbed ALL r0*.json and failed against its own
round's just-landed artifact, VERDICT r04 item 1 — scoping by the
declared rotation round makes the guard survive the round it protects),
and (c) includes every key whose implementation changed this round so
the new plan earns a fresh driver row. A fourth contract (VERDICT r04
item 7): ``_ROTATION_BACKLOG`` + this round's first-ever keys must
exactly partition the never-graded set, so each future rotation is a
mechanical pop from the backlog."""

from __future__ import annotations

import glob
import inspect
import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def _graded_keys_before(round_no: int) -> set[str]:
    """Union of every key the driver graded in rounds < round_no, from
    the driver's own artifacts (never from memory — round-3 lesson)."""
    keys: set[str] = set()
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and int(m.group(1)) < round_no:
            keys.update(json.load(open(path)))
    return keys


def _first50(registry_loaded):
    return list(registry_loaded.QUERIES)[:50]


def test_priority_applied_exactly(registry_loaded):
    assert _first50(registry_loaded) == list(registry_loaded._PRIORITY)
    assert len(registry_loaded._PRIORITY) == 50
    assert len(set(registry_loaded._PRIORITY)) == 50


def test_first50_spans_every_family(registry_loaded):
    mods = {
        inspect.unwrap(registry_loaded.QUERIES[k]).__module__.rsplit(".", 1)[-1]
        for k in _first50(registry_loaded)
    }
    # one module per SURVEY §2 family that must appear in the window
    required = {
        "wordcount",  # §2.1 reference core
        "relational",  # §2.2
        "joins",  # §2.3
        "aggregates",  # §2.4
        "windows",  # §2.5
        "sortlimit",  # §2.6
        "setops",  # §2.7
        "scalar",  # §2.8
        "streaming_batch",  # §2.9
        "dedup",  # §2.10 dedup
        "simsearch",  # §2.10 ANN
        "textstats",  # §2.10 text/quality/tokenize
        "multimodal",  # §2.10 multimodal
        "pipeline",  # §2.10 end-to-end curation
        "udf_demo",  # §2.11
    }
    assert required <= mods, f"families missing from window: {required - mods}"


def test_rotated_keys_are_first_ever(registry_loaded):
    """Every _ROTATED_IN_R6 key is absent from ALL CORRECTNESS files of
    rounds before _ROTATION_ROUND (>= 35 required by VERDICT r05 item
    1's done criterion; we field 37). Reading the driver's artifacts —
    scoped to prior rounds only — keeps a memory-built rotation list
    impossible without flagging the guard's own success."""
    prior = _graded_keys_before(registry_loaded._ROTATION_ROUND)
    rotated = set(registry_loaded._ROTATED_IN_R6)
    assert len(rotated) >= 35
    regraded = rotated & prior
    assert not regraded, f"rotation keys already driver-graded: {sorted(regraded)}"
    assert rotated <= set(_first50(registry_loaded))


def test_changed_impls_stay_in_window(registry_loaded):
    """Keys whose plans change in round 6 (the round-5 ADVICE fixes,
    the histogram-CDF percentile conversions, the semdedup session
    cache, the basket_pairs persist registration) must be graded with
    the new implementation, not coast on a stale green row."""
    changed = {
        "q_ks_test",
        "q_vocab_overlap",
        "q_calibration_bins",
        "q_auc",
        "q_skew_diag",
        "q_interarrival",
        "q_conversion_lag",
        "q_semdedup",
        "q_basket_pairs",
        # integer-exact hardening after the sf0.1 deep check (1-ulp
        # half-way divergences): micro-unit interpolation, cents money
        "q_interpolate",
        "q_rfm",
    }
    assert changed <= set(_first50(registry_loaded))


def test_backlog_partitions_never_graded_set(registry_loaded):
    """_ROTATION_BACKLOG ∪ _ROTATED_IN_R6 == the never-driver-graded
    keys (computed from the prior rounds' artifacts), with no overlap
    and no duplicates — so round 7's window is a mechanical pop."""
    prior = _graded_keys_before(registry_loaded._ROTATION_ROUND)
    never = {k for k in registry_loaded.QUERIES if k not in prior}
    rotated = set(registry_loaded._ROTATED_IN_R6)
    backlog = list(registry_loaded._ROTATION_BACKLOG)
    assert len(backlog) == len(set(backlog))
    assert not (set(backlog) & rotated), "backlog overlaps this round's window"
    assert set(backlog) | rotated == never, (
        f"partition mismatch: missing={sorted(never - rotated - set(backlog))} "
        f"extra={sorted((rotated | set(backlog)) - never)}"
    )


def test_reorder_is_complete_and_lossless(registry_loaded):
    """Reordering must not drop or duplicate any registered query."""
    keys = list(registry_loaded.QUERIES)
    assert len(keys) == len(set(keys))
    assert set(registry_loaded.ORACLES) <= set(keys)
