"""Registration-order contract: the driver's correctness gate grades the
FIRST 50 keys of ``queries()`` in dict order (round-1 evidence:
CORRECTNESS_r01.json keys == list(QUERIES)[:50]). These tests pin that
the 50-key window (a) spans every SURVEY.md §2 family, (b) rotates in
keys that have NEVER had a driver row — asserted against the
CORRECTNESS_r0*.json files themselves, not memory (round-3 verdict:
6 of 7 "first-time" keys were in fact round-1-graded because the list
was built from memory), and (c) includes every key whose implementation
changed this round so the new plan earns a fresh driver row."""

from __future__ import annotations

import glob
import inspect
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _prior_round_keys() -> set[str]:
    """Union of every key the driver has ever graded, from data."""
    keys: set[str] = set()
    for path in glob.glob(str(REPO / "CORRECTNESS_r0*.json")):
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
    """VERDICT r03 item 1 'done' criterion: every _ROTATED_IN_R4 and
    _NEW_IN_R4 key is absent from ALL prior CORRECTNESS files (>= 7
    required; we field 37 first-ever keys). This is the regression
    guard that makes a memory-built rotation list impossible: the
    assertion reads the driver's own artifacts."""
    prior = _prior_round_keys()
    rotated = set(registry_loaded._ROTATED_IN_R4) | set(
        registry_loaded._NEW_IN_R4
    )
    assert len(rotated) >= 7
    regraded = rotated & prior
    assert not regraded, f"rotation keys already driver-graded: {sorted(regraded)}"
    assert rotated <= set(_first50(registry_loaded))


def test_changed_impls_stay_in_window(registry_loaded):
    """Keys whose plans change in round 4 — and the round-4-new
    operators — must be graded with the new implementation, not coast
    on a stale green row."""
    changed = {"q_dup_groups", "q_dedup_keep_best", "q_dup_stats", "q_ann_lsh"}
    changed |= set(registry_loaded._NEW_IN_R4)
    assert changed <= set(_first50(registry_loaded))


def test_reorder_is_complete_and_lossless(registry_loaded):
    """Reordering must not drop or duplicate any registered query."""
    keys = list(registry_loaded.QUERIES)
    assert len(keys) == len(set(keys))
    assert set(registry_loaded.ORACLES) <= set(keys)
