"""Registration-order contract: the driver's correctness gate grades the
FIRST 50 keys of ``queries()`` in dict order (round-1 evidence:
CORRECTNESS_r01.json keys == list(QUERIES)[:50]).

Since round 8 the window is DERIVED (``registry.derive_window``) from
the driver's on-disk CORRECTNESS artifacts + two declared inputs
(``_CHANGED_IN_ROUND``, ``_BACKLOG_ORDER``) — round 7 proved a
hand-listed tuple desynchronizes from a hand-bumped counter (the bump
landed, the rotation didn't, and the driver re-graded round 6's exact
50 keys; VERDICT r07 headline). These tests therefore verify the
PROPERTIES of the derivation rather than a per-round key list:

(a) the applied order is exactly the derivation's output;
(b) the window guarantees ``min(40, |never-graded|)`` first-ever keys,
    so the backlog drains at >= 40/round until empty;
(c) every changed-this-round key is in the window (new plans re-earn
    driver rows instead of coasting on stale greens);
(d) family span: every `_FAMILY_KEEP_PRIORITY` family is covered unless
    the window is genuinely full of higher-priority keys, and only the
    lowest-priority families are dropped;
(e) the derived round number tracks the artifacts on disk, so a new
    CORRECTNESS file rotates the window automatically — no counter to
    forget.
"""

from __future__ import annotations

import glob
import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def _max_artifact_round() -> int:
    rounds = [0]
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def _first50(registry_loaded):
    return list(registry_loaded.QUERIES)[:50]


def test_round_derived_from_artifacts(registry_loaded):
    """No hand-bumped counter: the round is 1 + the newest CORRECTNESS
    artifact, so the driver landing round N's file auto-rotates round
    N+1's window."""
    assert registry_loaded.rotation_round() == _max_artifact_round() + 1


def test_window_applied_exactly(registry_loaded):
    window = _first50(registry_loaded)
    assert window == registry_loaded.derive_window()
    assert len(window) == registry_loaded._WINDOW_SIZE == 50
    assert len(set(window)) == 50
    assert window[0] == "q_wordcount"


def test_graded_before_reads_only_prior_rounds(registry_loaded):
    """The round-4 lesson: the first-ever guard must ignore the current
    round's own artifact once the driver lands it."""
    current = registry_loaded.rotation_round()
    prior = registry_loaded.graded_before(current)
    everything = registry_loaded.graded_before(current + 1)
    # keys graded in the newest artifact are excluded from `prior` when
    # that artifact belongs to the current round, included otherwise
    assert prior <= everything


def test_window_min_first_ever(registry_loaded):
    """>= min(40, |never-graded|) first-ever keys per round — the drain
    rate VERDICT r07 item 1 requires (55 -> <=15 after r08 -> 0 after
    r09)."""
    prior = registry_loaded.graded_before()
    never = {k for k in registry_loaded.QUERIES if k not in prior}
    window = set(_first50(registry_loaded))
    target = min(registry_loaded._MIN_FIRST_EVER, len(never))
    assert len(window & never) >= target, (
        f"only {len(window & never)} first-ever keys in window, "
        f"need {target}"
    )


def test_changed_impls_stay_in_window(registry_loaded):
    """Keys whose plans changed this round must be graded with the new
    implementation, not coast on a stale green row."""
    assert registry_loaded.changed_in() <= set(_first50(registry_loaded))


def test_family_span_or_backlog_pressure(registry_loaded):
    """Every family is covered when slots allow; under backlog pressure
    only the lowest-priority tail (rows-only smoke families) may drop,
    and then the window must actually be full of first-ever keys."""
    window = _first50(registry_loaded)
    covered = {
        registry_loaded._module_of(registry_loaded.QUERIES[k]) for k in window
    }
    required = [
        fam
        for fam in registry_loaded._FAMILY_KEEP_PRIORITY
        if any(
            registry_loaded._module_of(fn) == fam
            for fn in registry_loaded.QUERIES.values()
        )
    ]
    missing = [fam for fam in required if fam not in covered]
    if missing:
        # keeps are handed out in priority order, so a family may only
        # be dropped if every family that DID get a keep slot ranks
        # higher — pops/changed cover families out of order, which is
        # fine; the keep budget itself must never skip a priority.
        prior = registry_loaded.graded_before()
        never = {k for k in registry_loaded.QUERIES if k not in prior}
        changed = registry_loaded.changed_in()
        keep_keys = [
            k for k in window
            if k != "q_wordcount" and k not in never and k not in changed
        ]
        idx = {fam: i for i, fam in enumerate(required)}
        keep_fams = {
            registry_loaded._module_of(registry_loaded.QUERIES[k])
            for k in keep_keys
        }
        worst_keep = max((idx[f] for f in keep_fams if f in idx), default=-1)
        best_missing = min(idx[f] for f in missing)
        assert worst_keep < best_missing, (
            f"family {required[best_missing]} dropped while lower-priority "
            f"families kept: {sorted(keep_fams)}"
        )
        # …and only because the window genuinely filled with first-ever
        # + changed keys
        target = min(registry_loaded._MIN_FIRST_EVER, len(never))
        assert len(set(window) & never) >= target


def test_backlog_order_covers_never_graded(registry_loaded):
    """_BACKLOG_ORDER has no duplicates, and every never-graded key is
    either listed in it or a future addition (handled by the derivation's
    sorted append) — so the drain order is total and deterministic."""
    backlog = list(registry_loaded._BACKLOG_ORDER)
    assert len(backlog) == len(set(backlog))
    prior = registry_loaded.graded_before()
    never = {k for k in registry_loaded.QUERIES if k not in prior}
    unlisted = never - set(backlog)
    # every unlisted never-graded key would be appended sorted; listing
    # is preferred but the derivation tolerates additions. Pin today's
    # state: the round-7 backlog is fully listed.
    assert unlisted == set(), f"add new keys to _BACKLOG_ORDER: {sorted(unlisted)}"


def test_reorder_is_complete_and_lossless(registry_loaded):
    """Reordering must not drop or duplicate any registered query."""
    keys = list(registry_loaded.QUERIES)
    assert len(keys) == len(set(keys))
    assert set(registry_loaded.ORACLES) <= set(keys)


def test_next_round_auto_rotation_preview(registry_loaded):
    """The whole point of the derivation: when the driver lands the
    current round's artifact, the NEXT round's window must pop the
    entire leftover backlog with no hand edit (round-9 instance of this
    test proved the 16-key final pop; generalized once the backlog
    drained). Simulated by injecting the would-be graded set."""
    cur = registry_loaded.rotation_round()
    this_window = registry_loaded.derive_window()
    prior_next = registry_loaded.graded_before() | set(this_window)
    nxt = registry_loaded.derive_window(round_no=cur + 1, prior=prior_next)
    leftovers = {k for k in registry_loaded.QUERIES if k not in prior_next}
    assert leftovers <= set(nxt), (
        f"round {cur + 1} would strand never-graded keys: "
        f"{sorted(leftovers - set(nxt))}"
    )
    assert len(nxt) == 50
    # with the backlog drained, the family span is fully restored
    covered = {
        registry_loaded._module_of(registry_loaded.QUERIES[k]) for k in nxt
    }
    required = {
        fam
        for fam in registry_loaded._FAMILY_KEEP_PRIORITY
        if any(
            registry_loaded._module_of(fn) == fam
            for fn in registry_loaded.QUERIES.values()
        )
    }
    assert required <= covered, (
        f"round {cur + 1} misses families: {required - covered}"
    )


def test_changed_in_is_round_scoped(registry_loaded):
    """ADVICE r08: a past round's changed-keys entry must be inert —
    deriving a LATER round's window ignores it, so a forgotten hand
    edit can only under-pin, never permanently over-pin."""
    assert registry_loaded.changed_in(8) == registry_loaded._CHANGED_IN_ROUND[8]
    # rounds with no entry pin nothing
    assert registry_loaded.changed_in(9999) == frozenset()
    # the round-8 pins do not leak into a later round's window
    # derivation: with every key already graded, a later window's
    # non-wordcount prefix comes from keeps/regrades, not round-8 pins
    # (probe a round with NO _CHANGED_IN_ROUND entry of its own)
    prior_all = set(registry_loaded.QUERIES)
    w = registry_loaded.derive_window(round_no=9999, prior=prior_all)
    pinned = registry_loaded._CHANGED_IN_ROUND[8] - {"q_wordcount"}
    # pins would force all round-8 keys into the window head right
    # after q_wordcount; the round-scoped lookup must not do that
    assert set(w[1 : 1 + len(pinned)]) != pinned


def test_window_drains_stalest_regrades(registry_loaded):
    """Round-11 freshness mechanism (VERDICT r10 item 3): with the
    never-graded backlog empty, the free window slots go to the keys
    with the OLDEST newest driver row — so a round-1 green can never
    again sit stale for ten rounds while fresher keys round-robin.
    Concretely: every key at the current global staleness floor must
    be in the window whenever the floor set provably fits (window
    minus the forced head minus a worst-case one-keep-per-family)."""
    newest = registry_loaded.newest_grade_rounds()
    prior = registry_loaded.graded_before()
    graded = [k for k in registry_loaded.QUERIES if k in prior]
    if not graded:
        return  # round 1: nothing to re-grade
    floor = min(newest.get(k, 0) for k in graded)
    floor_keys = {k for k in graded if newest.get(k, 0) == floor}
    fixed = {"q_wordcount"} | set(registry_loaded.changed_in())
    free = (
        registry_loaded._WINDOW_SIZE
        - len(fixed)
        - len(registry_loaded._FAMILY_KEEP_PRIORITY)
    )
    if len(floor_keys) <= free:
        w = set(registry_loaded.derive_window())
        assert floor_keys <= w, (
            f"staleness floor r{floor} keys left out: "
            f"{sorted(floor_keys - w)}"
        )


def test_newest_grade_rounds_matches_artifacts(registry_loaded):
    """newest_grade_rounds() must report, per key, the max round of
    any CORRECTNESS artifact containing it — re-derived independently
    here from the raw files."""
    want: dict[str, int] = {}
    for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        for k in json.loads(pathlib.Path(path).read_text()):
            want[k] = max(want.get(k, 0), n)
    assert registry_loaded.newest_grade_rounds() == want
    # round scoping (ADVICE r11): a preview for round N must ignore
    # artifacts from rounds >= N, mirroring graded_before — otherwise
    # derive_window(round_no=N, prior=...) mixes an N-scoped graded
    # set with whole-history staleness and stops being reproducible
    # once later artifacts land
    rounds = sorted({n for n in want.values()})
    if len(rounds) >= 2:
        cut = rounds[-1]  # scope to exclude the newest artifact
        scoped = registry_loaded.newest_grade_rounds(round_no=cut)
        want_scoped: dict[str, int] = {}
        for path in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
            if not m or int(m.group(1)) >= cut:
                continue
            for k in json.loads(pathlib.Path(path).read_text()):
                want_scoped[k] = max(want_scoped.get(k, 0), int(m.group(1)))
        assert scoped == want_scoped
