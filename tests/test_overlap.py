"""Focused tests for operators/overlap.py (round 17): the shared
session-cache lock and the intra-query job-overlap helper."""

from __future__ import annotations

import threading
import time

import pytest

from kafka_flink_exactlyonce_example_spark.operators.overlap import (
    memo_get,
    run_overlapped,
)


def test_memo_get_builds_once_under_concurrency():
    cache: dict = {}
    builds = []
    start = threading.Barrier(8)

    def build():
        builds.append(threading.get_ident())
        time.sleep(0.05)  # widen the race window
        return object()

    results = []

    def worker():
        start.wait()
        results.append(memo_get(cache, ("app", "sf"), build))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1, "concurrent first-build ran more than once"
    assert all(r is results[0] for r in results), "callers saw different objects"


def test_memo_get_is_reentrant_for_nested_builders():
    """A builder that resolves another cache under the same lock (the
    gate_flags → inc_index_build → table() nesting) must not deadlock."""
    outer: dict = {}
    inner: dict = {}

    def build_outer():
        return ("outer", memo_get(inner, "k", lambda: "inner"))

    assert memo_get(outer, "k", build_outer) == ("outer", "inner")
    assert inner["k"] == "inner"


def test_run_overlapped_preserves_argument_order():
    def slow():
        time.sleep(0.05)
        return "slow"

    assert run_overlapped(slow, lambda: "fast") == ["slow", "fast"]


def test_run_overlapped_propagates_exceptions():
    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        run_overlapped(lambda: 1, boom)


def test_run_overlapped_single_thunk_runs_inline():
    ident = run_overlapped(lambda: threading.get_ident())
    assert ident == [threading.get_ident()]
