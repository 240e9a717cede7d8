"""The bench cache-instrumentation registry (round 9, VERDICT r08
item 3): every shared session cache must be buildable through the
named registry, idempotent (second build ~free — it is the SAME cache
the queries consume, not a parallel one), and the registry must stay
in sync with the modules' cache dicts it fronts."""

from __future__ import annotations

import time

from tests.conftest import SMOKE_SF


def test_cache_builders_build_and_are_idempotent(spark, registry_loaded):
    from kafka_flink_exactlyonce_example_spark.operators import session_caches

    t = session_caches.build_all(spark, SMOKE_SF)
    assert set(t) == set(session_caches.CACHE_BUILDERS)
    assert all(v >= 0 for v in t.values())

    # second pass hits the session caches: near-zero total
    t0 = time.perf_counter()
    t2 = session_caches.build_all(spark, SMOKE_SF)
    rebuild = time.perf_counter() - t0
    assert rebuild < 2.0, f"cache builders not idempotent: {t2}"


def test_cache_builders_front_the_real_caches(spark, registry_loaded):
    """Building through the registry must populate the SAME per-module
    cache dicts the queries read — otherwise bench would time a
    parallel build and the query rows would still absorb the real one."""
    from kafka_flink_exactlyonce_example_spark.operators import (
        datamgmt,
        dedup,
        session_caches,
        simsearch,
    )

    session_caches.build_all(spark, SMOKE_SF)
    key = (spark.sparkContext.applicationId, SMOKE_SF)
    assert key in datamgmt._CHAR_GRAMS_CACHE
    assert key in simsearch._SIGNS_CACHE
    # single-consumer caches are deliberately NOT pre-built (round-12
    # budget audit): their cost belongs to their one consumer's row
    assert simsearch.pca_model_for.__name__  # still exists, not listed
    assert "pca_model" not in session_caches.CACHE_BUILDERS
    assert "jaccard_pairs" not in session_caches.CACHE_BUILDERS
    assert "semdedup_scored" not in session_caches.CACHE_BUILDERS
    # dedup uses a (appId, sf, salt) session key — just assert non-empty
    assert dedup._IVF_CELLS_CACHE and dedup._SHINGLES_CACHE
    assert dedup._IVF_SEEDS_CACHE
