"""Provenance pin for the ANN planner's catalog (round 13): the
shipped `_ANN_OPERATING_TABLE` claims to be the engine-graded sf0.1
operating points; tools/operating_table.py is the promised
regeneration. This test closes the loop — the derivation, run on the
declared corpus, must reproduce the shipped constants bit-for-bit, so
the catalog can never silently drift from the instruments that
justify it."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF01 = "/root/testdata/sf0.1"


def test_shipped_catalog_reproduces_from_instruments(spark):
    import operating_table as ot

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _ANN_OPERATING_TABLE,
    )

    rows = ot.derive(spark, SF01)
    assert rows == _ANN_OPERATING_TABLE, (
        "shipped catalog diverged from the instrument-derived rows — "
        "regenerate with tools/operating_table.py or fix the derivation"
    )
    # the catalog invariants the planner's argmin relies on
    costs = [r[3] for r in rows]
    assert costs == sorted(costs)
    assert all(0.0 < r[2] <= 1.0 for r in rows)


def test_shipped_filtered_floor_reproduces_from_sweep(spark):
    import operating_table as ot

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _FILTERED_IVF_RECALL_FLOOR,
    )

    assert ot.derive_filtered_floor(spark, SF01) == _FILTERED_IVF_RECALL_FLOOR


def test_recall_3dp_is_exact_half_up():
    """The provenance derivation's 3-dp rounding must be HALF-UP in
    exact arithmetic — float round() is banker's on an inexact double
    and sent the real 57/240 half-way case the wrong way. Hypothesis
    pins equality with decimal's ROUND_HALF_UP over the whole
    (hits, trials) domain the instruments can produce."""
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import given, settings, strategies as st

    import operating_table as ot

    @settings(max_examples=500, deadline=None)
    @given(trials=st.integers(1, 100_000), data=st.data())
    def prop(trials, data):
        hits = data.draw(st.integers(0, trials))
        want = float(
            (Decimal(hits) / Decimal(trials)).quantize(
                Decimal("0.001"), rounding=ROUND_HALF_UP
            )
        )
        assert ot._recall_3dp(hits, trials) == want

    prop()
