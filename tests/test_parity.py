"""Per-query DuckDB parity at sf0.001 — the fast local mirror of the
driver's t2 gate (tools/crosscheck.py runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF
from tools.crosscheck import compare_frames


def _all_query_names():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from kafka_flink_exactlyonce_example_spark import registry

    registry.load_all()
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("qname", _all_query_names())
def test_query_parity(qname, spark, duck_smoke, registry_loaded):
    sdf = registry_loaded.QUERIES[qname](spark, SMOKE_SF).toPandas()
    if qname not in registry_loaded.ORACLES:
        # rows-only contract: non-empty, stable schema across runs
        assert len(sdf) > 0, f"{qname}: rows-only query returned no rows"
        again = registry_loaded.QUERIES[qname](spark, SMOKE_SF).toPandas()
        assert list(sdf.columns) == list(again.columns)
        assert len(sdf) == len(again)
        return
    odf = duck_smoke.execute(registry_loaded.ORACLES[qname]).df()
    problems = compare_frames(sdf, odf, qname)
    assert not problems, "\n".join(problems)
