"""Physical-plan assertions (SURVEY.md §4.2): verify Catalyst picked
the plans we'd want at 100 TB — pushdown reaches the scan, dims
broadcast, top-k avoids a global sort, hot paths stay Python-free."""

from __future__ import annotations

from tests.conftest import SMOKE_SF

from kafka_flink_exactlyonce_example_spark.plans import (
    assert_in_plan,
    assert_not_in_plan,
    plan_string,
)


def test_filter_pushdown_reaches_scan(spark, registry_loaded):
    df = registry_loaded.QUERIES["q_filter_pred"](spark, SMOKE_SF)
    plan = plan_string(df)
    assert "PushedFilters: [" in plan
    # at least the range predicates must be pushed into parquet
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, registry_loaded):
    df = registry_loaded.QUERIES["q_scan_project"](spark, SMOKE_SF)
    plan = plan_string(df)
    # ReadSchema must not include unused columns like l_comment-ish ones
    assert "l_shipdate" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_broadcast_join_chosen(spark, registry_loaded):
    for q in ("q_join_broadcast", "q_star_join"):
        assert_in_plan(registry_loaded.QUERIES[q](spark, SMOKE_SF), "BroadcastHashJoin")


def test_topk_plans_take_ordered(spark, registry_loaded):
    assert_in_plan(
        registry_loaded.QUERIES["q_sort_limit"](spark, SMOKE_SF), "TakeOrderedAndProject"
    )


def test_partial_aggregation_present(spark, registry_loaded):
    # partial → final HashAggregate pair = map-side combine before shuffle
    plan = plan_string(registry_loaded.QUERIES["q_agg_multi"](spark, SMOKE_SF))
    assert plan.count("HashAggregate") >= 2


def test_no_python_eval_in_oracled_queries(spark, registry_loaded):
    """Every hash-graded query must stay JVM-side (no Python UDF nodes)."""
    for qname in registry_loaded.ORACLES:
        df = registry_loaded.QUERIES[qname](spark, SMOKE_SF)
        assert_not_in_plan(
            df, "BatchEvalPython", "ArrowEvalPython", "MapInPandas", mode="extended"
        )


def test_wholestage_codegen_in_flagship(spark, registry_loaded):
    # AQE hides codegen spans in the pre-execution formatted plan;
    # "codegen" mode reports the fused subtrees directly.
    assert_in_plan(
        registry_loaded.QUERIES["q_star_join"](spark, SMOKE_SF),
        "WholeStageCodegen",
        mode="codegen",
    )


def test_asof_join_is_window_pass_not_bnlj(spark, registry_loaded):
    """The as-of join must plan as one window pass (shuffle on user_id
    + sort), never a nested-loop range join."""
    df = registry_loaded.QUERIES["q_asof_join"](spark, SMOKE_SF)
    assert_not_in_plan(df, "BroadcastNestedLoopJoin", "CartesianProduct")
    plan = plan_string(df)
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan


def test_interval_join_is_hash_join(spark, registry_loaded):
    """Equi-key + range residual → hash/merge join, not BNLJ."""
    df = registry_loaded.QUERIES["q_interval_join"](spark, SMOKE_SF)
    assert_not_in_plan(df, "BroadcastNestedLoopJoin", "CartesianProduct")


def test_pair_families_broadcast_block_side(spark, registry_loaded):
    """q_edit_distance still broadcasts its genuinely-bounded build
    side; q_embed_dup/q_semdedup no longer FORCE a broadcast of the
    data-scaled corpus — their pair joins are shuffle equi-joins on the
    corpus-scaled (label, cell) key (AQE may still pick broadcast at
    toy scale, which is fine), and must never degrade to a
    nested-loop/cartesian product."""
    assert_in_plan(
        registry_loaded.QUERIES["q_edit_distance"](spark, SMOKE_SF),
        "BroadcastHashJoin",
    )
    for q in ("q_embed_dup", "q_semdedup"):
        assert_not_in_plan(
            registry_loaded.QUERIES[q](spark, SMOKE_SF),
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )


def test_label_sim_moment_identity_no_pair_join(spark, registry_loaded):
    """q_label_sim is the closed-form moment identity: one linear pass,
    no pair join. The quadratic form needed vec_id for its v1<v2
    predicate, so the surest pin is that vec_id never appears in the
    plan — and no nested-loop/cartesian join may exist either."""
    df = registry_loaded.QUERIES["q_label_sim"](spark, SMOKE_SF)
    assert_not_in_plan(df, "BroadcastNestedLoopJoin", "CartesianProduct")
    assert "vec_id" not in plan_string(df)


def test_lateral_topk_decorrelates_to_group_limit(spark, registry_loaded):
    """The correlated LATERAL ... ORDER BY ... LIMIT must decorrelate to
    WindowGroupLimit (map-side partial top-k per group) + a join — never
    a per-outer-row rescan of the inner table."""
    df = registry_loaded.QUERIES["q_lateral_topk"](spark, SMOKE_SF)
    plan = plan_string(df)
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_anomaly_stats_join_is_broadcast(spark, registry_loaded):
    """The 5-row per-type stats side must broadcast — the score pass
    over the fact table stays shuffle-free."""
    assert_in_plan(
        registry_loaded.QUERIES["q_anomaly"](spark, SMOKE_SF), "BroadcastHashJoin"
    )


def test_forward_fill_single_shuffle(spark, registry_loaded):
    """IGNORE-NULLS forward fill is one hash exchange on user_id + one
    sorted window pass — no extra exchanges."""
    plan = plan_string(
        registry_loaded.QUERIES["q_forward_fill"](spark, SMOKE_SF), mode="simple"
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_basket_pairs_pair_gen_has_no_self_join(spark, registry_loaded):
    """Pairs come from inline array C(k,2) generation — the plan must
    show the broadcast dim join but NO sort-merge self-join of the
    (order, brand) relation."""
    df = registry_loaded.QUERIES["q_basket_pairs"](spark, SMOKE_SF)
    assert_not_in_plan(df, "SortMergeJoin", "CartesianProduct")
    assert_in_plan(df, "BroadcastHashJoin")


def test_skyline_no_fact_join_no_global_window(spark, registry_loaded):
    """The dominance test contracts to the ≤50-row size grain and joins
    that back by BROADCAST — the point set itself must never be
    shuffled into a join (no SortMergeJoin/ShuffledHashJoin/Cartesian),
    and no single-partition global window may appear (the round-1 shape
    this replaced)."""
    df = registry_loaded.QUERIES["q_skyline"](spark, SMOKE_SF)
    assert_not_in_plan(
        df, "SortMergeJoin", "CartesianProduct", "ShuffledHashJoin",
    )
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan  # per-size mins broadcast onto pts
    assert "Window" not in plan  # global-window formulation must not return


def test_derived_caps_broadcast_back(spark, registry_loaded):
    """Two-level metric queries (tiny derived relation rejoined to the
    fact scan) must broadcast the derived side, never shuffle the fact
    table into a sort-merge join."""
    for q in ("q_winsorize", "q_unigram_ce", "q_cluster_purity"):
        df = registry_loaded.QUERIES[q](spark, SMOKE_SF)
        assert_not_in_plan(df, "SortMergeJoin")


def test_global_scan_family_has_no_unpartitioned_window(spark, registry_loaded):
    """The five global-order queries (pareto/rfm/abc/whale/skyline) were
    rewritten onto the distributed two-pass scan (operators/scale.py).
    An unpartitioned window prints as ``windowspecdefinition`` with an
    empty partition spec — ``], [], [`` in the Window node line; none
    may appear, or the single-partition sort bottleneck is back."""
    for q in (
        "q_pareto", "q_rfm", "q_abc_class", "q_whale_curve", "q_skyline",
        "q_zipf", "q_heaps", "q_concurrency", "q_win_ntile",
    ):
        plan = plan_string(registry_loaded.QUERIES[q](spark, SMOKE_SF))
        bad = [
            ln
            for ln in plan.splitlines()
            if ln.strip().startswith("Window") and "], [], [" in ln
        ]
        assert not bad, f"{q}: unpartitioned Window nodes: {bad}"


def test_global_scan_family_range_partitions(spark, registry_loaded):
    """The four rank/cumsum rewrites must show the range repartition the
    two-pass pattern is built on (skyline needs none — it contracts to
    the bounded size domain instead)."""
    for q in (
        "q_pareto", "q_rfm", "q_abc_class", "q_whale_curve",
        "q_zipf", "q_heaps", "q_concurrency", "q_win_ntile",
    ):
        assert_in_plan(registry_loaded.QUERIES[q](spark, SMOKE_SF), "rangepartitioning")


def test_bigram_model_tables_broadcast(spark, registry_loaded):
    """q_bigram_ppl's scoring stage must broadcast the bounded model
    tables (bigram/unigram counts) onto the bigram stream — the CCNet
    shape — and never degrade to a nested-loop join."""
    df = registry_loaded.QUERIES["q_bigram_ppl"](spark, SMOKE_SF)
    assert_in_plan(df, "BroadcastHashJoin")
    assert_not_in_plan(df, "CartesianProduct")


def test_gram_novelty_no_broadcast_of_gram_relation(spark, registry_loaded):
    """q_gram_novelty's gram-frequency join is on a DATA-SCALED key
    relation — the code must not force it broadcast (no literal
    F.broadcast), and the plan must stay equi-join (no BNLJ)."""
    df = registry_loaded.QUERIES["q_gram_novelty"](spark, SMOKE_SF)
    assert_not_in_plan(df, "BroadcastNestedLoopJoin", "CartesianProduct")


def test_vocab_drift_is_take_ordered(spark, registry_loaded):
    """The global top-10 must plan as TakeOrderedAndProject, not a full
    sort."""
    assert_in_plan(
        registry_loaded.QUERIES["q_vocab_drift"](spark, SMOKE_SF),
        "TakeOrderedAndProject",
    )
