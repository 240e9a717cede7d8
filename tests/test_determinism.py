"""Determinism under re-partitioning (SURVEY.md §5.2).

Order-sensitive derivations (window frames, lead/lag successors,
fingerprints, packing layouts) must not depend on physical data order:
a plan is only correct at 1000 executors if its result is identical for
ANY partitioning of the input. The q_win_running_sum incident (ROWS
frame straddling a sort tie — fixed by appending l_partkey for a total
order) is exactly this bug class; this test pins the fix for every
order-sensitive query by executing each one under two different shuffle
widths and demanding bit-identical results.
"""

from __future__ import annotations

import pytest

from tests.conftest import SMOKE_SF

# every query whose result flows through an ORDER-dependent derivation
ORDER_SENSITIVE = [
    "q_win_running_sum",
    "q_win_corr",
    "q_win_lag_lead",
    "q_forward_fill",
    "q_scd2",
    "q_markov",
    "q_cep_pattern",
    "q_pack_sequences",
    "q_fingerprint",
    "q_sort_limit",
    "q_topk_per_group",
    "q_lateral_topk",
    # mining batch: ntile scores, argmax split, weighted-median cumsum,
    # EWMA prefix sum, attribution fill — all window-ordered
    "q_rfm",
    "q_changepoint",
    "q_weighted_median",
    "q_ewma",
    "q_attribution",
    "q_mode",
    # survival/paths/eval batch: KM prefix product, session paths,
    # rounded-score argmax, ACF over lagged windows
    "q_survival",
    "q_event_paths",
    "q_cluster_purity",
    "q_autocorr",
    # trend/rank/sample batch: frame co-moments, rounded-key sampling,
    # rounded-G2 ranking, vocabulary rank windows
    "q_rolling_slope",
    "q_weighted_sample",
    "q_keyphrase",
    "q_zipf",
    "q_twap",
    "q_concurrency",
    "q_cohort_ltv",
    "q_inverted_index",
    "q_ndcg",
    "q_growth_accounting",
    "q_abc_class",
    "q_heaps",
    "q_ann_multiprobe",
    "q_semdedup",
    "q_control_chart",
    "q_rank_shift",
    "q_coverage_gaps",
    "q_drawdown",
    "q_whale_curve",
    # round 3: distributed ntile (range-partition boundary placement),
    # hash-seeded IVF cell assignment + argmax ties, LSH-candidate
    # scoring, top-k-per-label outliers, fixed hash-sampled probes
    "q_win_ntile",
    "q_embed_dup",
    "q_jaccard_pairs",
    "q_lsh_dup_groups",
    "q_embed_outliers",
    # round 4: rounded-weight top-20 (DSIR), fused top-10 with fixed
    # per-retriever truncation (RRF), argmin ties + seed ranks
    # (k-means), per-lang ntile boundaries on the ordered scan
    # (ppl_bucket), md5-ordered probe pairs (JL projection), composite
    # decile cuts (curriculum), estimated-jaccard threshold boundaries
    # (sweep), restricted-subgraph CC labels (cascade)
    "q_dsir_weights",
    "q_rank_fusion",
    "q_kmeans",
    "q_ppl_bucket",
    "q_embed_project",
    "q_curriculum",
    "q_dup_threshold_sweep",
    "q_dedup_cascade",
    "q_winnow_fingerprint",
    "q_triangle_count",
    "q_cms_topk",
    "q_class_balance",
    "q_hard_negatives",
    "q_simhash_hamming",
    # round 5: latest-wins merge argmax (cdc), global decile boundaries
    # on the ordered scan (psi), rank-filtered top-K wordlists
    # (overlap), top-V vocab freeze (oov) — each with a unique-key
    # tie-break that must hold at any width
    "q_cdc_merge",
    "q_psi_drift",
    "q_vocab_overlap",
    "q_oov_rate",
    "q_watermark_plan",  # per-user running max in event_id order
    "q_maxsim_retrieval",  # rounded-max argmax + label-ordered top-5
    "q_matryoshka_eval",  # dual rank windows on rounded sims
    "q_diversity_topk",  # per-group cap + global TakeOrdered
    "q_poisson_bootstrap",  # replicate means from hashed weights
    "q_ks_test",  # bin-grain CDF windows + argmax peak bin
    "q_quantile_normalize",  # CDF-boundary join at 9-dp rounding
    "q_interpolate",  # IGNORE-NULLS bracketing windows on the spine
    "q_cross_lang_dup",  # census over the capped LSH edge relation
    "q_pq_codebook",  # md5 seeds + rounded-centroid re-assignment
    "q_pq_adc",  # ADC vs exact rank windows on rounded distances
    "q_tail_index",  # top-(k+1) order statistics with doc_id tie-break
    # round 6: bottom-K sketch thresholds (kmv), candidate-set
    # containment ratios over capped bands, CC-label hash splits —
    # all must hold at any shuffle width
    "q_kmv_setops",
    "q_minhash_containment",
    "q_leakage_split",
    "q_pca_power",  # 8 rounded matvec rounds (driver-side, bounded model)
    "q_interarrival",  # histogram-CDF median pick at the ⌈n/2⌉ bin
    "q_session_stats",  # duration-bin CDF picks (round-8 conversion)
    "q_skew_diag",  # count-bin CDF picks over the key-count histogram
    # rounds 9-10: the ANN index/audit/ingest family — every one ranks
    # float sims (or rounded ADC distances) under an id tie-break, the
    # exact class this suite exists to pin at any shuffle width
    "q_ann_lsh",
    "q_knn_join",
    "q_ann_recall",
    "q_incremental_ann",
    "q_ingest_gate",
    "q_mp_recall",
    "q_index_refresh",
    "q_ivf_recall",
    "q_ivf_adc",
    "q_adc_recall",
]


def _rows(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
    # None-safe total order (NULLs sort first within their column)
    return sorted(rows, key=lambda t: tuple((v is not None, v) for v in t))


@pytest.mark.parametrize("name", ORDER_SENSITIVE)
def test_result_stable_across_shuffle_widths(spark, registry_loaded, name):
    """Three widths, not two: 7 and 13 are coprime small widths (every
    shuffle boundary moves), 64 exceeds the row count of several
    contracted grains (forces empty partitions through every window /
    prefix-offset path — the regime a 1000-executor cluster runs in)."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    results = {}
    try:
        for width in ("7", "13", "64"):
            spark.conf.set(key, width)
            results[width] = _rows(registry_loaded.QUERIES[name](spark, SMOKE_SF))
    finally:
        spark.conf.set(key, prev)
    assert results["7"] == results["13"] == results["64"], (
        f"{name} changed results when shuffle width changed"
    )
