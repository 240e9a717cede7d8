"""The corpus-scaled blocking key behind the embedding pair-join family
(dedup._ivf_cells): at graded scale every label collapses to one cell
(k=1, label-blocked oracle stays exact); past the split threshold a
label must fan out into k sub-cells with bounded blocks and a total
partition of the vectors. Thresholds are monkeypatched small so the
split path runs on a toy frame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.operators import dedup


def _toy_embeddings(spark, n, n_labels=2, dim=8):
    rows = [
        (i, i % n_labels, [float((i * 7 + d * 3) % 11) + 0.25 for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )


def test_cells_collapse_to_label_below_threshold(spark):
    e = _toy_embeddings(spark, 40)
    out = dedup._ivf_cells(e).collect()
    assert len(out) == 40
    # k = 1 -> exactly one cell per label, i.e. blocking == label
    cells = {}
    for r in out:
        cells.setdefault(r["label"], set()).add(r["cell"])
    assert all(len(c) == 1 for c in cells.values())


def test_cells_split_when_label_outgrows_target(spark, monkeypatch):
    # 200 rows/label, target 8 -> k = floor(sqrt(200/8)) = 5 cells/label;
    # sample every row so candidate seeds always cover k.
    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)  # mod=1: sample every row
    e = _toy_embeddings(spark, 400)
    out = dedup._ivf_cells(e).collect()
    # total partition: every vector appears exactly once
    assert sorted(r["vec_id"] for r in out) == list(range(400))
    per_label = {}
    for r in out:
        per_label.setdefault(r["label"], []).append(r["cell"])
    for label, cells in per_label.items():
        assert len(set(cells)) > 1, f"label {label} never split"
    # a seed cell is a real member vec_id of the same label
    by_label = {r["vec_id"]: r["label"] for r in out}
    for r in out:
        assert by_label[r["cell"]] == r["label"]


def test_cells_deterministic_across_runs(spark, monkeypatch):
    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)  # mod=1: sample every row
    e = _toy_embeddings(spark, 300)
    a = sorted(map(tuple, dedup._ivf_cells(e).select("vec_id", "cell").collect()))
    b = sorted(
        map(
            tuple,
            dedup._ivf_cells(e.repartition(13)).select("vec_id", "cell").collect(),
        )
    )
    assert a == b


def test_embed_dup_pairs_stay_within_cells(spark, monkeypatch):
    """With forced splitting, the pair join must only emit pairs whose
    two sides share a cell — the property that bounds the join at
    scale."""
    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)  # mod=1: sample every row
    e = _toy_embeddings(spark, 200)
    cells = {r["vec_id"]: r["cell"] for r in dedup._ivf_cells(e).collect()}

    from kafka_flink_exactlyonce_example_spark.functions.similarity import dot

    blocked = dedup._ivf_cells(e)
    norm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    a = blocked.select(
        F.col("vec_id").alias("vec_a"), "label", "cell",
        F.col("embedding").alias("ea"), norm.alias("na"),
    )
    b = blocked.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"),
        F.col("cell").alias("cell_b"), F.col("embedding").alias("eb"),
        norm.alias("nb"),
    )
    pairs = a.join(
        b,
        (a.label == b.label_b) & (a.cell == b.cell_b)
        & (F.col("vec_a") < F.col("vec_b")),
    ).select("vec_a", "vec_b").collect()
    assert pairs, "split blocks produced no pairs at all"
    for r in pairs:
        assert cells[r["vec_a"]] == cells[r["vec_b"]]


def test_graded_sfs_stay_under_split_threshold():
    """Round-3 ADVICE: q_embed_dup/q_semdedup block pairs on
    (label, cell) while their oracles stay label-blocked; exactness
    depends on every graded-SF label staying under the k=1 split
    threshold (n_label < 4*_CELL_TARGET => floor(sqrt(n/4096)) <= 1).
    Guard it against testdata regeneration drift: if this ever fires,
    either shrink the graded SF or make the oracles cell-aware."""
    import glob

    import pyarrow.parquet as pq

    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/embeddings.parquet")):
        labels = pq.read_table(path, columns=["label"]).column("label")
        counts = labels.value_counts()
        biggest = max(c["counts"].as_py() for c in counts)
        assert biggest < 4 * dedup._CELL_TARGET, (
            f"{path}: label with {biggest} rows >= {4 * dedup._CELL_TARGET} "
            "— k>1 splits would diverge from the label-blocked oracle"
        )
        checked += 1
    assert checked >= 1


# ---------------------------------------------------------------------------
# Round 10: the frozen two-stage routing (simsearch.frozen_route /
# frozen_top1) in the k>1 SPLIT regime — graded SFs run k=1, so this is
# the only functional test of the sub-cell-restricted neighbor scan.
# ---------------------------------------------------------------------------


def test_frozen_routing_restricts_to_subcell_and_is_exact_within_it(
    spark, monkeypatch
):
    """With labels forced to split (k > 1): every routed vector's
    neighbor must come from its assigned sub-cell's members, and be
    the TRUE cosine top-1 within that sub-cell (the approximation is
    the cell restriction, never the in-cell ranking)."""
    import math

    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old = _toy_embeddings(spark, 400)           # the frozen corpus
    new = _toy_embeddings(spark, 430).filter(   # 30 fresh vectors
        F.col("vec_id") >= 400
    ).select("vec_id", "embedding")

    cent, seeds = simsearch.frozen_index_frames(old)
    indexed = dedup._assign_to_seeds(old, seeds)
    idx_rows = indexed.collect()
    # the split regime is actually on
    cells_per_label = {}
    for r in idx_rows:
        cells_per_label.setdefault(r["label"], set()).add(r["cell"])
    assert all(len(c) > 1 for c in cells_per_label.values())

    routed = simsearch.frozen_route(new, cent, seeds)
    got = {
        r["vec_id"]: r
        for r in simsearch.frozen_top1(routed, indexed).collect()
    }
    assert sorted(got) == list(range(400, 430))

    by_cell = {}
    for r in idx_rows:
        by_cell.setdefault(r["cell"], []).append(r)
    routed_cells = {r["vec_id"]: r["icell"] for r in routed.collect()}
    new_rows = {r["vec_id"]: r["embedding"] for r in new.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for vid, r in got.items():
        icell = routed_cells[vid]
        members = by_cell[icell]
        member_ids = {m["vec_id"] for m in members}
        assert r["neighbor_id"] in member_ids, (
            f"{vid}: neighbor {r['neighbor_id']} outside assigned sub-cell"
        )
        # exact top-1 within the sub-cell (ties -> smallest neighbor_id)
        best = max(
            members,
            key=lambda m: (round(cos(new_rows[vid], m["embedding"]), 9),
                           -m["vec_id"]),
        )
        assert r["neighbor_id"] == best["vec_id"], (
            f"{vid}: not the in-cell top-1"
        )


def test_frozen_route_is_frozen(spark, monkeypatch):
    """The quantizer must not move when the batch changes: routing two
    DIFFERENT batches against the same (cent, seeds) assigns the shared
    vectors identically — the frozen-index property the streaming gate's
    replay safety rests on."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old = _toy_embeddings(spark, 400)
    cent, seeds = simsearch.frozen_index_frames(old)
    cent = cent.localCheckpoint()
    seeds = seeds.localCheckpoint()
    all_new = _toy_embeddings(spark, 440).filter(
        F.col("vec_id") >= 400
    ).select("vec_id", "embedding")
    small = all_new.filter(F.col("vec_id") < 420)

    a = {
        r["vec_id"]: (r["cell"], r["icell"])
        for r in simsearch.frozen_route(all_new, cent, seeds).collect()
    }
    b = {
        r["vec_id"]: (r["cell"], r["icell"])
        for r in simsearch.frozen_route(small, cent, seeds).collect()
    }
    assert b == {k: v for k, v in a.items() if k < 420}


def test_ivf_adc_scan_restricts_to_subcells(spark, monkeypatch):
    """q_ivf_adc's posting-list scan in the k>1 SPLIT regime (graded
    SFs run k=1, where the scan set provably equals the label-blocked
    oracle's): with labels forced to split, each probe's scanned
    neighbors must be EXACTLY the members of its nprobe fine-routed
    (label, cell) sub-cells (minus itself), and strictly fewer than a
    label-grain scan would touch — the sub-cell restriction is real,
    not a no-op."""
    from kafka_flink_exactlyonce_example_spark.functions.similarity import (
        cosine,
    )
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    e = _toy_embeddings(spark, 400)
    seeds = dedup._ivf_seeds(e)
    assigned = dedup._assign_to_seeds(e, seeds)
    idx_rows = assigned.collect()
    cells_per_label: dict[int, set[int]] = {}
    for r in idx_rows:
        cells_per_label.setdefault(r["label"], set()).add(r["cell"])
    assert all(len(c) > 1 for c in cells_per_label.values())

    # coarse: top-_IVF_NPROBE labels per probe (q_ivf_adc's rank shape)
    from pyspark.sql import Window

    probes = e.filter(F.col("vec_id") < 6).select("vec_id", "embedding")
    dims = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))),"
                " x -> x.m)"
            ).alias("centroid")
        )
    )
    rank_w = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_sim"), F.col("label")
    )
    route = (
        probes.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            F.round(
                cosine(F.col("centroid"), F.col("embedding")), 6
            ).alias("cell_sim"),
        )
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= simsearch._IVF_NPROBE)
        .select("vec_id", "label")
    )
    fine = dedup._assign_to_seeds(
        route.join(probes, "vec_id").select("vec_id", "label", "embedding"),
        seeds,
    ).select(F.col("vec_id").alias("probe_id"), "label", "cell")
    fine_rows = fine.collect()
    # the toy frame has 2 labels, so the route caps at min(nprobe, 2)
    want_probed = min(simsearch._IVF_NPROBE, 2)
    assert all(
        len([r for r in fine_rows if r["probe_id"] == p]) == want_probed
        for p in range(6)
    )

    got: dict[int, set[int]] = {p: set() for p in range(6)}
    for r in simsearch.ivf_adc_scan(fine, assigned).collect():
        got[r["probe_id"]].add(r["neighbor_id"])

    members: dict[tuple[int, int], set[int]] = {}
    label_members: dict[int, set[int]] = {}
    for r in idx_rows:
        members.setdefault((r["label"], r["cell"]), set()).add(r["vec_id"])
        label_members.setdefault(r["label"], set()).add(r["vec_id"])
    for r in fine_rows:
        p = r["probe_id"]
        want = set()
        probed_labels = set()
        for fr in fine_rows:
            if fr["probe_id"] == p:
                want |= members[(fr["label"], fr["cell"])]
                probed_labels.add(fr["label"])
        want.discard(p)
        assert got[p] == want, f"probe {p}: scan set != sub-cell members"
        label_scan = set().union(
            *(label_members[lb] for lb in probed_labels)
        ) - {p}
        assert len(got[p]) < len(label_scan), (
            f"probe {p}: sub-cell restriction was a no-op"
        )


def test_index_refresh_rebuild_flag_fires(spark, monkeypatch, registry_loaded):
    """q_index_refresh's whole point is the ``rebuild`` trigger, but at
    the graded SFs every cell sits so far under _CELL_TARGET that
    k_frozen = k_next = 1 and the flag never fires. Retune the report's
    threshold so the most-grown cell is GUARANTEED to cross the k=1→2
    boundary (T in (n_old/4, n_total/4] makes floor(sqrt(n_old/T)) = 1
    and floor(sqrt(n_total/T)) >= 2), then assert the trigger fires
    there, stays silent on unchanged cells, and the count arithmetic
    matches an independent recomputation. Routing (dedup's own
    _CELL_TARGET) is untouched — only the report arithmetic is."""
    import math

    from kafka_flink_exactlyonce_example_spark.operators import ingest
    from tests.conftest import SMOKE_SF

    base = {
        r["cell"]: r
        for r in registry_loaded.QUERIES["q_index_refresh"](
            spark, SMOKE_SF
        ).collect()
    }
    assert all(r["rebuild"] == 0 for r in base.values()), (
        "graded-SF premise broken: rebuild already fires untuned"
    )
    grown = [c for c, r in base.items() if r["n_admitted"] > 0]
    assert grown, "no admitted docs landed in any cell"
    star = max(grown, key=lambda c: base[c]["n_admitted"])
    o, t = base[star]["n_old"], base[star]["n_total"]
    monkeypatch.setattr(ingest, "_CELL_TARGET", (o + 0.5) / 4.0)

    out = {
        r["cell"]: r
        for r in ingest.q_index_refresh(spark, SMOKE_SF).collect()
    }
    assert sorted(out) == sorted(base)
    T = (o + 0.5) / 4.0
    for c, r in out.items():
        # counts are threshold-independent
        assert r["n_old"] == base[c]["n_old"]
        assert r["n_admitted"] == base[c]["n_admitted"]
        assert r["n_total"] == r["n_old"] + r["n_admitted"]
        # k arithmetic matches an independent float recomputation
        assert r["k_frozen"] == max(1, math.floor(math.sqrt(r["n_old"] / T)))
        assert r["k_next"] == max(1, math.floor(math.sqrt(r["n_total"] / T)))
        assert r["rebuild"] == int(r["k_next"] > r["k_frozen"])
        if r["n_admitted"] == 0:
            assert r["rebuild"] == 0
    assert out[star]["k_frozen"] == 1
    assert out[star]["k_next"] >= 2
    assert out[star]["rebuild"] == 1, "the trigger cell did not fire"


def test_graded_sfs_cq_cells_under_split_threshold_and_never_empty():
    """Round-11 twin of the label guard above for the GEOMETRY-trained
    coarse quantizer: q_ivf_adc/q_adc_recall scan ONE sub-cell per
    probed coarse cell while their oracles scan the whole cell —
    exact only while every graded-SF coarse cell stays under
    4*_CELL_TARGET (k=1). Also pins the drop-empty promise: k-means
    training never empties a cell on the graded fixtures, so the
    codebook stays exactly _CQ_K cells (an empty cell would silently
    shrink nprobe's denominator). Runs the ORACLE chain in DuckDB —
    no Spark session needed, and it guards the same arithmetic the
    grading compares against."""
    import glob

    import duckdb

    from kafka_flink_exactlyonce_example_spark.operators import simsearch as sim

    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf*/embeddings.parquet")):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
        )
        census = con.execute(
            sim._IVF_ROUTE_CTES
            + " SELECT CAST(COUNT(*) AS BIGINT), CAST(MAX(n) AS BIGINT)"
            "   FROM (SELECT ccell, COUNT(*) AS n FROM cqassign"
            "         GROUP BY ccell)"
        ).fetchone()
        n_cells, biggest = census
        assert n_cells == sim._CQ_K, (
            f"{path}: k-means emptied a coarse cell "
            f"({n_cells} of {sim._CQ_K} survive)"
        )
        assert biggest < 4 * dedup._CELL_TARGET, (
            f"{path}: coarse cell with {biggest} rows >= "
            f"{4 * dedup._CELL_TARGET} — k>1 sub-cell splits would "
            "diverge from the cell-grain oracle"
        )
        checked += 1
    assert checked >= 1


def test_frozen_route_total_even_with_empty_subcells(spark, monkeypatch):
    """VERDICT r10 item 6 (cold-cell routing): frozen_top1's icell
    equi-join must never silently drop a routed vector. The only way
    an indexed sub-cell can be EMPTY is duplicate-valued seeds (every
    member ties and the (cos, -cell) tie-break drains the larger cell
    id) — and a new vector facing those identical seeds computes
    identical cosines and tie-breaks to the same surviving cell, so
    routing to an empty cell is impossible. Manufacture exactly that
    regime (one label of 128 bit-identical vectors → k=4 identical
    seeds → 3 provably empty sub-cells) and assert (a) the empty cells
    really exist (non-vacuous) and (b) every new vector still gets its
    neighbor row."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    rows = [(i, 0, [1.0] * 8) for i in range(128)] + [
        (i, 1, [float((i * 7 + d * 3) % 11) + 0.25 for d in range(8)])
        for i in range(128, 256)
    ]
    old = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    cent, seeds = simsearch.frozen_index_frames(old)
    cent = cent.localCheckpoint()
    seeds = seeds.localCheckpoint()
    indexed = dedup._assign_to_seeds(old, seeds).localCheckpoint()

    seed_cells = {
        (r["label"], s["cell"])
        for r in seeds.collect()
        for s in r["_seeds"]
    }
    used = {(r["label"], r["cell"]) for r in indexed.collect()}
    empty = seed_cells - used
    assert empty, "fixture failed to manufacture an empty sub-cell"
    # the all-identical label is guaranteed to contribute (the modular
    # label-1 fixture has period-11 duplicates, so it may too — same
    # mechanism, equally valid)
    assert any(lbl == 0 for lbl, _ in empty)

    new = spark.createDataFrame(
        [
            (1000 + j, [1.0] * 8 if j % 2 == 0
             else [float((j * 5 + d) % 7) + 0.5 for d in range(8)])
            for j in range(10)
        ],
        "vec_id bigint, embedding array<float>",
    )
    routed = simsearch.frozen_route(new, cent, seeds)
    got = simsearch.frozen_top1(routed, indexed).collect()
    assert sorted(r["vec_id"] for r in got) == [1000 + j for j in range(10)]
    # and no routed vector sits in an empty cell (the theorem's (b))
    assert all(
        (0 if r["cell"] == 0 else 1, r["icell"]) not in
        {(lbl, c) for lbl, c in empty}
        for r in routed.collect()
    )


def test_frozen_top1_surfaces_empty_cell_as_null_row(spark):
    """ADVICE r11 (frozen_top1 hardening): the duplicate-seed theorem
    does not cover FP-exact ties between DISTINCT seeds (e.g. colinear
    scaled vectors), where a new vector CAN route into an empty
    sub-cell. The scan join is now a LEFT join, so such a vector must
    surface as an explicit (vec_id, cell, NULL, NULL) row — never
    silently vanish. Drive the join directly with a routed frame
    pointing at a sub-cell that holds no members."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    indexed = spark.createDataFrame(
        [(1, 0, 10, [1.0, 0.0]), (2, 0, 10, [0.9, 0.1])],
        "vec_id bigint, label int, cell bigint, embedding array<float>",
    ).select("vec_id", F.col("label"), "cell", "embedding")
    routed = spark.createDataFrame(
        [
            (100, 0, 10, [1.0, 0.0]),   # healthy: cell 10 has members
            (101, 0, 99, [0.5, 0.5]),   # pathological: cell 99 is empty
        ],
        "vec_id bigint, cell int, icell bigint, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in simsearch.frozen_top1(routed, indexed).collect()}
    assert set(got) == {100, 101}, "a routed vector was silently dropped"
    assert got[100]["neighbor_id"] == 1 and got[100]["sim"] is not None
    assert got[101]["neighbor_id"] is None and got[101]["sim"] is None


def test_warm_rebuild_id_spaces_and_new_labels(spark):
    """Round-12 self-review findings, pinned: warm_index_rebuild's
    ``fired`` set lives in POSTING-CELL space, so (a) an admitted
    vector ROUTED into a fired cell joins that cell's retrain even
    when its lake label is elsewhere (the naive lake-label filter
    dropped it from the index entirely), and (b) a brand-new lake
    label — which the refresh report can never fire, it reports old
    cells only — is seeded + indexed at its lake label like a cold
    rebuild, not appended at its routed cell, and is reachable
    through (cent2, seeds2) routing."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    old = spark.createDataFrame(
        [(i, 0, [1.0 + 0.01 * i, 0.0, 0.1 * i]) for i in range(4)]
        + [(10 + i, 1, [0.0, 1.0 + 0.01 * i, 0.1 * i]) for i in range(4)],
        "vec_id bigint, label int, embedding array<float>",
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()
    icell = {r["label"]: r["_seeds"][0]["cell"] for r in seeds1.collect()}

    # A: lake label 0, but the frozen router put it in cell 1 (the
    # divergence case); B: brand-new lake label 7, routed to cell 0
    A = (100, 0, [0.1, 1.0, 0.0])
    B = (101, 7, [0.0, 0.0, 1.0])
    merged = old.unionByName(
        spark.createDataFrame(
            [A, B], "vec_id bigint, label int, embedding array<float>"
        )
    )
    adm_routed = spark.createDataFrame(
        [
            (100, 1, icell[1], A[2]),
            (101, 0, icell[0], B[2]),
        ],
        "vec_id bigint, cell int, icell bigint, embedding array<float>",
    )
    cent2, seeds2, indexed2 = simsearch.warm_index_rebuild(
        merged, seeds1, indexed1, adm_routed, fired_labels={1}
    )
    rows = indexed2.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["vec_id"], []).append(r["label"])
    # every merged vector indexed exactly once — nothing dropped or doubled
    assert sorted(by_id) == sorted(
        r["vec_id"] for r in merged.collect()
    )
    assert all(len(v) == 1 for v in by_id.values())
    # (a) A lives in the fired cell it was routed to, not its lake label
    assert by_id[100] == [1]
    # (b) B lives at its brand-new lake label and has seeds there
    assert by_id[101] == [7]
    seed_labels = {r["label"] for r in seeds2.collect()}
    assert seed_labels == {0, 1, 7}
    # non-fired label 0 keeps its v1 seeds verbatim (no posting churn)
    s1_0 = [r["_seeds"] for r in seeds1.collect() if r["label"] == 0]
    s2_0 = [r["_seeds"] for r in seeds2.collect() if r["label"] == 0]
    assert s1_0 == s2_0
    # B is reachable through the v2 index: a query at B's vector routes
    # to label 7 and finds B, not a NULL row
    q = spark.createDataFrame(
        [(500, [0.0, 0.0, 1.0])], "vec_id bigint, embedding array<float>"
    )
    hit = simsearch.frozen_top1(
        simsearch.frozen_route(q, cent2.localCheckpoint(),
                               seeds2.localCheckpoint()),
        indexed2.localCheckpoint(),
    ).collect()
    assert len(hit) == 1 and hit[0]["neighbor_id"] == 101
    assert hit[0]["sim"] == 1.0


def test_warm_rebuild_avoids_cold_resample_churn(spark):
    """The quantitative warm-start claim, isolated: a cold rebuild
    re-samples every label's seeds over the merged corpus, so ONE new
    member with a smaller md5('seed:') hash renames the whole cell
    (cell id = seed vec_id) and nominally rewrites every posting row —
    warm-start keeps non-fired cells' seeds verbatim and merely
    appends, so its old-member churn is zero where cold's is the whole
    cell. Fixture: label 5 with v1 seed 2002; admitted vec 101 hashes
    below every old member (md5('seed:101') < md5('seed:2002')), so
    cold's resample flips the seed to 101."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    old = spark.createDataFrame(
        [(v, 5, [1.0, 0.1 * (v % 7), 0.0]) for v in (2000, 2001, 2002)],
        "vec_id bigint, label int, embedding array<float>",
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()
    assert {r["_seeds"][0]["cell"] for r in seeds1.collect()} == {2002}

    newv = (101, 5, [1.0, 0.05, 0.0])
    merged = old.unionByName(
        spark.createDataFrame(
            [newv], "vec_id bigint, label int, embedding array<float>"
        )
    )
    adm_routed = spark.createDataFrame(
        [(101, 5, 2002, newv[2])],
        "vec_id bigint, cell int, icell bigint, embedding array<float>",
    )
    _, seeds2, indexed2 = simsearch.warm_index_rebuild(
        merged, seeds1, indexed1, adm_routed, fired_labels=set()
    )
    _, seeds_c = simsearch.frozen_index_frames(merged)
    indexed_c = dedup._assign_to_seeds(merged, seeds_c)

    def cm(ix):
        return {r["vec_id"]: (r["label"], r["cell"]) for r in ix.collect()}

    m1, mw, mc = cm(indexed1), cm(indexed2), cm(indexed_c)
    assert set(mw) == set(mc) == {2000, 2001, 2002, 101}
    old_warm = sum(1 for v in m1 if mw[v] != m1[v])
    old_cold = sum(1 for v in m1 if mc[v] != m1[v])
    assert old_warm == 0, f"warm renamed {old_warm} old postings"
    # cold's resample really did flip the seed -> the whole cell churns
    assert {r["_seeds"][0]["cell"] for r in seeds_c.collect()} == {101}
    assert old_cold == 3
    # and warm's v2 seeds are v1's, verbatim
    assert [r["_seeds"] for r in seeds2.collect()] == [
        r["_seeds"] for r in seeds1.collect()
    ]


def test_index_compact_flag_fires(spark):
    """q_index_compact's firing branch (the graded SFs sit at
    k_frozen = k_after = 1, compact = 0): retune the cell target so a
    cell provably crosses k=2 -> 1 after the delete, and verify the
    arithmetic against an independent float recomputation — the
    test_index_refresh_rebuild_flag_fires recipe, mirrored for
    shrink."""
    import math

    from kafka_flink_exactlyonce_example_spark.operators import ingest

    cells = spark.createDataFrame(
        [(0, 100, 80), (1, 100, 10), (2, 30, 0)],
        "cell int, n_before bigint, n_deleted bigint",
    )
    # T = 20: k(100) = floor(sqrt(5)) = 2; k(20) = 1 -> cell 0 fires;
    # cell 1: k(90) = 2 = k_frozen -> no fire; cell 2: k(30)=1=k(30)
    rep = {r["cell"]: r for r in
           ingest.index_compact_report(cells, cell_target=20.0).collect()}
    for c, nb, nd in ((0, 100, 80), (1, 100, 10), (2, 30, 0)):
        kf = max(1, math.floor(math.sqrt(nb / 20.0)))
        ka = max(1, math.floor(math.sqrt((nb - nd) / 20.0)))
        assert rep[c]["k_frozen"] == kf and rep[c]["k_after"] == ka
        assert rep[c]["n_after"] == nb - nd
        assert rep[c]["compact"] == int(ka < kf)
    assert rep[0]["compact"] == 1 and rep[1]["compact"] == 0


def test_frozen_top1_tombstone_anti_join(spark):
    """Round 13 (VERDICT r12 item 1a): the tombstone id-set threaded
    through frozen_top1 removes deleted vectors from the posting scan
    — the old winner can never surface; a sub-cell fully emptied by
    deletes surfaces as the LEFT join's explicit NULL row; and
    ``tombstones=None`` is plan-identical to the two-argument form."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    indexed = spark.createDataFrame(
        [(1, 0, 10, [1.0, 0.0]), (2, 0, 10, [0.9, 0.1]),
         (3, 0, 11, [0.0, 1.0])],
        "vec_id bigint, label int, cell bigint, embedding array<float>",
    )
    routed = spark.createDataFrame(
        [(100, 0, 10, [1.0, 0.0]), (101, 0, 11, [0.0, 1.0])],
        "vec_id bigint, cell int, icell bigint, embedding array<float>",
    )
    # no tombstones: the nearest member wins
    base = {r["vec_id"]: r for r in
            simsearch.frozen_top1(routed, indexed).collect()}
    assert base[100]["neighbor_id"] == 1 and base[101]["neighbor_id"] == 3
    # None is the no-op fast path: the posting relation passes through
    # untouched, so the three-argument form cannot change any plan
    assert simsearch.tombstone_filter(indexed, None) is indexed
    # tombstone the winner: runner-up surfaces; tombstone a whole
    # sub-cell: NULL row, never a vanished probe
    tomb = spark.createDataFrame([(1,), (3,)], "vec_id bigint")
    got = {r["vec_id"]: r for r in
           simsearch.frozen_top1(routed, indexed, tombstones=tomb).collect()}
    assert set(got) == {100, 101}
    assert got[100]["neighbor_id"] == 2
    assert got[101]["neighbor_id"] is None and got[101]["sim"] is None


def test_compact_fire_warm_merge_lifecycle(spark, monkeypatch):
    """Round 13 (VERDICT r12 item 1b) — the delete-path lifecycle,
    end to end: a tombstone wave → q_index_compact's report FIRES the
    shrunk cell (k 2→1) → warm_index_compact MERGES its sub-cells
    keeping the surviving seed's identity → deleted ids are gone from
    postings AND quantizer, non-fired cells never churn, warm churn ≤
    the cold full retrain, and search stays correct both BETWEEN the
    wave and the rebuild (tombstone-filtered scan) and after it."""
    import math

    from kafka_flink_exactlyonce_example_spark.operators import ingest, simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)  # mod=1
    # label 0: 40 members -> k = floor(sqrt(40/8)) = 2 sub-cells;
    # label 1: 10 members -> k = 1 (the non-fired control)
    rows = [
        (i, 0, [1.0, 0.03 * i, 0.002 * (i * i % 17)]) for i in range(40)
    ] + [
        (100 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(10)
    ]
    old = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()
    s1 = {r["label"]: sorted(s["cell"] for s in r["_seeds"])
          for r in seeds1.collect()}
    assert len(s1[0]) == 2 and len(s1[1]) == 1

    # the takedown wave: 26 of label 0 — including ONE of its two
    # seeds (the embedding must leave the quantizer too) — and 2 of
    # label 1 (not enough to shrink its k)
    dead_seed = s1[0][1]
    keep_seed = s1[0][0]
    label0_ids = list(range(40))
    dead0 = [dead_seed] + [
        i for i in label0_ids if i not in (dead_seed, keep_seed)
    ][:25]
    dead = sorted(dead0) + [100, 101]
    tomb = spark.createDataFrame([(d,) for d in dead], "vec_id bigint")
    survivors = {r["vec_id"] for r in old.collect()} - set(dead)

    # BETWEEN the wave and the rebuild: the tombstone-filtered scan is
    # already correct — a query at a surviving member finds it (sim
    # 1.0) and no deleted id ever surfaces
    probe_id = sorted(
        v for v in survivors if v < 40 and v not in (keep_seed,)
    )[0]
    probe_emb = [r["embedding"] for r in old.collect()
                 if r["vec_id"] == probe_id][0]
    q = spark.createDataFrame(
        [(900, probe_emb)], "vec_id bigint, embedding array<float>"
    )
    pre = simsearch.frozen_top1(
        simsearch.frozen_route(q, cent1, seeds1), indexed1, tombstones=tomb
    ).collect()
    assert len(pre) == 1 and pre[0]["neighbor_id"] in survivors
    assert pre[0]["sim"] == 1.0 and pre[0]["neighbor_id"] == probe_id

    # the report FIRES label 0 (k 2->1) and not label 1
    cells = (
        indexed1.join(tomb.withColumn("_d", F.lit(1)), "vec_id", "left")
        .groupBy(F.col("label").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.coalesce("_d", F.lit(0))).cast("long").alias("n_deleted"),
        )
    )
    rep = {r["cell"]: r for r in
           ingest.index_compact_report(cells, cell_target=8.0).collect()}
    assert rep[0]["k_frozen"] == 2 and rep[0]["k_after"] == 1
    assert rep[0]["compact"] == 1 and rep[1]["compact"] == 0
    assert rep[0]["k_after"] == max(
        1, math.floor(math.sqrt((40 - len(dead0)) / 8.0))
    )
    fired = {c for c, r in rep.items() if r["compact"] == 1}

    cent2, seeds2, indexed2 = simsearch.warm_index_compact(
        seeds1, indexed1, tomb, fired
    )
    cent2, seeds2, indexed2 = (
        cent2.localCheckpoint(),
        seeds2.localCheckpoint(),
        indexed2.localCheckpoint(),
    )

    # (1) deleted data is GONE: postings, seed ids, seed embeddings
    post_ids = [r["vec_id"] for r in indexed2.collect()]
    assert sorted(post_ids) == sorted(survivors)
    s2 = {r["label"]: sorted(s["cell"] for s in r["_seeds"])
          for r in seeds2.collect()}
    assert dead_seed not in set(s2[0]) | set(s2[1])
    # (2) the merge kept the SURVIVING v1 seed's identity: label 0 is
    # one sub-cell named by the surviving seed, so its old members'
    # posting rows need no rename
    assert s2[0] == [keep_seed]
    assert s2[1] == s1[1]
    # (3) non-fired label 1: surviving postings verbatim (zero churn)
    m1 = {r["vec_id"]: (r["label"], r["cell"]) for r in indexed1.collect()}
    mw = {r["vec_id"]: (r["label"], r["cell"]) for r in indexed2.collect()}
    assert all(mw[v] == m1[v] for v in mw if m1[v][0] == 1)
    # (4) churn warm <= cold over the surviving ids
    surv_frame = old.join(tomb, "vec_id", "left_anti")
    seeds_c = dedup._ivf_seeds(surv_frame).localCheckpoint()
    mc = {r["vec_id"]: (r["label"], r["cell"])
          for r in dedup._assign_to_seeds(surv_frame, seeds_c).collect()}
    assert set(mw) == set(mc)
    churn_warm = sum(1 for v in mw if mw[v] != m1[v])
    churn_cold = sum(1 for v in mc if mc[v] != m1[v])
    assert churn_warm <= churn_cold
    # (5) search correctness preserved post-rebuild: the same probe
    # finds the same surviving member at sim 1.0 through v2, and a
    # query AT a deleted vector's embedding never gets that id back
    post = simsearch.frozen_top1(
        simsearch.frozen_route(q, cent2, seeds2), indexed2
    ).collect()
    assert len(post) == 1 and post[0]["neighbor_id"] == probe_id
    assert post[0]["sim"] == 1.0
    dead_emb = [r["embedding"] for r in old.collect()
                if r["vec_id"] == dead0[1]][0]
    qd = spark.createDataFrame(
        [(901, dead_emb)], "vec_id bigint, embedding array<float>"
    )
    ghost = simsearch.frozen_top1(
        simsearch.frozen_route(qd, cent2, seeds2), indexed2
    ).collect()
    assert len(ghost) == 1
    assert ghost[0]["neighbor_id"] is None or ghost[0]["neighbor_id"] in survivors


def test_frozen_index_parquet_round_trip(spark, tmp_path, monkeypatch):
    """Round 13: a frozen-index generation persists to parquet and
    reloads into the same (cent, seeds, indexed) triple — routing,
    top-1, and tombstone-filtered top-1 all byte-equal across the
    round trip, and the loaded posting scan PRUNES to the routed
    label's partition (PartitionFilters in the plan — the label grain
    is free on disk, exactly as the save docstring claims)."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch
    from kafka_flink_exactlyonce_example_spark.plans import plan_string

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old = spark.createDataFrame(
        [(i, 0, [1.0, 0.03 * i, 0.002 * (i * i % 17)]) for i in range(40)]
        + [(100 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(10)],
        "vec_id bigint, label int, embedding array<float>",
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()

    path = str(tmp_path / "ivf_gen1")
    simsearch.save_frozen_index(path, cent1, seeds1, indexed1)
    cent2, seeds2, indexed2 = simsearch.load_frozen_index(spark, path)

    # relation equality (seeds arrays order-normalized per label)
    assert sorted(
        (r["cell"], tuple(r["centroid"])) for r in cent1.collect()
    ) == sorted((r["cell"], tuple(r["centroid"])) for r in cent2.collect())
    norm = lambda rows: sorted(
        (r["label"], tuple(sorted(s["cell"] for s in r["_seeds"])))
        for r in rows
    )
    assert norm(seeds1.collect()) == norm(seeds2.collect())
    assert sorted(
        (r["vec_id"], r["label"], r["cell"]) for r in indexed1.collect()
    ) == sorted((r["vec_id"], r["label"], r["cell"]) for r in indexed2.collect())

    # search equality across the round trip, with and without a
    # tombstone set
    q = spark.createDataFrame(
        [(900, [0.0, 1.0, 0.35]), (901, [1.0, 0.5, 0.01])],
        "vec_id bigint, embedding array<float>",
    )
    tomb = spark.createDataFrame([(107,), (3,)], "vec_id bigint")

    def run(cent, seeds, indexed, ts):
        return sorted(
            tuple(r)
            for r in simsearch.frozen_top1(
                simsearch.frozen_route(q, cent, seeds), indexed,
                tombstones=ts,
            ).collect()
        )

    assert run(cent1, seeds1, indexed1, None) == run(
        cent2, seeds2, indexed2, None
    )
    assert run(cent1, seeds1, indexed1, tomb) == run(
        cent2, seeds2, indexed2, tomb
    )

    # the loaded posting scan prunes by the routed label on disk
    plan = plan_string(indexed2.filter(F.col("label") == 1))
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "label" in seg


def test_combined_wave_warm_cycle_lifecycle(spark, monkeypatch):
    """Round 13: warm_index_cycle — ONE window that both admits and
    deletes, with the SHRINK report firing one cell (takedowns push
    k 2→1) and the GROWTH report firing another (admits push k 1→2),
    rebuilt in one pass: deleted data gone everywhere, the shrink
    cell merges onto its surviving seed, the grow cell splits KEEPING
    its old seed identity, the untouched cell churns zero rows, a
    brand-new lake label indexes cold-identically, and an admit that
    was tombstoned within the same window never enters the index."""
    from kafka_flink_exactlyonce_example_spark.operators import ingest, simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old_rows = (
        [(i, 0, [1.0, 0.03 * i, 0.002 * (i * i % 17)]) for i in range(40)]
        + [(100 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(10)]
        + [(200 + i, 2, [0.0, 0.05 * i, 1.0]) for i in range(10)]
    )
    old = spark.createDataFrame(
        old_rows, "vec_id bigint, label int, embedding array<float>"
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()
    s1 = {r["label"]: sorted(s["cell"] for s in r["_seeds"])
          for r in seeds1.collect()}
    assert len(s1[0]) == 2 and len(s1[1]) == 1 and len(s1[2]) == 1

    # the window: delete 26 of label 0 (incl. one seed) -> shrink
    # fires; admit 30 vectors routed to cell 1 -> growth fires; admit
    # one brand-new lake label 7; admit one vector into untouched
    # cell 2 and tombstone it IN THE SAME WINDOW
    dead_seed, keep_seed = s1[0][1], s1[0][0]
    dead0 = [dead_seed] + [
        i for i in range(40) if i not in (dead_seed, keep_seed)
    ][:25]
    dead = sorted(dead0) + [777]
    tomb = spark.createDataFrame([(d,) for d in dead], "vec_id bigint")
    admits = (
        [(500 + i, 1, s1[1][0], [0.0, 1.0, 0.03 * i]) for i in range(30)]
        + [(600, 7, s1[1][0], [0.5, 0.5, 0.5])]
        + [(777, 2, s1[2][0], [0.0, 0.1, 1.0])]
    )
    adm_routed = spark.createDataFrame(
        admits, "vec_id bigint, cell int, icell bigint, embedding array<float>"
    )
    adm_lake = spark.createDataFrame(
        [(500 + i, 1, [0.0, 1.0, 0.03 * i]) for i in range(30)]
        + [(600, 7, [0.5, 0.5, 0.5])],
        "vec_id bigint, label int, embedding array<float>",
    )
    merged = (
        old.join(tomb, "vec_id", "left_anti").unionByName(adm_lake)
    )

    # BOTH reports, and each fires its own cell
    oldcells = indexed1.groupBy(F.col("label").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_old")
    )
    newcells = (
        adm_routed.join(tomb, "vec_id", "left_anti")
        .filter(F.col("cell") != 7)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )
    grow = {r["cell"] for r in ingest.index_refresh_report(
        oldcells, newcells, cell_target=8.0).collect() if r["rebuild"] == 1}
    dcells = (
        indexed1.join(tomb.withColumn("_d", F.lit(1)), "vec_id", "left")
        .groupBy(F.col("label").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.coalesce("_d", F.lit(0))).cast("long").alias("n_deleted"),
        )
    )
    shrink = {r["cell"] for r in ingest.index_compact_report(
        dcells, cell_target=8.0).collect() if r["compact"] == 1}
    assert grow == {1} and shrink == {0}
    fired = grow | shrink

    cent2, seeds2, indexed2 = simsearch.warm_index_cycle(
        merged, seeds1, indexed1, adm_routed, tomb, fired
    )
    cent2, seeds2, indexed2 = (
        cent2.localCheckpoint(),
        seeds2.localCheckpoint(),
        indexed2.localCheckpoint(),
    )
    want_ids = sorted(
        ({r[0] for r in old_rows} - set(dead))
        | {500 + i for i in range(30)}
        | {600}
    )
    got = [r["vec_id"] for r in indexed2.collect()]
    assert sorted(got) == want_ids, "membership broke (777 or a dead id?)"
    assert len(got) == len(set(got))
    s2 = {r["label"]: sorted(s["cell"] for s in r["_seeds"])
          for r in seeds2.collect()}
    # shrink cell merged onto its surviving seed
    assert s2[0] == [keep_seed]
    # grow cell split to 2, KEEPING the old seed identity
    assert len(s2[1]) == 2 and s1[1][0] in s2[1]
    # untouched cell: seeds + postings verbatim
    assert s2[2] == s1[2]
    m1 = {r["vec_id"]: (r["label"], r["cell"]) for r in indexed1.collect()}
    mw = {r["vec_id"]: (r["label"], r["cell"]) for r in indexed2.collect()}
    assert all(mw[v] == m1[v] for v in mw if v in m1 and m1[v][0] == 2)
    # brand-new label: cold-identical seeding at its lake label
    assert s2[7] == [600] and mw[600] == (7, 600)
    # the same-window admit+takedown never became a seed either
    assert 777 not in {c for cs in s2.values() for c in cs}
    # search sanity: an admitted vector is findable at sim 1.0, a
    # deleted one never comes back
    q = spark.createDataFrame(
        [(900, [0.0, 1.0, 0.03 * 7])], "vec_id bigint, embedding array<float>"
    )
    hit = simsearch.frozen_top1(
        simsearch.frozen_route(q, cent2, seeds2), indexed2
    ).collect()
    assert len(hit) == 1 and hit[0]["sim"] == 1.0
    assert hit[0]["neighbor_id"] in {107, 507}
    dead_emb = [r[2] for r in old_rows if r[0] == dead0[1]][0]
    qd = spark.createDataFrame(
        [(901, dead_emb)], "vec_id bigint, embedding array<float>"
    )
    ghost = simsearch.frozen_top1(
        simsearch.frozen_route(qd, cent2, seeds2), indexed2
    ).collect()
    assert len(ghost) == 1 and ghost[0]["neighbor_id"] not in set(dead)


def test_bucketed_generation_tombstone_join_no_shuffle(
    spark, tmp_path, monkeypatch
):
    """Round 13: the at-scale tombstone shape EXECUTED — a generation
    persisted via save_frozen_index_bucketed plus a takedown wave
    written in the same (vec_id, n_buckets) layout anti-join with
    ZERO Exchange on either side (the corpus-wide reshuffle the
    generic anti-join would pay past the broadcast threshold is paid
    once at write time instead), with results and tombstone-filtered
    search byte-equal to the in-memory filter."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch
    from kafka_flink_exactlyonce_example_spark.plans import plan_string

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old = spark.createDataFrame(
        [(i, 0, [1.0, 0.03 * i, 0.002 * (i * i % 17)]) for i in range(40)]
        + [(100 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(10)],
        "vec_id bigint, label int, embedding array<float>",
    )
    cent1, seeds1 = simsearch.frozen_index_frames(old)
    cent1, seeds1 = cent1.localCheckpoint(), seeds1.localCheckpoint()
    indexed1 = dedup._assign_to_seeds(old, seeds1).localCheckpoint()
    tomb = spark.createDataFrame(
        [(107,), (3,), (17,)], "vec_id bigint"
    )

    path = str(tmp_path / "ivf_gen1_bucketed")
    simsearch.save_frozen_index_bucketed(
        path, "g1b", cent1, seeds1, indexed1
    )
    simsearch.save_tombstones_bucketed(tomb, "g1b", str(tmp_path / "tomb"))
    try:
        cent2, seeds2, indexed2 = simsearch.load_frozen_index_bucketed(
            spark, path, "g1b"
        )
        wave = spark.table("g1b_tombstones")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            filt = simsearch.tombstone_filter(indexed2, wave)
            plan = plan_string(filt)
            assert "Exchange" not in plan, (
                f"bucketed tombstone anti-join still shuffles:\n{plan}"
            )
            assert "SortMergeJoin" in plan and "LeftAnti" in plan
            got = sorted(
                (r["vec_id"], r["label"], r["cell"]) for r in filt.collect()
            )
            want = sorted(
                (r["vec_id"], r["label"], r["cell"])
                for r in simsearch.tombstone_filter(indexed1, tomb).collect()
            )
            assert got == want
            # deleted ids are gone, survivors intact
            assert not {3, 17, 107} & {v for v, _, _ in got}
            assert len(got) == 47
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # tombstone-filtered search over the bucketed generation
        # matches the in-memory run exactly
        q = spark.createDataFrame(
            [(900, [0.0, 1.0, 0.35]), (901, [1.0, 0.5, 0.01])],
            "vec_id bigint, embedding array<float>",
        )

        def run(cent, seeds, indexed, ts):
            return sorted(
                tuple(r)
                for r in simsearch.frozen_top1(
                    simsearch.frozen_route(q, cent, seeds),
                    indexed,
                    tombstones=ts,
                ).collect()
            )

        assert run(cent2, seeds2, indexed2, wave) == run(
            cent1, seeds1, indexed1, tomb
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS g1b_postings")
        spark.sql("DROP TABLE IF EXISTS g1b_tombstones")


def test_frozen_topk_rank1_equals_top1_and_list_contract(spark, monkeypatch):
    """frozen_topk is frozen_top1 with the rank filter widened — kept
    as a separate function so the three graded top-1 consumers' plans
    stay byte-identical, with THIS test as the drift pin: rank-1 rows
    equal frozen_top1 exactly (with and without a tombstone set), the
    list is rank-dense and sim-monotone per probe, a sub-cell with
    fewer than k survivors yields a SHORT list, and an emptied cell
    yields the explicit NULL row (the totality contract verbatim)."""
    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    monkeypatch.setattr(dedup, "_CELL_TARGET", 8)
    monkeypatch.setattr(dedup, "_SEED_OVERSAMPLE", 10**9)
    old = spark.createDataFrame(
        [(i, 0, [1.0, 0.03 * i, 0.002 * (i * i % 17)]) for i in range(40)]
        + [(100 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(4)],
        "vec_id bigint, label int, embedding array<float>",
    )
    cent, seeds = simsearch.frozen_index_frames(old)
    cent, seeds = cent.localCheckpoint(), seeds.localCheckpoint()
    indexed = dedup._assign_to_seeds(old, seeds).localCheckpoint()
    q = spark.createDataFrame(
        [(900, [0.0, 1.0, 0.35]), (901, [1.0, 0.5, 0.01])],
        "vec_id bigint, embedding array<float>",
    )
    routed = simsearch.frozen_route(q, cent, seeds).localCheckpoint()

    for tomb in (None, spark.createDataFrame([(3,), (101,)], "vec_id bigint")):
        k5 = simsearch.frozen_topk(routed, indexed, 5, tombstones=tomb)
        rows = k5.collect()
        top1 = sorted(
            tuple(r)
            for r in simsearch.frozen_top1(
                routed, indexed, tombstones=tomb
            ).collect()
        )
        rank1 = sorted(
            (r["vec_id"], r["cell"], r["neighbor_id"], r["sim"])
            for r in rows
            if r["nb_rank"] == 1
        )
        assert rank1 == top1
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r["vec_id"], []).append(r)
        for vid, lst in by_probe.items():
            lst.sort(key=lambda r: r["nb_rank"])
            assert [r["nb_rank"] for r in lst] == list(
                range(1, len(lst) + 1)
            ), "rank not dense"
            sims = [r["sim"] for r in lst if r["sim"] is not None]
            assert sims == sorted(sims, reverse=True), "list not sim-sorted"
        # tombstoned ids never served at any rank
        if tomb is not None:
            assert not {3, 101} & {
                r["neighbor_id"] for r in rows if r["neighbor_id"] is not None
            }
            # label-1's cell had 4 members, 1 tombstoned -> 3 < k:
            # short list, not padding
            lab1 = [r for r in rows if r["cell"] == 1]
            assert 0 < len(lab1) < 5

    # emptied cell: tombstone every label-1 member -> explicit NULL row
    wipe = spark.createDataFrame(
        [(100 + i,) for i in range(4)], "vec_id bigint"
    )
    rows = simsearch.frozen_topk(routed, indexed, 5, tombstones=wipe).collect()
    nulls = [r for r in rows if r["neighbor_id"] is None]
    assert len(nulls) == 1 and nulls[0]["nb_rank"] == 1


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_serve_topk_label_grain_equals_subcell_topk(spark, sf_dir):
    """ADVICE r13: q_serve_topk (and the churn chain's gen-2 side)
    ranks neighbors within the routed SUB-CELL while the DuckDB oracle
    ranks over the whole coarse label; at k=3 the required agreement —
    the label-grain top-3 all living in the probe's one sub-cell — is
    strictly stronger than the top-1 convention
    test_graded_sfs_stay_under_split_threshold was written for, and
    was previously protected only by the hash grade itself. Assert
    the equality DIRECTLY on the graded corpora (the k=1 collapse
    makes sub-cell == label there), so a testdata regeneration fails
    HERE with the right diagnosis instead of as an opaque driver
    hash mismatch on q_serve_topk."""
    from pyspark.sql import Window

    from kafka_flink_exactlyonce_example_spark.operators import simsearch

    cent, seeds = simsearch.inc_index_build(spark, sf_dir)
    tagged = simsearch._inc_tagged(spark, sf_dir)
    old = tagged.filter(~F.col("is_new")).select(
        "vec_id", "label", "embedding"
    )
    new = tagged.filter(F.col("is_new")).select("vec_id", "embedding")
    routed = simsearch.frozen_route(new, cent, seeds).localCheckpoint()
    sub = simsearch.frozen_topk(
        routed, dedup._assign_to_seeds(old, seeds), simsearch._SERVE_K
    )
    x = old.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("xe"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim_raw"), F.col("neighbor_id")
    )
    lab = (
        routed.select("vec_id", "cell", "embedding")
        .join(x, "cell", "left")
        .select(
            "vec_id",
            "cell",
            "neighbor_id",
            simsearch.cosine(F.col("embedding"), F.col("xe")).alias(
                "sim_raw"
            ),
        )
        .withColumn("nb_rank", F.row_number().over(w))
        .filter(F.col("nb_rank") <= simsearch._SERVE_K)
        .select(
            "vec_id",
            "cell",
            "nb_rank",
            "neighbor_id",
            F.round("sim_raw", 6).alias("sim"),
        )
    )
    assert sorted(map(tuple, sub.collect())) == sorted(
        map(tuple, lab.collect())
    ), f"label-grain top-{simsearch._SERVE_K} != sub-cell top-k at {sf_dir}"


def test_fired_rebuild_executes_the_split(spark, registry_loaded):
    """q_fired_rebuild's docstring claims, asserted live (round 16,
    VERDICT r15 item 1's done criterion): the report FIRES at the
    graded SF (n_fired >= 1), the fired label's postings split into
    exactly TWO sub-cells (k 1→2) — one keeping the planted seed's
    identity, one seeded by a ranked extra — their membership sums to
    the fired population, and every non-fired label keeps exactly one
    sub-cell. Fired-sensitivity: skipping the retrain would collapse
    the fired label's rows to one, so the 2-row shape IS the branch
    executing."""
    from tests.conftest import SMOKE_SF

    rows = registry_loaded.QUERIES["q_fired_rebuild"](
        spark, SMOKE_SF
    ).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    fired = {lb: rs for lb, rs in by_label.items() if rs[0]["fired"] == 1}
    assert len(fired) >= 1, "the trigger must fire at every graded SF"
    for lb, rs in by_label.items():
        if lb in fired:
            assert len(rs) == 2, f"fired label {lb} must split 1→2"
            # the retrain population is exactly what the report
            # counted: old members by lake label + admits by routed
            # cell — so the two sub-cells' membership sums to
            # n_old + n_admitted of THIS cell
            total = sum(r["n_members"] for r in rs)
            assert total == rs[0]["n_old"] + rs[0]["n_admitted"]
            assert all(r["n_members"] >= 1 for r in rs), (
                "a retrained sub-cell must hold its seed at least"
            )
        else:
            assert len(rs) == 1, f"non-fired label {lb} grew sub-cells"

    # the planted seed's identity is retained: one of the fired
    # sub-cell ids is the label's md5-minimal member (the planted
    # gen-1 seed), the _warm_subseeds keep contract
    from kafka_flink_exactlyonce_example_spark.operators.ingest import (
        _fr_seeds,
    )
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _inc_tagged,
    )

    old = (
        _inc_tagged(spark, SMOKE_SF)
        .filter(~F.col("is_new"))
        .select("vec_id", "label", "embedding")
    )
    planted = {
        r["label"]: r["_seeds"][0]["cell"]
        for r in _fr_seeds(old).collect()
    }
    for lb, rs in fired.items():
        cells = {r["cell"] for r in rs}
        assert planted[lb] in cells, (
            "the 1→2 split must KEEP the planted seed's identity"
        )


def test_warm_subseeds_cell_target_threads(spark):
    """Round 16: warm_index_cycle's call-time cell_target reaches
    _warm_subseeds' k recompute — the same population retrains to
    k = 1 under the global law (4096 target) but splits to k = 2 under
    a retuned target, keeping the old seed both times."""
    from kafka_flink_exactlyonce_example_spark.operators.dedup import (
        _assign_to_seeds,
    )
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        warm_index_cycle,
    )

    vecs = spark.createDataFrame(
        [
            (i, 0, [1.0, 0.01 * i, 0.02 * ((i * 3) % 5)])
            for i in range(1, 17)
        ],
        "vec_id bigint, label int, embedding array<float>",
    )
    seeds1 = vecs.limit(0).sparkSession.createDataFrame(
        [(0, [(1, [1.0, 0.01, 0.06])])],
        "label int, _seeds array<struct<cell: bigint, seed: array<float>>>",
    )
    indexed1 = _assign_to_seeds(vecs, seeds1)

    # global law: 16 members / 4096 → k stays 1, postings unchanged
    _c, s_def, i_def = warm_index_cycle(
        vecs, seeds1, indexed1, None, None, [0]
    )
    assert {r["cell"] for r in i_def.collect()} == {1}

    # retuned law: 16 / 4.0 → k = 2, the old seed cell survives and
    # one extra joins it
    _c, s_new, i_new = warm_index_cycle(
        vecs, seeds1, indexed1, None, None, [0], cell_target=4.0
    )
    cells = {r["cell"] for r in i_new.collect()}
    assert len(cells) == 2 and 1 in cells


def test_fired_merge_keeps_surviving_seed(spark, registry_loaded):
    """q_fired_merge's docstring claims, asserted live: exactly one
    label fires, its postings collapse 2→1 onto the md5-first
    SURVIVING planted seed's cell id, the merged membership equals the
    label's survivor count, and every non-fired label keeps two
    sub-cells with only tombstoned rows removed."""
    from tests.conftest import SMOKE_SF

    from kafka_flink_exactlyonce_example_spark.operators.ingest import (
        _fr_seeds,
        _is_del_col,
    )
    from kafka_flink_exactlyonce_example_spark.operators.simsearch import (
        _inc_tagged,
    )

    rows = registry_loaded.QUERIES["q_fired_merge"](
        spark, SMOKE_SF
    ).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    fired = {lb: rs for lb, rs in by_label.items() if rs[0]["fired"] == 1}
    assert len(fired) == 1, "exactly the argmax cell must fire"
    for lb, rs in by_label.items():
        if lb in fired:
            assert len(rs) == 1, f"fired label {lb} must merge 2→1"
            assert rs[0]["n_members"] == rs[0]["n_before"] - rs[0]["n_deleted"]
        else:
            assert len(rs) == 2, f"non-fired label {lb} lost a sub-cell"
            total = sum(r["n_members"] for r in rs)
            assert total == rs[0]["n_before"] - rs[0]["n_deleted"], (
                "non-fired labels drop only the tombstoned rows"
            )

    old = (
        _inc_tagged(spark, SMOKE_SF)
        .filter(~F.col("is_new"))
        .select("vec_id", "label", "embedding")
    )
    deleted = {
        r["vec_id"]
        for r in old.filter(_is_del_col()).select("vec_id").collect()
    }
    planted = {
        r["label"]: [s["cell"] for s in r["_seeds"]]
        for r in _fr_seeds(old, k=2).collect()
    }
    (lb, rs), = fired.items()
    survivors = [c for c in sorted(planted[lb]) if c not in deleted]
    # the retained cell id is the md5-first surviving seed — recompute
    # the md5 order the way _warm_subseeds ranks it
    import hashlib

    keep = min(
        survivors,
        key=lambda c: (hashlib.md5(f"seed:{c}".encode()).hexdigest(), c),
    )
    assert rs[0]["cell"] == keep, (
        "the merge must keep the md5-first surviving seed's identity"
    )
