"""Similarity search over embeddings (SURVEY.md §2.10).

Brute-force cosine is the exactness baseline: a broadcast of the query
vector + a codegen'd higher-order-function scan — embarrassingly
parallel, and at 100 TB it is a single pass with no shuffle until the
final top-k (TakeOrderedAndProject). The IVF variant is the scale path:
probe only the nearest coarse cells, cutting the scan by the fan-out
ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.similarity import (
    cosine,
    cosine_sql,
    dot,
)
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH anchor AS (SELECT embedding AS a FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({cosine_sql('embedding', 'a')}, 6) AS sim
    FROM embeddings, anchor
    WHERE vec_id <> 0
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs anchor vec_id=0. Ordering is on the
    rounded score (+ unique tie-break) so both engines rank identically."""
    emb = table(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("a")), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "q_label_sim",
    oracle=f"""
    SELECT e1.label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG({cosine_sql('e1.embedding', 'e2.embedding')}), 6) AS avg_sim
    FROM embeddings e1 JOIN embeddings e2
      ON e1.label = e2.label AND e1.vec_id < e2.vec_id
    GROUP BY e1.label
    """,
)
def q_label_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average intra-cluster cosine per label: equi-join on the label
    (hash-partitioned, pairs never leave their label's partition)."""
    emb = table(spark, sf_dir, "embeddings")
    e1 = emb.select("label", F.col("vec_id").alias("v1"), F.col("embedding").alias("a"))
    e2 = emb.select(
        F.col("label").alias("label2"),
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("b"),
    )
    par = spark.sparkContext.defaultParallelism
    return (
        # broadcast the build side: a label-equi SMJ would shuffle into
        # 10 heavily-skewed keys; BHJ streams pairs with no exchange.
        # repartition the probe side: the table is one parquet partition
        # at this size and the O(pairs·dim) dot products must spread.
        e1.repartition(par)
        .join(F.broadcast(e2), (e1.label == e2.label2) & (e1.v1 < e2.v2))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(cosine(F.col("a"), F.col("b"))), 6).alias("avg_sim"),
        )
    )


@query(
    "q_ann_ivf",
    oracle=f"""
    WITH cent AS (
        SELECT label, list(m ORDER BY i) AS centroid
        FROM (
            SELECT label, i, AVG(CAST(embedding[i] AS DOUBLE)) AS m
            FROM embeddings, generate_series(1, 64) t(i)
            GROUP BY label, i
        )
        GROUP BY label
    ),
    anchor AS (SELECT embedding AS a FROM embeddings WHERE vec_id = 0),
    cells AS (
        SELECT label
        FROM cent, anchor
        ORDER BY {cosine_sql('centroid', 'a')} DESC, label
        LIMIT 2
    )
    SELECT e.vec_id, e.label,
           ROUND({cosine_sql('e.embedding', 'a')}, 6) AS sim
    FROM embeddings e JOIN cells USING (label), anchor
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor.

    Coarse quantizer = per-label centroids (computed with a
    posexplode → per-dimension avg → re-assembled array — all native).
    Probe: rank cells by centroid similarity to the anchor, scan only
    the top-2 cells, return the top-10 by true cosine. At 100 TB this
    scans ~nprobe/ncells of the data instead of all of it; centroids
    are a broadcast-sized side table.
    """
    emb = table(spark, sf_dir, "embeddings")
    # per-dimension centroid means, re-assembled in dimension order
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("centroid")
        )
    )
    anchor = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    top_cells = (
        cent.crossJoin(F.broadcast(anchor))
        .select("label", cosine(F.col("centroid"), F.col("a")).alias("cell_sim"))
        .orderBy(F.desc("cell_sim"), "label")
        .limit(2)
        .select("label", "cell_sim")
    )
    return (
        emb.join(F.broadcast(top_cells), "label")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("a")), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "q_knn_join",
    oracle=f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS p
        FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
        SELECT probe_id, e.vec_id,
               ROUND({cosine_sql('e.embedding', 'p')}, 6) AS sim
        FROM embeddings e, probes
        WHERE e.vec_id <> probe_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY sim DESC, vec_id
        ) AS rn
        FROM scored
    )
    SELECT probe_id, vec_id, sim FROM ranked WHERE rn <= 3
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbors join: for each of the first 20 vectors, the
    3 nearest others by cosine — ranked-window over a broadcast probe
    join (probe side small; data side streams)."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p")
    )
    scored = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("p")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_centroid",
    oracle="""
    WITH m AS (
        SELECT label, i,
               avg(CAST(embedding[i] AS DOUBLE)) AS m1,
               avg(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))
                 AS m2
        FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
        GROUP BY label, i
    ), agg AS (
        SELECT label, sum(m1*m1) AS cn2, sum(m2 - m1*m1) AS inertia
        FROM m GROUP BY label
    ), n AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM embeddings GROUP BY label
    )
    SELECT label, n_vecs,
           round(sqrt(cn2), 6) AS centroid_norm,
           round(inertia, 6) AS inertia
    FROM agg JOIN n USING (label)
    """,
)
def q_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm and inertia (avg squared distance to the
    centroid) — the k-means/IVF quality gauges for q_ann_ivf's cells.

    Single-pass via the moment identity: with c = E[x],
    E[|x − c|²] = Σ_i (E[x_i²] − E[x_i]²), so one posexplode +
    per-(label, dim) avg/avg-of-squares aggregation replaces the naive
    two-pass plan (compute centroid, join it back, re-scan to measure
    distances). At 100 TB that saves a full second scan of the vector
    corpus and the centroid broadcast. Elements cast to double BEFORE
    squaring in both engines (float*float would round differently)."""
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")
    m = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(v).alias("m1"), F.avg(v * v).alias("m2"))
    )
    agg = m.groupBy("label").agg(
        F.sum(F.col("m1") * F.col("m1")).alias("cn2"),
        F.sum(F.col("m2") - F.col("m1") * F.col("m1")).alias("inertia"),
    )
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        agg.join(F.broadcast(n), "label")
        .select(
            "label",
            "n_vecs",
            F.round(F.sqrt("cn2"), 6).alias("centroid_norm"),
            F.round("inertia", 6).alias("inertia"),
        )
    )
