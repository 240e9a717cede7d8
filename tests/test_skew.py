"""Skew-mitigation correctness: salted plans must equal their plain
counterparts (the optimization is a physical rewrite, never a semantic
one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from kafka_flink_exactlyonce_example_spark.functions.skew import (
    salted_count_sum,
    salted_join,
)
from kafka_flink_exactlyonce_example_spark.sources import table


def _skewed_events(spark, sf_dir):
    """events with a synthetic hot key: fold 80% of user_ids to 0."""
    ev = table(spark, sf_dir, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 5 != 0, F.lit(0)).otherwise(F.col("user_id")),
    )


def test_salted_join_equals_plain_join(spark):
    ev = _skewed_events(spark, SMOKE_SF)
    dims = (
        table(spark, SMOKE_SF, "customer")
        .select((F.col("c_custkey") % 50).alias("user_id"))
        .distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    )
    plain = ev.join(dims, "user_id").groupBy("segment").count()
    salted = (
        salted_join(ev, dims, "user_id", n_salts=8, salt_by="event_id")
        .groupBy("segment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    ev = _skewed_events(spark, SMOKE_SF).limit(200)
    dims = (
        table(spark, SMOKE_SF, "customer")
        .select((F.col("c_custkey") % 7).alias("user_id"))
        .distinct()
        .withColumn("segment", F.lit("s"))
    )
    plain = ev.join(dims, "user_id", "left").count()
    salted = salted_join(ev, dims, "user_id", n_salts=4, how="left", salt_by="event_id").count()
    assert plain == salted


def test_salted_agg_equals_plain_agg(spark):
    ev = _skewed_events(spark, SMOKE_SF)
    plain = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .withColumn("total", F.round("total", 4))
    )
    salted = salted_count_sum(
        ev, ["user_id"], {"total": "value"}, n_salts=8
    ).withColumn("total", F.round("total", 4))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_skew_join_splits_hot_partition(spark):
    """The OTHER skew weapon (besides salting): AQE's runtime skew-join
    split. A 600k-row hot key against a 10k-key dim must come out of
    adaptive planning as SortMergeJoin(skew=true) with an
    AQEShuffleRead marked 'skewed' — and the answer must equal the
    non-skew-aware plan's. This is the config posture we'd run at
    100 TB, where salting is the fallback for joins AQE can't split
    (e.g. when the hot side feeds a window)."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 601000).select(
            F.when(F.col("id") < 600000, 0)
            .otherwise(F.col("id") % 10000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), F.lit(1).alias("y")
        )
        j = left.join(right, "k").select(F.sum(F.length("pad")).alias("s"))
        got = j.collect()[0]["s"]
        want = left.select(F.sum(F.length("pad")).alias("s")).collect()[0]["s"]
        assert got == want  # every left key has exactly one dim match
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "simple"
        )
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_join_equals_unsalted(spark, registry_loaded):
    """The correctness claim of q_salted_join: summing the per-salt
    rows reproduces EXACTLY the unsalted join's totals — salting
    re-routes rows across reducers, it must never change results."""
    from pyspark.sql import functions as F

    from kafka_flink_exactlyonce_example_spark.functions.money import cents
    from kafka_flink_exactlyonce_example_spark.sources import table
    from tests.conftest import SMOKE_SF

    salted = registry_loaded.QUERIES["q_salted_join"](spark, SMOKE_SF).collect()
    li = table(spark, SMOKE_SF, "lineitem")
    s = table(spark, SMOKE_SF, "supplier")
    plain = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                cents(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            ).alias("revenue_cents"),
        )
        .collect()[0]
    )
    assert sum(r["n_rows"] for r in salted) == plain["n_rows"]
    assert sum(r["revenue_cents"] for r in salted) == plain["revenue_cents"]
    # the balance the salt buys: no salt bucket holds more than 2x the
    # uniform share of rows
    rows = [r["n_rows"] for r in salted]
    assert max(rows) <= 2 * (sum(rows) / len(rows))


def test_char_ngram_survives_heavy_hitter_gram(spark, tmp_path, registry_loaded):
    """Round-8 hazard fix: a boilerplate gram shared by EVERY document
    makes each of its postings df = n_docs; the pair generation must
    stream per-anchor suffixes (O(df) per row) instead of
    materializing C(df,2) structs in one row. 300 docs sharing a
    16-char prefix → the heavy postings carry ~45k pairs each; the
    query must complete and still find the one true duplicate pair."""
    import pandas as pd

    boiler = "SHARED-BOILER-16"  # exactly 16 chars -> one shared gram per doc
    rows = []
    for i in range(300):
        rows.append((i, boiler + f" unique tail number {i} with words {i*7}", "en"))
    # one exact duplicate pair (jaccard 1.0)
    rows.append((1000, boiler + " duplicated document body text", "en"))
    rows.append((1001, boiler + " duplicated document body text", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "synthetic"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(str(tmp_path / "documents.parquet"))

    out = registry_loaded.QUERIES["q_char_ngram"](spark, str(tmp_path)).collect()
    dup = [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in out]
    assert (1000, 1001, 1.0) in dup, f"missing exact-dup pair: {dup[:5]}"
    # boilerplate-only overlaps must NOT cross the 0.8 threshold
    assert all(a == 1000 and b == 1001 for a, b, _ in dup), dup


def test_char_ngram_df_cap_fires_and_stays_oracle_exact(
    spark, tmp_path, registry_loaded
):
    """Round-9 (ADVICE r08): grams with df > _MAX_DF (1024) are
    boilerplate and must be dropped from BOTH sides of the Jaccard —
    no posting array above the cap ever materializes. 1100 documents
    share one 16-char boilerplate gram (df = 1102 > 1024), so the cap
    FIRES here (unlike the 302-doc round-8 stress test, which pins the
    nested-explode streaming below the cap). The true duplicate pair
    shares the boilerplate too: its Jaccard must still be exactly 1.0
    over the surviving discriminative grams, boilerplate-only overlap
    must stay below threshold, and — the real bar — DuckDB running the
    mirrored oracle on the SAME synthetic corpus must agree exactly."""
    import duckdb
    import pandas as pd

    from kafka_flink_exactlyonce_example_spark.operators import datamgmt
    from kafka_flink_exactlyonce_example_spark.registry import ORACLES

    boiler = "SHARED-BOILER-16"  # exactly 16 chars -> one shared gram
    rows = []
    for i in range(1100):
        rows.append((i, boiler + f" unique tail number {i} with words {i * 7}", "en"))
    rows.append((2000, boiler + " duplicated document body text", "en"))
    rows.append((2001, boiler + " duplicated document body text", "en"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["source"] = "synthetic"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    assert len(pdf) > datamgmt._MAX_DF  # the shared gram exceeds the cap

    out = registry_loaded.QUERIES["q_char_ngram"](spark, str(tmp_path)).collect()
    dup = sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in out)
    assert (2000, 2001, 1.0) in dup, f"missing exact-dup pair: {dup[:5]}"
    assert all(a == 2000 and b == 2001 for a, b, _ in dup), dup

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = sorted(
        (int(a), int(b), float(j))
        for a, b, j in con.execute(ORACLES["q_char_ngram"]).fetchall()
    )
    con.close()
    assert oracle == dup, f"cap semantics diverged: spark={dup} duck={oracle}"
