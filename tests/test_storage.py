"""Storage-layout tests: partition pruning, bucketed co-located joins,
multi-format round-trips, and the DataFrame-vs-SQL cross-check
(SURVEY.md §3.2(b), §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF
from kafka_flink_exactlyonce_example_spark.plans import plan_string
from kafka_flink_exactlyonce_example_spark.sources import (
    read_any,
    table,
    write_bucketed,
    write_partitioned,
)


def test_partition_pruning(spark, tmp_path):
    """Filter on the partition column must prune at the directory level
    (PartitionFilters in the scan), not post-scan."""
    ev = table(spark, SMOKE_SF, "events")
    path = str(tmp_path / "events_part")
    write_partitioned(ev, path, "event_type")
    got = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = plan_string(got)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].splitlines()[0]
    assert got.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts:
    the join runs with ZERO Exchange — the write-once-shuffle layout
    for repeated fact-fact joins at 100 TB."""
    li = table(spark, SMOKE_SF, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SMOKE_SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", str(tmp_path / "li"), 8, "l_orderkey")
    write_bucketed(o, "o_bucketed", str(tmp_path / "o"), 8, "o_orderkey")
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("li_bucketed").join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = plan_string(j)
            assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
            assert "SortMergeJoin" in plan
            # sanity: result matches the unbucketed join
            expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
            assert j.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_format_round_trips(spark, tmp_path):
    """nation survives csv / json / orc round-trips byte-identically
    (schema declared on read — no inference)."""
    n = table(spark, SMOKE_SF, "nation")
    schema = "n_nationkey bigint, n_name string, n_regionkey bigint"
    expect = sorted(map(tuple, n.select("n_nationkey", "n_name", "n_regionkey").collect()))
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / fmt)
        w = n.select("n_nationkey", "n_name", "n_regionkey").write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        got = read_any(spark, path, fmt, schema=None if fmt == "orc" else schema)
        assert sorted(map(tuple, got.collect())) == expect, f"{fmt} round-trip diverged"


def test_dataframe_vs_sql_forms_agree(spark, registry_loaded):
    """SURVEY §3.2(b): the SQL entry point produces identical results to
    the DataFrame form. For every oracle whose SQL happens to be
    dialect-portable, run the SAME text through spark.sql and compare
    against the DataFrame form — three engines (Spark-DF, Spark-SQL,
    DuckDB) agreeing on one text is the strongest cross-check we have.
    DuckDB-only constructs (unnest, list_*, time_bucket, ASOF) fail to
    parse on Spark and are skipped; require a healthy floor of portable
    ones so the test can't silently go vacuous."""
    from kafka_flink_exactlyonce_example_spark.sources import register_views

    register_views(spark, SMOKE_SF)
    ran, diverged = [], []
    for qname, sql in registry_loaded.ORACLES.items():
        try:
            sql_form = spark.sql(sql).toPandas()
        except Exception:
            continue  # DuckDB-dialect oracle: not portable, fine
        df_form = registry_loaded.QUERIES[qname](spark, SMOKE_SF).toPandas()
        cols = sorted(df_form.columns)
        if sorted(sql_form.columns) != cols or len(sql_form) != len(df_form):
            diverged.append(f"{qname}: shape mismatch")
            continue
        a = df_form[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = sql_form[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = b.astype(a.dtypes.to_dict(), errors="ignore")
        if not a.equals(b):
            diverged.append(f"{qname}: values differ between DF and SQL forms")
        else:
            ran.append(qname)
    assert not diverged, "; ".join(diverged)
    assert len(ran) >= 5, f"too few portable oracles ran on Spark SQL: {ran}"
