"""Window functions (SURVEY.md §2.5).

Determinism rules: ``rank``/``dense_rank`` order by the (tied) measure
only — tie order doesn't affect their output; ``row_number`` and frame
aggregates always order by a unique key suffix. Partition-by keys keep
state bounded per key, the same property that makes these viable over
100 TB (each partition sorts independently after a hash exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents, cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
           CAST(rank()       OVER w1 AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
           CAST(row_number() OVER w2 AS BIGINT) AS rn
    FROM lineitem
    WINDOW w1 AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC),
           w2 AS (PARTITION BY l_returnflag
                  ORDER BY l_quantity DESC, l_orderkey, l_linenumber)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w1 = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    w2 = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_quantity"), "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.rank().over(w1).cast("long").alias("rnk"),
        F.dense_rank().over(w1).cast("long").alias("drnk"),
        F.row_number().over(w2).cast("long").alias("rn"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window + filter — the distributed
    top-k idiom (no global sort; each group's heap stays in its task)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_val,
           last_value(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wfull).alias("first_val"),
        F.last("value").over(wfull).alias("last_val"),
    )


@query(
    "q_win_running_sum",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM({cents_sql('l_extendedprice')}) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_price_cents,
           ROUND(AVG(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_qty
    FROM lineitem
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data
    # (sf0.1 has one (suppkey, shipdate, orderkey, linenumber) tie) —
    # l_partkey makes the frame order total, so ROWS frames are
    # deterministic across engines and runs.
    order = [
        F.col("l_shipdate"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_partkey"),
    ]
    wrun = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wmov = Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(cents("l_extendedprice")).over(wrun).alias("run_price_cents"),
        F.round(F.avg("l_quantity").over(wmov), 6).alias("mov_avg_qty"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
    FROM customer
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global acctbal quartiles over the customer grain — a grain that
    grows with the dataset, so a bare ``Window.orderBy`` (one task sorts
    everything) is the wrong plan at 100 TB. Uses the distributed
    ordered-scan ntile (operators/scale.py): range repartition → local
    row_numbers → triangular-join prefix offsets → integer-exact ANSI
    piecewise ntile (first ``N mod k`` buckets one row larger),
    bit-identical to the single-node ``ntile`` the oracle runs."""
    from kafka_flink_exactlyonce_example_spark.operators.scale import global_ntile

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return global_ntile(
        c, [F.col("c_acctbal"), F.col("c_custkey")], 4, "quartile"
    )


@query(
    "q_win_percent",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
    """,
)
def q_win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of each supplier's balance within its
    nation — the relative-standing window pair q_win_rank doesn't
    cover. Both are tie-deterministic (equal keys get equal values),
    so the ORDER BY needs no unique tie-break; one shuffle + one sort
    per partition at any scale."""
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_win_corr",
    oracle="""
    WITH s AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
               CAST(COUNT(*) OVER w AS DOUBLE) AS n,
               SUM(l_quantity) OVER w AS sx,
               SUM(l_extendedprice) OVER w AS sy,
               SUM(l_quantity * l_quantity) OVER w AS sxx,
               SUM(l_extendedprice * l_extendedprice) OVER w AS syy,
               SUM(l_quantity * l_extendedprice) OVER w AS sxy
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                     ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
           round(CASE WHEN (sxx - sx*sx/n) * (syy - sy*sy/n) > 0
                      THEN (sxy - sx*sy/n)
                           / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n))
                 END, 6) AS corr30
    FROM s
    """,
)
def q_win_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-row Pearson correlation of quantity vs price per
    supplier — an aggregate over a sliding ROWS frame, the shape
    monitoring/feature pipelines use for drift detection.

    Spelled as explicit co-moment sums (one window pass computes
    n/Σx/Σy/Σx²/Σy²/Σxy over the same frame) instead of the built-in
    ``corr``: Spark 4 under ANSI mode raises DIVIDE_BY_ZERO on a
    zero-variance frame (e.g. two rows with equal quantities) where
    DuckDB's corr yields NULL — the guarded formula gives both engines
    the identical arithmetic chain AND identical null semantics. The
    ROWS frame straddles sort ties, so the ordering appends
    (l_orderkey, l_linenumber, l_partkey) for a total order (lineitem
    has no 2-column unique key on this dataset). One shuffle on
    supplier; all six sums share a single frame scan."""
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(-29, 0)
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = F.sum(x).over(w), F.sum(y).over(w)
    sxx, syy = F.sum(x * x).over(w), F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    base = li.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        n.alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxx.alias("sxx"), syy.alias("syy"), sxy.alias("sxy"),
    )
    den = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) * (
        F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    )
    corr = F.when(
        den > 0,
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.sqrt(den),
    )
    return base.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_partkey",
        F.round(corr, 6).alias("corr30"),
    )
