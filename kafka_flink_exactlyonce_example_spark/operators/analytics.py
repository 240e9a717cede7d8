"""Wider analytics surface: pivot, arg-extrema, ordered string_agg,
exact percentiles, histograms, funnel/retention (event analytics), null
handling, regex cleanup, sampling. Everything but the seeded samples is
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS BIGINT) AS "A",
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS BIGINT) AS "N",
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS BIGINT) AS "R"
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation). Values enumerated explicitly — at scale
    an unenumerated pivot needs a collect of distinct values first;
    declaring them keeps the plan single-pass."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity").cast("long"))
    )


@query(
    "q_minmax_by",
    oracle=f"""
    SELECT l_returnflag,
           arg_max(l_orderkey,
                   lpad(CAST({cents_sql('l_extendedprice')} AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || CAST(l_linenumber AS VARCHAR)) AS max_price_orderkey,
           arg_min(l_orderkey,
                   lpad(CAST({cents_sql('l_extendedprice')} AS VARCHAR), 12, '0')
                   || lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                   || CAST(l_linenumber AS VARCHAR)) AS min_price_orderkey
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin). The ordering key is made unique
    (price-cents ++ orderkey ++ linenumber, zero-padded so lexicographic
    = numeric) because arg-extrema with ties are nondeterministic."""
    li = table(spark, sf_dir, "lineitem")
    from kafka_flink_exactlyonce_example_spark.functions.money import cents

    key = F.concat(
        F.lpad(cents("l_extendedprice").cast("string"), 12, "0"),
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.col("l_linenumber").cast("string"),
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", key).alias("max_price_orderkey"),
        F.min_by("l_orderkey", key).alias("min_price_orderkey"),
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): deterministic via explicit
    sort of the collected set before concatenation."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "q_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles [bounded-grain-percentile: the
    cross-engine interpolation-parity exactness DEMO the §6 policy
    keeps; scale path = histogram-CDF / approx_percentile] — Spark
    ``percentile`` and DuckDB
    ``quantile_cont`` share the type-7 linear interpolation (verified
    identical on this data); rounded to 6 for safety."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25_qty"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing (floor is exact —
    no cross-engine drift)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per_user
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel (view → click → purchase ordered by first
    occurrence): one conditional-min aggregation per user, one global
    rollup — two shuffles total at any scale."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    clicked = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_clicked_after_view"),
        F.sum(
            F.when(clicked & (F.col("t_purchase") > F.col("t_click")), 1).otherwise(0)
        ).alias("n_full_funnel"),
    )


@query(
    "q_retention",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CASE WHEN ts < TIMESTAMP '2024-01-08'
                    THEN user_id END) AS BIGINT) AS w1_users,
           CAST(COUNT(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-08'
                         AND ts < TIMESTAMP '2024-01-15'
                    THEN user_id END) AS BIGINT) AS w2_users,
           CAST(COUNT(DISTINCT CASE WHEN user_id IN (
                        SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08')
                         AND ts >= TIMESTAMP '2024-01-08'
                         AND ts < TIMESTAMP '2024-01-15'
                    THEN user_id END) AS BIGINT) AS retained
    FROM events
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: distinct actives per window + the
    intersection (semi-join of week-2 activity against week-1 users)."""
    ev = table(spark, sf_dir, "events")
    w1_end = F.lit("2024-01-08").cast("timestamp")
    w2_end = F.lit("2024-01-15").cast("timestamp")
    in_w1 = F.col("ts") < w1_end
    in_w2 = (F.col("ts") >= w1_end) & (F.col("ts") < w2_end)
    w1_users = ev.filter(in_w1).select("user_id").distinct()
    w2_active = ev.filter(in_w2)
    retained = (
        w2_active.join(w1_users, "user_id", "left_semi")
        .agg(F.countDistinct("user_id").alias("retained"))
    )
    counts = ev.agg(
        F.countDistinct(F.when(in_w1, F.col("user_id"))).alias("w1_users"),
        F.countDistinct(F.when(in_w2, F.col("user_id"))).alias("w2_users"),
    )
    return counts.crossJoin(F.broadcast(retained))


@query(
    "q_null_handling",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 400000) AS n_big
        FROM customer
    )
    SELECT c_custkey,
           COALESCE(NULLIF(n_big, 0), -1) AS n_big_or_flag,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           IFNULL(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
               AS bal_nonneg
    FROM per_cust
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics surface: COALESCE / NULLIF / IFNULL over an outer
    aggregation that genuinely produces missing groups."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    n_big = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return (
        c.join(n_big, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.nullif(F.col("n_big"), F.lit(0)), F.lit(-1)).alias(
                "n_big_or_flag"
            ),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            F.ifnull(
                F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")),
                F.lit(0.0),
            ).alias("bal_nonneg"),
        )
    )


@query(
    "q_regex_clean",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '[aeiou]', '', 'g'),
                               ' +', ' ', 'g')) AS devoweled,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT)
               AS n_vowels
    FROM documents
    """,
)
def q_regex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex text normalization (the cleanup stage of a data pipeline).
    DuckDB needs the 'g' flag to match Spark's replace-all semantics."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.regexp_replace("text", "[aeiou]", ""), " +", " ")
        ).alias("devoweled"),
        F.length(F.regexp_replace("text", "[^aeiou]", "")).cast("long").alias(
            "n_vowels"
        ),
    )


@query("q_sample")  # rows-only: engine-specific sampling RNG
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + stratified sampleBy — the data-diet
    stage of a training pipeline (deterministic per engine, but RNG
    streams are engine-specific so no SQL oracle)."""
    ev = table(spark, sf_dir, "events")
    uniform = ev.sample(fraction=0.1, seed=42)
    strat = ev.sampleBy(
        "event_type",
        {"view": 0.05, "click": 0.2, "purchase": 1.0, "signup": 1.0, "error": 0.5},
        seed=42,
    )
    u = uniform.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_uniform"))
    s = strat.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_stratified"))
    return u.join(s, "event_type", "full")


@query("q_approx_quantile")  # rows-only: t-digest/GK sketches differ across engines
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch): the single-pass mergeable-sketch
    path for quantiles at 100 TB — no per-group sort, partials merge
    associatively across executors (the same reason q_approx_distinct
    uses HLL). Exact twin with full oracle: q_percentile."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile_approx("l_extendedprice", 0.5, 10000), 2).alias("p50_approx"),
        F.round(F.percentile_approx("l_extendedprice", 0.9, 10000), 2).alias("p90_approx"),
    )


@query(
    "q_markov",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ), cnt AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6) AS prob
    FROM cnt
    """,
)
def q_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next event type | current type). The sequence-mining
    primitive behind next-action prediction and anomalous-flow
    detection. lead() over (user, ts, event_id) — event_id breaks ts
    ties for a deterministic successor — then one count aggregation
    and a window normalization over the 25-cell matrix. One shuffle on
    user_id, one on (src, dst); the matrix itself is O(|types|²)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    cnt = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return cnt.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(wsrc), 6).alias("prob"),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH g AS (
        SELECT user_id % 2 AS cohort,
               CAST(COUNT(*) AS DOUBLE) AS n,
               avg(value) AS m,
               var_samp(value) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id % 2
    ), ab AS (
        SELECT
          max(CASE WHEN cohort = 0 THEN n END) AS n0,
          max(CASE WHEN cohort = 1 THEN n END) AS n1,
          max(CASE WHEN cohort = 0 THEN m END) AS m0,
          max(CASE WHEN cohort = 1 THEN m END) AS m1,
          max(CASE WHEN cohort = 0 THEN v END) AS v0,
          max(CASE WHEN cohort = 1 THEN v END) AS v1
        FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
           round(m1 - m0, 6) AS lift,
           round((m1 - m0) / sqrt(v0/n0 + v1/n1), 6) AS welch_t,
           round(pow(v0/n0 + v1/n1, 2)
                 / (pow(v0/n0, 2)/(n0-1) + pow(v1/n1, 2)/(n1-1)), 3) AS welch_dof
    FROM ab
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t statistic for purchase value between user
    cohorts (deterministic split: user_id % 2) — the A/B-readout
    aggregate every experimentation pipeline ends in.

    One conditional aggregation per cohort (map-side partial), then a
    single-row combine computing lift, t, and Welch–Satterthwaite
    degrees of freedom from the six sufficient statistics — the
    100 TB shape: sufficient stats shrink to O(1) per cohort before
    any driver-visible math. Identical formula both engines, rounded.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    g = ev.groupBy((F.col("user_id") % 2).alias("cohort")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    ab = g.agg(
        *[
            F.max(F.when(F.col("cohort") == c, F.col(x))).alias(f"{x}{c}")
            for c in (0, 1)
            for x in ("n", "m", "v")
        ]
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return ab.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treat"),
        F.round(F.col("m1") - F.col("m0"), 6).alias("lift"),
        F.round((F.col("m1") - F.col("m0")) / F.sqrt(se2), 6).alias("welch_t"),
        F.round(dof, 3).alias("welch_dof"),
    )


@query(
    "q_pareto",
    oracle="""
    WITH rev AS (
        SELECT o_custkey, SUM(o_totalprice) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT r,
               row_number() OVER (ORDER BY r DESC, o_custkey) AS rk,
               CAST(COUNT(*) OVER () AS DOUBLE) AS n,
               SUM(r) OVER () AS total,
               SUM(r) OVER (ORDER BY r DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM rev
    )
    SELECT
      round(max(CASE WHEN rk <= ceil(n * 0.01) THEN cum END) /
            max(total), 6) AS top1pct_share,
      round(max(CASE WHEN rk <= ceil(n * 0.10) THEN cum END) /
            max(total), 6) AS top10pct_share,
      round(1.0 - 2.0 * sum((cum - r / 2) / total) / max(n), 6) AS gini
    FROM ranked
    """,
)
def q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: share of total order revenue held by the
    top 1% / 10% of customers, plus the Gini coefficient — the
    heavy-tail diagnostic that decides whether a dataset (or a key
    distribution about to be shuffled) needs skew handling.

    One aggregation to per-customer revenue, one descending cumulative
    scan, one single-row combine. Gini via the Lorenz trapezoid
    identity G = 1 − 2·Σ(cum_i − r_i/2)/(total·n), computed identically
    in both engines. Ordering ties broken by custkey → deterministic
    cum at every rank. The customer grain grows with the dataset, so
    rank and cumulative revenue come from the DISTRIBUTED ordered scan
    (operators/scale.py: range partition + local windows + broadcast
    prefix offsets) and n/total from a broadcast one-row aggregate —
    no single-partition window; the oracle keeps the plain window
    form."""
    from kafka_flink_exactlyonce_example_spark.operators.scale import ordered_scan

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    ranked = ordered_scan(
        rev,
        [F.col("r").desc(), F.col("o_custkey")],
        sums={"cum": F.col("r")},
        rn="rk",
        totals_of={
            "n": F.count(F.lit(1)).cast("double"),
            "total": F.sum("r"),
        },
    )
    top = lambda frac: F.max(
        F.when(F.col("rk") <= F.ceil(F.col("n") * frac), F.col("cum"))
    ) / F.max("total")
    return ranked.agg(
        F.round(top(0.01), 6).alias("top1pct_share"),
        F.round(top(0.10), 6).alias("top10pct_share"),
        F.round(
            1.0
            - 2.0
            * F.sum((F.col("cum") - F.col("r") / 2) / F.col("total"))
            / F.max("n"),
            6,
        ).alias("gini"),
    )


@query(
    "q_median_mad",
    oracle="""
    WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(max(m.med), 6) AS median_value,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)), 6)
             AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def q_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread per event type: exact interpolated median
    and MAD (median absolute deviation) — the outlier-resistant
    counterpart to q_anomaly's mean/σ z-scores.

    Exact medians need a full sort of each group's values, so the plan
    is two grouped percentile passes with the 5-row median table
    broadcast back between them — at 100 TB you'd swap in
    approx_percentile (q_approx_quantile's sketch) and keep the same
    two-pass shape. Spark `percentile` and DuckDB `percentile_cont`
    both interpolate identically (verified; DuckDB's `median` does NOT
    interpolate for all types — avoided).
    [bounded-grain-percentile: exactness demo, §6 policy]"""
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(
                F.expr("percentile(abs(value - med), 0.5D)"), 6
            ).alias("mad"),
        )
    )


@query(
    "q_yoy",
    oracle="""
    WITH monthly AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS rev_cents
        FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo, rev_cents,
           lag(rev_cents, 12) OVER (ORDER BY yr * 12 + mo) AS rev_cents_prev_yr,
           round(CASE WHEN lag(rev_cents, 12) OVER (ORDER BY yr * 12 + mo) > 0
                 THEN 100.0 * (rev_cents - lag(rev_cents, 12) OVER (ORDER BY yr * 12 + mo))
                      / lag(rev_cents, 12) OVER (ORDER BY yr * 12 + mo)
                 END, 6) AS yoy_pct
    FROM monthly
    """,
)
def q_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: monthly revenue vs the same month last
    year (lag 12 over the month sequence) — the standard BI reporting
    derivation, distinct from q_win_lag_lead's event-level lag.

    Monthly grain is unique, so the ORDER BY needs no tie-break. The
    pre-aggregation shrinks the fact table to |months| rows before the
    (single-partition) window — the correct shape at any scale: never
    window the fact table for a calendar-grain metric."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")).alias(
            "rev_cents"
        )
    )
    w = Window.orderBy(F.col("yr") * 12 + F.col("mo"))
    prev = F.lag("rev_cents", 12).over(w)
    return monthly.select(
        "yr", "mo", "rev_cents",
        prev.alias("rev_cents_prev_yr"),
        F.round(
            F.when(prev > 0, 100.0 * (F.col("rev_cents") - prev) / prev), 6
        ).alias("yoy_pct"),
    )


@query(
    "q_running_distinct",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id, event_type
    ), per_day AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_pairs
        FROM firsts GROUP BY first_day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, new_pairs,
           CAST(SUM(new_pairs) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_distinct_pairs
    FROM per_day
    """,
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct (user, event_type) pairs per day — the
    metric that LOOKS like
    `COUNT(DISTINCT) OVER (ORDER BY day)` but Spark (correctly) refuses
    distinct aggregates in windows. The scalable derivation: each
    pair's FIRST day (one groupBy), new-pair counts per day, then a
    cumulative sum over the tiny day-grain series. Same rewrite both
    engines. At 100 TB this is one shuffle on user_id + a |days|-row
    window — vs the naive windowed-distinct which would hold every
    (user, type) pair in per-window state."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_pairs")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_pairs",
        F.sum("new_pairs").over(w).alias("cum_distinct_pairs"),
    )


@query(
    "q_bitmap_days",
    oracle="""
    WITH masks AS (
        SELECT user_id,
               CAST(bit_or(1 << (day(ts) - 1)) AS BIGINT) AS day_mask
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, day_mask,
           CAST(bit_count(day_mask) AS INTEGER) AS active_days,
           CAST(list_max(list_transform(
                regexp_extract_all(bin(day_mask), '1+'),
                s -> length(s))) AS INTEGER) AS longest_streak
    FROM masks
    """,
)
def q_bitmap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement bitmap: each user's January activity as ONE int64
    (bit d-1 = active on day d), then active-day count and longest
    consecutive-day streak — the bitmap-index idiom that turns DAU/
    retention/streak questions into integer ops.

    One groupBy folds all events into 8 bytes per user (`bit_or` of
    shifted bits — associative, so map-side partial aggregation does
    most of the work); streak length falls out of a regexp over the
    binary string, identical in both engines. At 100 TB the mask is
    the materialization you'd keep per (user, month) — three orders
    of magnitude smaller than the event rows it summarizes, and
    mergeable across months by OR."""
    ev = table(spark, sf_dir, "events")
    masks = ev.groupBy("user_id").agg(
        F.expr("CAST(bit_or(shiftleft(1, day(ts) - 1)) AS BIGINT)").alias(
            "day_mask"
        )
    )
    return masks.select(
        "user_id",
        "day_mask",
        F.expr("CAST(bit_count(day_mask) AS INT)").alias("active_days"),
        F.expr(
            "CAST(array_max(transform(regexp_extract_all(bin(day_mask), '1+', 0),"
            " s -> length(s))) AS INT)"
        ).alias("longest_streak"),
    )


_HQ_BIN = 10.0  # fixed histogram bin width for the quantile sketch


@query(
    "q_hist_quantile",
    oracle=f"""
    WITH b AS (
        SELECT event_type, CAST(FLOOR(value / {_HQ_BIN}) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), c AS (
        SELECT event_type, bin, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               sum(n) OVER (PARTITION BY event_type) AS tot
        FROM b
    )
    SELECT event_type,
           CAST(max(tot) AS BIGINT) AS n_events,
           round(min(CASE WHEN cum >= 0.50 * tot THEN bin END) * {_HQ_BIN}, 6)
             AS p50_est,
           round(min(CASE WHEN cum >= 0.95 * tot THEN bin END) * {_HQ_BIN}, 6)
             AS p95_est,
           round(min(CASE WHEN cum >= 0.99 * tot THEN bin END) * {_HQ_BIN}, 6)
             AS p99_est
    FROM c GROUP BY event_type
    """,
)
def q_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles — the SCALE path q_percentile's exact
    sort can't take at 100 TB: fixed-width bin counts are a MERGEABLE
    sketch (bin counts add across partitions, machines, days), so the
    whole estimate is one map-side-combinable aggregation plus window
    arithmetic on the bounded bin grain; error is bounded by the bin
    width (estimates quantize to lower bin edges, here width 10 on a
    0..490 value domain).

    The per-type cumulative runs over ≤50 bins — a bounded partitioned
    window, not a data-scaled sort. The quantile rule (smallest bin
    whose cumulative count reaches q·total) uses integer cum/tot and
    one IEEE multiply, identical in both engines — an approximate
    STATISTIC with an exact cross-engine oracle, same trick as the LSH
    family."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / _HQ_BIN).cast("long").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    c = b.select(
        "event_type",
        "bin",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("tot"),
    )

    def est(q: float):
        return F.round(
            F.min(F.when(F.col("cum") >= q * F.col("tot"), F.col("bin")))
            * _HQ_BIN,
            6,
        )

    return c.groupBy("event_type").agg(
        F.max("tot").alias("n_events"),
        est(0.50).alias("p50_est"),
        est(0.95).alias("p95_est"),
        est(0.99).alias("p99_est"),
    )
