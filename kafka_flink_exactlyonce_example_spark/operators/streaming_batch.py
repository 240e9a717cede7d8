"""Streaming semantics, batch-verifiable analogs (SURVEY.md §2.9).

The reference's whole point is windowed streaming aggregation with
exactly-once effects (Kafka → Flink keyed tumbling window count →
transactional sink; reconstructed, SURVEY.md §0). Each semantic here is
the batch form over the ``events`` table that a DuckDB oracle can
verify; the true ``readStream`` forms — identical expressions — live in
``streaming/jobs.py`` and are exercised by smoke tests.

Window-start alignment: Spark tumbling/sliding windows align to the
unix epoch; DuckDB ``time_bucket`` aligns to 2000-01-01 — identical for
any interval that divides a day. Window starts are emitted as formatted
strings so both engines hash the same value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_exactlyonce_example_spark.functions.money import cents, cents_sql
from kafka_flink_exactlyonce_example_spark.registry import query
from kafka_flink_exactlyonce_example_spark.sources import table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
_TS_US_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_US_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@query(
    "q_tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core computation shape: keyed tumbling-window
    aggregate. Identical expression works on readStream + watermark."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


@query(
    "q_sliding_window",
    oracle=f"""
    WITH expanded AS (
        SELECT unnest([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                       time_bucket(INTERVAL '30 minutes', ts)]) AS wstart,
               event_type, value
        FROM events
    )
    SELECT strftime(wstart, '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in 2 windows
    (Spark's window() expands rows exactly like the oracle's unnest)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


@query(
    "q_session_window",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_US_DUCK}') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) via native session_window —
    Spark merges rows whose [ts, ts+gap) intervals overlap, equivalent
    to the lag/cumsum derivation the oracle uses."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_US_SPARK).alias("session_start"),
            "n_events",
            "value_cents",
        )
    )


@query(
    "q_late_data",
    oracle=f"""
    WITH cutoff AS (SELECT MAX(ts) - INTERVAL '3 days' AS wm FROM events)
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
               AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, cutoff
    WHERE ts >= wm
    GROUP BY 1, 2
    """,
)
def q_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic batch analog of a watermark: drop rows older than
    max(ts) - 3 days, then window-aggregate. Streaming form:
    withWatermark('ts', ...) in streaming/jobs.py."""
    ev = table(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 3 DAYS")).alias("wm"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .filter(F.col("ts") >= F.col("wm"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@query(
    "q_stream_dedup",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM (SELECT DISTINCT ON (event_id) event_id, event_type, value FROM events)
    GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once effect as an operator: dedup on the unique event id
    (what the reference achieves with Kafka transactions, and Spark
    with dropDuplicates + watermark on a stream)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
    )


@query(
    "q_keyed_state",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM({cents_sql('value')}) OVER w AS BIGINT) AS cum_value_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS cum_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_keyed_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running state (what Flink keyed state holds): cumulative
    per-user totals ordered by event time."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w).alias("cum_value_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("cum_events"),
    )


@query(
    "q_downsample",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '{_TS_FMT_DUCK}')
               AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi,
           ROUND(arg_min(value, event_id), 6) AS open_value,
           ROUND(arg_max(value, event_id), 6) AS close_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style downsampling rollup (continuous-aggregate
    shape): raw events → 6-hour OHLC-ish gauges per type. One partial+
    final hash agg — at 100 TB this is the materialized rollup you'd
    refresh incrementally per window; open/close use min_by/max_by on
    event_id (deterministic, unlike ts which carries ns-vs-µs
    truncation risk across engines)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.min_by("value", "event_id"), 6).alias("open_value"),
            F.round(F.max_by("value", "event_id"), 6).alias("close_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("bucket_start"),
            "event_type",
            "n_events",
            "value_cents",
            "lo",
            "hi",
            "open_value",
            "close_value",
        )
    )


@query(
    "q_cep_pattern",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lead(event_type) OVER w AS next_type,
               lead(ts) OVER w AS next_ts,
               lead(event_id) OVER w AS next_id
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS error_event_id, next_id AS purchase_event_id,
           strftime(ts, '{_TS_FMT_DUCK}') AS error_ts,
           strftime(next_ts, '{_TS_FMT_DUCK}') AS purchase_ts
    FROM seq
    WHERE event_type = 'error' AND next_type = 'purchase'
      AND next_ts <= ts + INTERVAL 30 MINUTE
    """,
)
def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern detection, the batch analog of Flink's
    MATCH_RECOGNIZE / CEP library: per user, an 'error' event whose
    IMMEDIATELY NEXT event is a 'purchase' within 30 minutes (strict
    contiguity, the PATTERN (A B) ... WITHIN form).

    One lead() pass over (user, ts, event_id) — no self-join: strict-
    contiguity CEP is a window derivation, and at 100 TB that is one
    shuffle on the key versus the interval self-join's quadratic
    blowup. Looser "followed by eventually" patterns relax to
    q_funnel's conditional-min shape; true streaming CEP state
    machines go to applyInPandasWithState (custom_sessionize shows the
    timer pattern)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
        F.lead("event_id").over(w).alias("next_id"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "error")
            & (F.col("next_type") == "purchase")
            & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .select(
            "user_id",
            F.col("event_id").alias("error_event_id"),
            F.col("next_id").alias("purchase_event_id"),
            F.date_format("ts", _TS_FMT_SPARK).alias("error_ts"),
            F.date_format("next_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        )
    )


@query(
    "q_cumulate_window",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '{_TS_FMT_DUCK}') AS day_start,
           strftime(date_trunc('day', ts) + k * INTERVAL 6 HOUR,
                    '{_TS_FMT_DUCK}') AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
    FROM events
    JOIN (SELECT unnest(generate_series(1, 4)) AS k)
      ON k * 21600 > CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT)
    GROUP BY 1, 2
    """,
)
def q_cumulate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CUMULATE window (step 6 h, size 1 day), batch analog:
    each event lands in every expanding window [day, day+6h·k) whose
    end is past it — the early-firing daily dashboard (running totals
    at 06/12/18/24h) Flink 1.13 added windows TVFs for.

    Native expansion: ``explode(sequence(slot+1, 4))`` emits exactly
    the windows each event belongs to (≤4 rows), then one grouped agg
    — identical to Spark's own sliding-``F.window`` internals. The
    streaming form is the same expression over readStream with a
    1-day watermark; emitted rows for closed steps are immutable, so
    the idempotent sink dedups on (day_start, window_end, batch)."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    slot = (F.unix_timestamp("ts") - F.unix_timestamp(day)) / F.lit(21600)
    expanded = ev.select(
        day.alias("day"),
        "value",
        F.explode(
            F.sequence(F.floor(slot).cast("int") + 1, F.lit(4))
        ).alias("k"),
    )
    return (
        expanded.groupBy("day", "k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("day", _TS_FMT_SPARK).alias("day_start"),
            F.date_format(
                F.col("day") + F.make_interval(hours=F.col("k") * 6),
                _TS_FMT_SPARK,
            ).alias("window_end"),
            "n_events",
            "value_cents",
        )
    )


@query(
    "q_window_topn",
    oracle=f"""
    WITH counted AS (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
                   AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents
        FROM events
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, value_cents,
           CAST(rn AS INTEGER) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY window_start
                                     ORDER BY n_events DESC, event_type) AS rn
        FROM counted
    )
    WHERE rn <= 3
    """,
)
def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink window Top-N (the Table API's ROW_NUMBER-over-window-TVF
    pattern): the 3 busiest event types per tumbling hour.

    Composes the reference's windowed aggregation with a ranking pass:
    groupBy(window, key) → row_number per window → filter ≤ 3.
    Spark plans the rank with WindowGroupLimit (map-side partial
    top-k), so the per-window state never exceeds N rows — the same
    bound Flink's incremental window Top-N maintains. event_type
    breaks count ties deterministically. The streaming form is this
    expression per closed window (append mode after watermark)."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counted = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents("value")).alias("value_cents"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
    wr = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


@query(
    "q_window_join",
    oracle=f"""
    WITH c AS (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
                   AS window_start,
               user_id,
               CAST(COUNT(*) AS BIGINT) AS n_clicks,
               CAST(SUM({cents_sql('value')}) AS BIGINT) AS click_cents
        FROM events WHERE event_type = 'click'
        GROUP BY 1, 2
    ), p AS (
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_TS_FMT_DUCK}')
                   AS window_start,
               user_id,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM({cents_sql('value')}) AS BIGINT) AS purchase_cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT c.window_start, c.user_id,
           c.n_clicks, c.click_cents, p.n_purchases, p.purchase_cents
    FROM c JOIN p ON c.window_start = p.window_start
                 AND c.user_id = p.user_id
    """,
)
def q_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL *Window Join* parity (the tumbling-window-aligned
    stream⋈stream join — distinct from q_interval_join's per-row time
    bounds): clicks meet purchases of the SAME user in the SAME 1-hour
    tumbling window. Each side is aggregated to the (user, window)
    grain BEFORE the join — the contract-then-join shape that makes
    the streaming form's state bounded (one accumulator row per key
    and window, closed by the watermark) and the batch plan two
    partial+final hash aggs plus one co-partitioned equi-join on
    (window_start, user_id). No broadcast: both sides scale with the
    stream; the join key includes the window so state never crosses
    windows. The streaming twin is two windowed aggregations joined on
    window end — Flink's WindowJoin operator materializes exactly this
    relation per fired window."""
    ev = table(spark, sf_dir, "events")

    def side(etype: str, n_name: str, cents_name: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias(n_name),
                F.sum(cents("value")).alias(cents_name),
            )
            .select(
                F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
                "user_id",
                n_name,
                cents_name,
            )
        )

    clicks = side("click", "n_clicks", "click_cents")
    purchases = side("purchase", "n_purchases", "purchase_cents")
    return clicks.join(purchases, ["window_start", "user_id"])


@query(
    "q_multires_rollup",
    oracle=f"""
    WITH h1 AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS b,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({cents_sql('value')}) AS BIGINT) AS value_cents,
               ROUND(MIN(value), 6) AS lo,
               ROUND(MAX(value), 6) AS hi
        FROM events GROUP BY 1, 2
    ), h6 AS (
        SELECT time_bucket(INTERVAL '6 hours', b) AS b, event_type,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(value_cents) AS BIGINT) AS value_cents,
               MIN(lo) AS lo, MAX(hi) AS hi
        FROM h1 GROUP BY 1, 2
    ), d1 AS (
        SELECT time_bucket(INTERVAL '1 day', b) AS b, event_type,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(value_cents) AS BIGINT) AS value_cents,
               MIN(lo) AS lo, MAX(hi) AS hi
        FROM h6 GROUP BY 1, 2
    ), lv AS (
        SELECT '1h' AS level, * FROM h1
        UNION ALL SELECT '6h', * FROM h6
        UNION ALL SELECT '1d', * FROM d1
    )
    SELECT level, strftime(b, '{_TS_FMT_DUCK}') AS bucket_start,
           event_type, n_events, value_cents, lo, hi,
           ROUND(CAST(value_cents AS DOUBLE) / n_events / 100.0, 6)
               AS avg_value
    FROM lv
    """,
)
def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous-aggregate HIERARCHY (TimescaleDB's
    multi-resolution rollup): the 1-hour base aggregate is computed
    from raw events ONCE, then the 6-hour and 1-day levels are derived
    by re-aggregating the NEXT-FINER level — never the fact table.
    Only mergeable accumulators survive the hierarchy (count/sum →
    sum, min/max → min/max); avg is re-derived as sum/count at every
    level, because averaging averages is wrong the moment bucket
    populations differ — the invariant that makes incremental rollup
    refresh correct at 100 TB (refresh cost ∝ changed 1h buckets, not
    raw rows; each coarser level reads ≤ 1/6 the rows of the finer).
    One shuffle against the facts + two re-aggs of contracted grains,
    union'd with a level tag. The 1 h base is MATERIALIZED
    (localCheckpoint) before the union — without the barrier Spark
    re-computed the base under every union branch (3 fact scans,
    verified: the branch aggregates canonicalize differently, so even
    AQE's ReuseExchange can't dedupe them), which at 100 TB triples
    the scan bill; the checkpoint is the hour×type grain, bounded by
    the time range, i.e. exactly the materialized continuous
    aggregate a hypertable stores anyway."""
    ev = table(spark, sf_dir, "events")
    h1 = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("value_cents"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    ).select(F.col("w.start").alias("b"), "event_type", "n_events",
             "value_cents", "lo", "hi").localCheckpoint()

    def coarsen(finer: DataFrame, seconds: int) -> DataFrame:
        bucket = F.timestamp_seconds(
            (F.unix_timestamp("b") / seconds).cast("long") * seconds
        )
        return finer.groupBy(bucket.alias("b"), "event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )

    h6 = coarsen(h1, 6 * 3600)
    d1 = coarsen(h6, 24 * 3600)
    lv = (
        h1.select(F.lit("1h").alias("level"), "*")
        .unionByName(h6.select(F.lit("6h").alias("level"), "*"))
        .unionByName(d1.select(F.lit("1d").alias("level"), "*"))
    )
    return lv.select(
        "level",
        F.date_format("b", _TS_FMT_SPARK).alias("bucket_start"),
        "event_type",
        "n_events",
        "value_cents",
        "lo",
        "hi",
        F.round(
            F.col("value_cents").cast("double") / F.col("n_events") / 100.0, 6
        ).alias("avg_value"),
    )


@query(
    "q_watermark_plan",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch(ts) AS sec,
               MAX(epoch(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS runmax
        FROM events
    ), late AS (
        SELECT event_type,
               CAST(FLOOR(runmax - sec) AS BIGINT) AS late_bin,
               (runmax - sec) > 0 AS is_late
        FROM seq
    ), hist AS (
        SELECT event_type, late_bin,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt_late
        FROM late GROUP BY event_type, late_bin
    ), cdf AS (
        SELECT event_type, late_bin, cnt, cnt_late,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY late_bin)
                   AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(SUM(cnt_late) AS BIGINT) AS n_late,
           ROUND(SUM(cnt_late) * 1.0 / MAX(n), 6) AS late_frac,
           CAST(MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN late_bin END)
                AS BIGINT) AS p50_lateness_s,
           CAST(MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN late_bin END)
                AS BIGINT) AS p95_lateness_s,
           CAST(MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN late_bin END)
                AS BIGINT) AS p99_lateness_s,
           CAST(MAX(late_bin) AS BIGINT) AS max_lateness_s
    FROM cdf GROUP BY event_type
    """,
)
def q_watermark_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay planning report — the measurement that sizes
    `withWatermark` before deploying any windowed streaming job: replay
    the stream in ARRIVAL order (event_id — the ingestion sequence) and
    measure each event's lateness against the per-user running maximum
    event time. The p95/p99 columns are the candidate watermark delays
    in whole seconds (delay < p99 drops ~1% of events into the
    late-data path; q_late_data shows what happens to them), max is
    the zero-loss bound, and the per-type split shows which stream
    needs the looser bound.

    Scale shape (hardened in round 5 after self-audit): one keyed
    window (running max per user — state bounded per key, the same
    shape the streaming runtime maintains), then percentiles from a
    SECONDS-GRAIN HISTOGRAM CDF — floor the lateness to integer
    seconds, count per (type, bin), take the smallest bin whose
    cumulative count reaches ⌈p·n⌉. The first formulation used
    Spark's exact `percentile` aggregate, which buffers EVERY value
    per group (OOM at billions of rows per type); the histogram
    form's state is bounded by the lateness RANGE in seconds, its
    windows order bins (not rows), and pure integer compare logic
    makes both engines' answer identical with no
    interpolation-semantics risk — a 1-second answer grid is exactly
    the precision a watermark delay needs."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.col("ts").cast("double")
    late = ev.select(
        "event_type",
        F.floor(F.max(sec).over(w) - sec).cast("long").alias("late_bin"),
        ((F.max(sec).over(w) - sec) > 0).alias("is_late"),
    )
    hist = late.groupBy("event_type", "late_bin").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("cnt_late"),
    )
    wb = Window.partitionBy("event_type").orderBy("late_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("event_type")
    cdf = hist.select(
        "event_type",
        "late_bin",
        "cnt",
        "cnt_late",
        F.sum("cnt").over(wb).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    )

    def pick(p: float):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("late_bin")
            )
        ).cast("long")

    return cdf.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum("cnt_late").cast("long").alias("n_late"),
        F.round(F.sum("cnt_late") / F.max("n"), 6).alias("late_frac"),
        pick(0.50).alias("p50_lateness_s"),
        pick(0.95).alias("p95_lateness_s"),
        pick(0.99).alias("p99_lateness_s"),
        F.max("late_bin").cast("long").alias("max_lateness_s"),
    )
