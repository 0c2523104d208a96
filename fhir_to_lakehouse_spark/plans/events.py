"""Event-stream analytics (batch-checkable analogs of streaming ops).

The reference has zero event-time operators (SURVEY §2.8: no watermark,
no tumbling/sliding/session windows); these queries add that family over
the ``events`` table in batch form. The streaming variants in
fhir_to_lakehouse_spark/streaming/windows.py reuse the same logical
plans via readStream, so correctness here transfers (the engine core is
stream/batch agnostic like the reference's BundleProcessor, SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts)       AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)               AS n,
           ROUND(SUM(value), 2)                   AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (batch analog of
    ``groupBy(F.window('ts','1 hour'))`` in streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH slides AS (
      SELECT ts, value,
             time_bucket(INTERVAL 30 MINUTE, ts) AS aligned
      FROM events
    ), expanded AS (
      SELECT aligned                              AS window_start, value FROM slides
      UNION ALL
      SELECT aligned - INTERVAL 30 MINUTE         AS window_start, value FROM slides
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2)     AS total_value
    FROM expanded
    GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1 hour wide, sliding every 30 min. Each event
    lands in 2 overlapping windows (Spark expands rows the same way)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


# Shared 30-min-gap sessionization core (used by events_sessionize AND
# events_interval_join_bucketized — one definition so the gap rule and
# the (ts, event_id) tie-break can never desynchronize between them).
# The SQL CTE yields `session_events(user_id, event_id, ts, value,
# session_id)`; the Spark helper returns the same event-level frame.
_SESSION_EVENTS_CTE = """gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), session_events AS (
      SELECT user_id, event_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )"""


def _sessionized_events(ev: DataFrame) -> DataFrame:
    """events + a per-user ``session_id`` column (30-min inactivity
    gap, lag + cumulative sum over one user_id shuffle). The interval
    comparison works on TIMESTAMP and TIMESTAMP_NTZ alike (no
    cast-to-long, which TIMESTAMP_NTZ rejects) and matches the CTE's
    `ts - LAG(ts) > INTERVAL 30 MINUTE` verbatim."""
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_ts = F.lag("ts").over(w_order)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(w_cum).cast("long")
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH {_SESSION_EVENTS_CTE}
    SELECT user_id,
           CAST(session_id AS BIGINT)  AS session_id,
           CAST(COUNT(*) AS BIGINT)    AS n_events,
           MIN(ts)                     AS session_start,
           MAX(ts)                     AS session_end
    FROM session_events
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap via lag + cumulative sum.

    Batch analog of ``F.session_window(ts, '30 minutes')``; the lag/
    cumsum formulation is used so the oracle can express identical
    session boundaries. One shuffle on user_id serves both windows.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        _sessionized_events(ev)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "events_user_funnel",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS views,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS clicks,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchases,
           ROUND(SUM(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase_value
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) FILTER (WHERE event_type = 'view') > 0
    """,
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel with conditional aggregates + HAVING."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
            ).alias("purchase_value"),
        )
        .filter(F.col("views") > 0)
    )


@query(
    "events_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month,
           CAST(date_trunc('day', ts) AS TIMESTAMP)   AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP)  AS hour,
           COUNT(*)                AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP(CAST(date_trunc('month', ts) AS TIMESTAMP),
                    CAST(date_trunc('day', ts) AS TIMESTAMP),
                    CAST(date_trunc('hour', ts) AS TIMESTAMP))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution time rollup: hour, day, month
    and grand-total aggregates of the event stream in ONE pass via
    ROLLUP over the truncated-timestamp hierarchy (hour nests in day
    nests in month, so the rollup lattice is exactly the continuous-
    aggregate cascade a TimescaleDB user materializes).

    Values aggregate as DECIMAL(18,2) (the data is 2-dp), so every
    subtotal is accumulation-order exact. Spark plans ROLLUP as a
    single Expand + hash aggregate: partial aggregation still combines
    map-side per grouping set, and at 100 TB the 4x Expand fan-out
    trades one extra map-side pass for never rescanning the source —
    the same trade the reference's per-resolution jobs would pay 4
    scans for."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    return t.rollup("month", "day", "hour").agg(
        F.count("*").alias("n_events"),
        # decimal accumulation keeps every subtotal order-exact; the
        # boundary converts to DOUBLE (registry convention)
        F.sum("v").cast("double").alias("sum_value"),
    )


@query(
    "events_gap_fill",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS sv
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    ),
    j AS (
        SELECT s.hour,
               CAST(date_trunc('day', s.hour) AS TIMESTAMP) AS day,
               hourly.n, hourly.sv
        FROM spine s LEFT JOIN hourly ON s.hour = hourly.h
    )
    SELECT hour, day,
           COALESCE(n, 0) AS n_events,
           CAST(last_value(sv IGNORE NULLS) OVER (
               PARTITION BY day ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_value_ff
    FROM j
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly spine over the observed
    range, hours with no events filled with count 0, and the hourly
    value sum forward-filled (last observation carried forward) within
    each day.

    Scale shape: the spine is O(time-range), not O(events) — generated
    by exploding one sequence() row off the 1-row min/max aggregate
    (a year is 8 760 rows; never a concern) and joined against the
    already-aggregated hourly relation (also O(time-range), both sides
    tiny after the single map-side-combinable aggregate over events).
    The forward-fill window partitions by DAY, so per-partition state
    is 24 rows and the fill parallelizes across days — the global
    ORDER BY variant (one partition holding the whole spine) is the
    classic mistake; carrying values across midnight needs the same
    two-pass prefix trick as corpus_pack_token_shards and is
    deliberately not done here."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("h")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    j = spine.join(hourly, spine.hour == hourly.h, "left")
    w = (
        Window.partitionBy(F.date_trunc("day", "hour"))
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "hour",
        F.date_trunc("day", "hour").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("sv", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("sum_value_ff"),
    )


@query(
    "events_top_paths",
    oracle="""
    WITH p AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
    )
    SELECT path, COUNT(*) AS n
    FROM p GROUP BY path
    ORDER BY n DESC, path LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis (sequence mining lite): the 20 most common ordered
    event-type journeys, one journey per (user, day).

    Spark has no ordered string_agg; the deterministic equivalent is
    collect_list of (ts, event_id, event_type) structs -> sort_array
    (lexicographic struct order == the oracle's ORDER BY ts, event_id)
    -> transform + array_join, all inside one hash aggregate. Shape:
    one shuffle keyed (user_id, day) whose per-group state is that
    day's events for one user (bounded by user activity, not corpus
    size), then a path-keyed count whose map-side combine collapses
    popular journeys before the second, tiny shuffle; top-k runs as
    TakeOrdered with the path itself as tie-break."""
    ev = load_table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    per_user_day = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(path.alias("path"))
    return (
        per_user_day.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(e.value, 6)                 AS value,
           ROUND(m.med, 6)                   AS med,
           ROUND(d.mad, 6)                   AS mad,
           ROUND(abs(e.value - m.med), 6)    AS abs_dev
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(e.value - m.med) > 3 * d.mad
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on event values: per event type,
    median and MAD (median absolute deviation), then flag events
    deviating more than 3 MADs from the median. Unlike mean/stddev
    z-scores (quality_outlier_zscore), median/MAD do not move when the
    outliers themselves get bigger — the estimator the anomalies are
    judged against is not contaminated by them.

    Shape: two grouped exact percentiles on the tiny event_type key
    set, broadcast back over one more corpus scan each; comparisons
    are exact doubles so the >3*MAD boundary cannot flip between
    engines. At 100 TB swap the exact percentile for
    approx_percentile per SCALING.md — same plan shape, bounded
    memory."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    dev = F.abs(F.col("value") - F.col("med"))
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter(dev > 3 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round(dev, 6).alias("abs_dev"),
        )
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH m AS (
      SELECT event_type, AVG(value) AS mean_v FROM events GROUP BY event_type
    ), c AS (
      SELECT e.event_type, e.event_id, e.ts,
             ROUND(SUM(e.value - m.mean_v) OVER (
               PARTITION BY e.event_type ORDER BY e.ts, e.event_id
             ), 6) AS cusum
      FROM events e JOIN m USING (event_type)
    )
    SELECT event_type, event_id AS changepoint_event_id,
           ts AS changepoint_ts,
           cusum AS peak_cusum,
           abs(cusum) AS peak_abs_cusum
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY abs(cusum) DESC, ts ASC, event_id ASC) AS rn
      FROM c
    ) WHERE rn = 1
    """,
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the running sum of
    deviations from the series mean peaks (in absolute value) exactly
    where the level shifts — the classic single-changepoint locator.
    Returns, per type, the event where |CUSUM| is maximal with
    deterministic tie-breaks.

    Shape: one grouped mean (broadcast back), one window cumulative
    sum ordered by event time within each type, one argmax via
    row_number over the same partitioning — the second window reuses
    the first's hash partitioning (one Exchange total). Per-type
    ordering concentrates a type's events into one task lineage; at
    100 TB, segment the CUSUM per day via the distributed prefix-sum
    pattern of corpus_pack_token_shards (per-day partial sums, tiny
    prefix-sum of day totals, offset + local cumsum) — same answer,
    no single-task series."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(F.avg("value").alias("mean_v"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # round the cumulative sum BEFORE the argmax ranking: the peak is
    # picked on the rounded value in both engines, so cross-engine
    # floating-point accumulation-order noise cannot flip the winner
    # on a near-tie peak (same rounded-rank discipline as
    # quality_ccnet_buckets)
    c = (
        ev.join(F.broadcast(m), "event_type")
        .withColumn(
            "cusum", F.round(F.sum(F.col("value") - F.col("mean_v")).over(w), 6)
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("changepoint_event_id"),
            F.col("ts").alias("changepoint_ts"),
            F.col("cusum").alias("peak_cusum"),
            F.abs("cusum").alias("peak_abs_cusum"),
        )
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ), s2 AS (
      SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND (e.ts, e.event_id) > (s1.ts, s1.event_id)
      ) WHERE rn = 1
    ), s3 AS (
      SELECT user_id FROM (
        SELECT e.user_id,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND (e.ts, e.event_id) > (s2.ts, s2.event_id)
      ) WHERE rn = 1
    ), n AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS stage, 'view' AS step, n1 AS users,
           1.0 AS conv_from_prev FROM n
    UNION ALL
    SELECT 2, 'click', n2, ROUND(n2 / n1, 6) FROM n
    UNION ALL
    SELECT 3, 'purchase', n3, ROUND(n3 / n2, 6) FROM n
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): a user
    reaches stage k only via an event strictly AFTER their chosen
    stage-(k-1) event ((ts, event_id) lexicographic, so simultaneous
    timestamps break deterministically). Output: users per stage +
    conversion rate from the previous stage.

    Shape: each stage is one filtered min-struct aggregate keyed on
    user_id joined against the previous stage's frontier — the join
    key is user_id throughout, so all three stages reuse one hash
    partitioning (no re-shuffle of the events relation beyond its
    per-stage filtered scan; at 100 TB, pre-bucketing events by
    user_id makes every stage co-located). The struct min is an
    argmin aggregate, not a window sort — map-side combinable, hot
    users collapse before the exchange. Stage counts are 1-row
    aggregates crossJoin-broadcast into the 3-row stacked result
    (whitelisted tiny BNLJ, same class as bm25's corpus stats)."""
    from fhir_to_lakehouse_spark.functions.cache import (
        scoped_local_checkpoint,
        scoped_persist,
    )

    ev = load_table(spark, sf_dir, "events")
    pair = F.struct(F.col("ts"), F.col("event_id"))
    # each stage frontier is read twice (its count + the next stage's
    # join); without materialization the final plan embeds stage 1's
    # subtree 3x and the events scan 6x, counting on ReusedExchange to
    # fire — the exact implicit reliance functions/cache.py warns
    # against. The n2/n3 broadcast builds are INDEPENDENT, so Spark
    # materializes them concurrently: a lazy persist on s1/s2 is the
    # r10 cache stampede (three concurrent consumers re-derive the
    # events aggregate). s1/s2 are eagerly checkpointed
    # (user-cardinality rows — dimension-sized); s3 has a single
    # consumer (the n3 build) and stays a plain scoped persist.
    # Lifecycle: functions/cache.py checkpoint contract.
    s1 = scoped_local_checkpoint(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(pair).alias("p1")),
        eager=True,
    )
    s2 = scoped_local_checkpoint(
        ev.filter(F.col("event_type") == "click")
        .select("user_id", pair.alias("p"))
        .join(s1, "user_id")
        .filter(F.col("p") > F.col("p1"))
        .groupBy("user_id")
        .agg(F.min("p").alias("p2")),
        eager=True,
    )
    s3 = scoped_persist(
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", pair.alias("p"))
        .join(s2, "user_id")
        .filter(F.col("p") > F.col("p2"))
        .groupBy("user_id")
        .agg(F.min("p").alias("p3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).alias("n3"))
    row = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
    return row.selectExpr(
        "stack(3,"
        " 1, 'view',     n1, CAST(1.0 AS DOUBLE),"
        " 2, 'click',    n2, ROUND(n2 / n1, 6),"
        " 3, 'purchase', n3, ROUND(n3 / n2, 6)"
        ") AS (stage, step, users, conv_from_prev)"
    )


@query(
    "events_interval_join_bucketized",
    oracle=f"""
    WITH {_SESSION_EVENTS_CTE}, sessions AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             MIN(ts) AS s, MAX(ts) AS e
      FROM session_events GROUP BY user_id, session_id
    ), err AS (SELECT ts FROM events WHERE event_type = 'error')
    SELECT sessions.user_id, sessions.session_id,
           CAST(COUNT(*) AS BIGINT) AS n_errors
    FROM sessions JOIN err ON err.ts BETWEEN sessions.s AND sessions.e
    GROUP BY sessions.user_id, sessions.session_id
    """,
)
def events_interval_join_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT a nested loop: per user session
    (30-min-gap sessionization), count the corpus-wide error events
    whose timestamp falls inside the session's [start, end] — the
    'what else was happening during this span' join every observability
    pipeline runs.

    The naive plan is a theta join (ts BETWEEN s AND e) — a
    BroadcastNestedLoopJoin or cartesian, O(sessions x errors). The
    scalable shape used here buckets time into hours: each session
    explodes into the hour buckets it covers (sequence(), typically
    1-2 — bounded by session length), each error event carries its own
    hour bucket, and the join becomes an EQUI join on the bucket
    followed by the exact range filter. A (session, error) pair can
    only meet in the error's own bucket, so no dedup is needed and the
    result is exactly the theta join's (which is the oracle). At
    100 TB candidate volume is errors-per-bucket x sessions-touching-
    that-bucket — time-partitioned and prunable, no quadratic corner.
    Same bucketize-then-verify discipline as candidate_pairs_blocked
    and the decontamination prefilter, applied to the time axis."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        _sessionized_events(ev)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    hour = "INTERVAL 1 HOUR"
    buckets = F.expr(f"sequence(date_trunc('hour', s), date_trunc('hour', e), {hour})")
    sess_b = sessions.select(
        "user_id", "session_id", "s", "e", F.explode(buckets).alias("bucket")
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("err_ts"), F.date_trunc("hour", "ts").alias("bucket")
    )
    return (
        sess_b.join(err, "bucket")
        .filter(F.col("err_ts").between(F.col("s"), F.col("e")))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


@query(
    "events_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, ts AS start_ts,
             ts + to_minutes(CAST(1 + event_id % 120 AS BIGINT)) AS end_ts,
             1 + event_id % 120 AS dur_min
      FROM events
    ), flagged AS (
      SELECT *,
             CASE WHEN start_ts <= MAX(end_ts) OVER (
                    PARTITION BY user_id ORDER BY start_ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ), islands AS (
      SELECT *,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY start_ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island_id
      FROM flagged
    )
    SELECT user_id,
           CAST(island_id AS BIGINT)  AS island_id,
           CAST(COUNT(*) AS BIGINT)   AS n_events,
           MIN(start_ts)              AS island_start,
           MAX(end_ts)                AS island_end,
           CAST(SUM(dur_min) AS BIGINT) AS total_event_minutes
    FROM islands
    GROUP BY user_id, island_id
    """,
)
def events_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (gaps-and-islands): merge each user's
    OVERLAPPING event intervals into maximal covered spans — the
    hospitalization-stay / machine-uptime / contiguous-activity
    operator that plain sessionization (fixed inactivity gap) cannot
    express, because here every event carries its own deterministic
    duration (1 + event_id % 120 minutes) and an island ends only when
    the next start exceeds the RUNNING MAX of all previous ends (a
    long early interval can swallow many later ones).

    Plan shape: running-max-of-end over (user, start-ordered) rows
    flags island starts, a cumulative sum numbers the islands, one
    grouped aggregate emits the spans. All three steps key on user_id,
    so Catalyst plans ONE exchange and the windows + aggregate run
    inside the same partition.

    100 TB shape: the single shuffle is on the natural entity key;
    per-user state is one running max (no buffering of the user's
    whole history beyond the sort Spark already does for the window).
    Skewed users are bounded by their own event counts — AQE's skew
    handling applies to the exchange, and the operator never
    materializes a cross-event product."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("start_ts"),
        F.expr(
            "ts + make_dt_interval(0, 0, CAST(1 + event_id % 120 AS INT), 0)"
        ).alias("end_ts"),
        (F.lit(1) + F.col("event_id") % 120).alias("dur_min"),
    )
    from fhir_to_lakehouse_spark.functions.intervals import (
        coalesce_intervals,
    )

    islands = coalesce_intervals(
        iv, ["user_id"], "start_ts", "end_ts", order_tiebreak="event_id"
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("start_ts").alias("island_start"),
        F.max("end_ts").alias("island_end"),
        F.sum("dur_min").cast("long").alias("total_event_minutes"),
    )


@query(
    "events_ewma_smoothing",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - 1 AS t
      FROM events
    )
    SELECT a.user_id, a.event_id, a.ts,
           ROUND(a.value, 2) AS value,
           ROUND(
             SUM(b.value * power(0.7, a.t - b.t))
               / SUM(power(0.7, a.t - b.t)),
             6
           ) AS ewma20
    FROM ordered a
    JOIN ordered b
      ON b.user_id = a.user_id
     AND b.t BETWEEN a.t - 19 AND a.t
    GROUP BY a.user_id, a.event_id, a.ts, a.value, a.t
    """,
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average per user: each
    event's value smoothed over its 20 most recent predecessors with
    geometric weights 0.7^k, normalized by the realized weight sum (so
    early events with short histories stay unbiased). Truncating the
    kernel at 20 rows is what makes EWMA expressible as a WINDOW
    AGGREGATE rather than a sequential recursion: the infinite-memory
    form s_t = a*v_t + (1-a)*s_{t-1} forces row-at-a-time state, while
    the 20-tap kernel (0.7^20 < 0.1% residual weight) is one
    rows-window dot product — and the ORACLE can state the identical
    kernel as a self-join, which the recursive form cannot.

    Plan shape: one user_id exchange, one sort, one 20-row sliding
    window computing both the weighted sum and the weight sum.
    Weights come from the row-position difference, so the whole kernel
    is codegen'd arithmetic.

    100 TB shape: the window buffers at most 20 rows per user at a
    time; cost is linear in events with a constant 20x multiply-add
    factor. The DuckDB oracle's self-join restatement is O(20n) too —
    both engines do the same work, stated differently."""
    from fhir_to_lakehouse_spark.functions.timeseries import ewma

    ev = load_table(spark, sf_dir, "events")
    return ewma(
        ev.select("user_id", "event_id", "ts", "value"),
        keys=["user_id"],
        order=["ts", "event_id"],
        value="value",
        alpha=0.7,
        taps=20,
        out="_ewma",
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.round("value", 2).alias("value"),
        F.round("_ewma", 6).alias("ewma20"),
    )


@query(
    "events_ab_test_ztest",
    oracle="""
    WITH s AS (
      SELECT COUNT(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_a,
             COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_b,
             COUNT(CASE WHEN event_id % 2 = 0
                         AND event_type = 'purchase' THEN 1 END) AS conv_a,
             COUNT(CASE WHEN event_id % 2 = 1
                         AND event_type = 'purchase' THEN 1 END) AS conv_b
      FROM events
    )
    SELECT CAST(n_a AS BIGINT)                       AS n_a,
           CAST(conv_a AS BIGINT)                    AS conv_a,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6)    AS rate_a,
           CAST(n_b AS BIGINT)                       AS n_b,
           CAST(conv_b AS BIGINT)                    AS conv_b,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6)    AS rate_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b)
                 / NULLIF(
                     SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                          * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                 / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS z_score
    FROM s
    """,
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test readout — the two-proportion pooled z-test every
    experimentation platform computes: exposures split into arms by a
    deterministic id hash (here event-id parity — an impression-level
    experiment), conversion = the exposure is a purchase, and the arm
    rates compared via z = (pA - pB) / sqrt(p(1-p)(1/nA + 1/nB)) with
    p pooled. The p-value threshold lives in the consumer (|z| > 1.96
    at 5%); emitting the statistic keeps the query engine-exact. The
    degenerate all-converted/none-converted case (p(1-p) = 0) yields
    NULL on both engines (try_divide / NULLIF), not an error.

    Plan shape: ONE global conditional aggregate to a single row
    (map-side combinable — one partial row per partition) followed by
    codegen'd arithmetic. Counts stay integers until the final
    projection, so both engines compute the identical IEEE expression
    on identical inputs — no accumulation-order drift.

    100 TB shape: the cheapest possible shape — one scan, one
    one-row-per-partition reduce. Per-experiment variants add the
    experiment id as a grouping key to the same aggregate."""
    ev = load_table(spark, sf_dir, "events")
    arm_a = F.col("event_id") % 2 == 0
    conv = F.col("event_type") == "purchase"
    s = ev.agg(
        F.count(F.when(arm_a, 1)).alias("n_a"),
        F.count(F.when(~arm_a, 1)).alias("n_b"),
        F.count(F.when(arm_a & conv, 1)).alias("conv_a"),
        F.count(F.when(~arm_a & conv, 1)).alias("conv_b"),
    )
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    na, nb = F.col("n_a"), F.col("n_b")
    pooled = (ca + cb) / (na + nb)
    z = F.try_divide(
        ca / na - cb / nb,
        F.sqrt(pooled * (1 - pooled) * (1.0 / na + 1.0 / nb)),
    )
    return s.select(
        "n_a",
        "conv_a",
        F.round(ca / na, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "events_seasonal_decompose",
    oracle="""
    WITH base AS (
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod, value
      FROM events
    ),
    seasonal AS (
      SELECT dow, hod, AVG(value) AS season_mean,
             COUNT(*) AS n
      FROM base GROUP BY dow, hod
    ),
    total AS (SELECT AVG(value) AS grand_mean FROM base)
    SELECT dow, hod,
           CAST(n AS BIGINT)                       AS n,
           ROUND(season_mean, 6)                   AS season_mean,
           ROUND(season_mean - grand_mean, 6)      AS seasonal_effect
    FROM seasonal CROSS JOIN total
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive decomposition — the ops-analytics baseline
    before any anomaly logic: the (day-of-week, hour-of-day) seasonal
    profile of the event value stream and each cell's effect relative
    to the grand mean. Subtracting this profile is what turns the
    MAD/CUSUM detectors (events_anomaly_mad, events_changepoint_cusum)
    from raw-value alarms into seasonality-aware ones.

    Plan shape: one grouped aggregate into at most 7x24 cells plus a
    1-row grand-mean broadcast — map-side combinable end to end.

    100 TB shape: output is structurally bounded at 168 rows; the
    only corpus-sized pass is the shared scan. The averages divide
    exact sums, so both engines agree to the rounding guard."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        "value",
    )
    seasonal = base.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("season_mean"),
    )
    total = base.agg(F.avg("value").alias("grand_mean"))
    return seasonal.join(F.broadcast(total)).select(
        "dow",
        "hod",
        "n",
        F.round("season_mean", 6).alias("season_mean"),
        F.round(
            F.col("season_mean") - F.col("grand_mean"), 6
        ).alias("seasonal_effect"),
    )


@query(
    "events_attribution_time_decay",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_type AS channel, ts AS t_ts
      FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    weighted AS (
      SELECT p.purchase_id, t.channel,
             POW(0.5, date_diff('microsecond', t.t_ts, p.p_ts)
                      / 86400000000.0) AS w
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 3 DAY
    ),
    normalized AS (
      SELECT channel,
             w / SUM(w) OVER (PARTITION BY purchase_id) AS credit
      FROM weighted
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT)     AS n_touches,
           ROUND(SUM(credit), 4)        AS attributed_conversions
    FROM normalized
    GROUP BY channel
    """,
)
def events_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-touch attribution, time-decay model — the marketing
    analytics standard between last-touch (the as-of entries) and
    data-driven models: every touchpoint in the 3 days before a
    purchase earns weight 0.5^(age_days), weights normalize per
    purchase (each conversion distributes exactly 1.0 of credit), and
    channels report their attributed conversion mass. The credit
    normalization is what makes this a window-over-join shape rather
    than a plain aggregate.

    Plan shape: user-keyed equi-join with the window predicate as a
    residual (per-user touch density is bounded, so fan-out is
    per-user-quadratic like the co-prescription join) -> per-purchase
    normalization window -> per-channel sum into 3 rows. The decay
    weights are pure codegen; per-purchase credit sums divide
    identical doubles on both engines (the window orders the same
    additions), and the final channel sum rounds at 1e-4 to absorb
    cross-partition accumulation order.

    100 TB shape: the join and the normalization window share the
    purchase key; AQE skew handling covers hot users. At petabyte
    event volumes the 3-day predicate makes this the bucketized
    interval join's shape (events_interval_join_bucketized) — the
    equi+residual form here is the dimension-bounded variant."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    age_days = (
        F.unix_micros("p_ts") - F.unix_micros("t_ts")
    ) / 86400000000.0
    weighted = (
        purchases.join(touches, "user_id")
        .filter(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
        )
        .select(
            "purchase_id",
            "channel",
            F.pow(F.lit(0.5), age_days).alias("w"),
        )
    )
    per_purchase = Window.partitionBy("purchase_id")
    normalized = weighted.select(
        "channel",
        (F.col("w") / F.sum("w").over(per_purchase)).alias("credit"),
    )
    return normalized.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("credit"), 4).alias("attributed_conversions"),
    )


@query(
    "events_diff_in_diff",
    oracle="""
    WITH labeled AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS treated
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT l.treated,
             CASE WHEN e.ts >= TIMESTAMP '2024-01-04' THEN 1 ELSE 0 END
               AS post,
             e.value
      FROM events e JOIN labeled l USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    means AS (
      SELECT treated, post, AVG(value) AS m, COUNT(*) AS n
      FROM cells GROUP BY treated, post
    )
    SELECT ROUND(MAX(CASE WHEN treated = 1 AND post = 1 THEN m END)
                 - MAX(CASE WHEN treated = 1 AND post = 0 THEN m END)
                 - MAX(CASE WHEN treated = 0 AND post = 1 THEN m END)
                 + MAX(CASE WHEN treated = 0 AND post = 0 THEN m END),
                 6) AS did_estimate,
           CAST(SUM(CASE WHEN treated = 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_treated_obs,
           CAST(SUM(CASE WHEN treated = 0 THEN n ELSE 0 END) AS BIGINT)
             AS n_control_obs
    FROM means
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the quasi-experimental workhorse
    when randomization isn't available: users who ever signed up form
    the treated group, the cutoff date splits pre/post, and the DiD
    estimate is the treated group's purchase-value change minus the
    control group's (differencing out the common time trend). The
    2x2 cell means are everything; the estimator is their alternating
    sum.

    Plan shape: one user-keyed label aggregate -> join onto the
    purchase slice -> a 4-cell grouped mean -> one-row alternating
    sum.

    100 TB shape: the label set is user-dimension-sized (broadcast
    below the threshold, shuffle-hash above); the cell aggregate is
    map-side combinable to 4 rows."""
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("treated")
    )
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .join(labeled, "user_id")
        .select(
            "treated",
            F.when(
                F.col("ts") >= F.lit("2024-01-04").cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
            "value",
        )
    )
    means = cells.groupBy("treated", "post").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    cell = lambda t, p: F.max(  # noqa: E731 — 4-cell pivot shorthand
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("m"))
    )
    return means.agg(
        F.round(cell(1, 1) - cell(1, 0) - cell(0, 1) + cell(0, 0), 6).alias(
            "did_estimate"
        ),
        F.sum(F.when(F.col("treated") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_treated_obs"),
        F.sum(F.when(F.col("treated") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_control_obs"),
    )



# z-normalized query pattern for the subsequence search: a 1-day spike
# ramp ([0,0,1,3,8,3,1,0] z-normalized, so sum(qz)=0 and sum(qz^2)=m).
# The SAME double literals are inlined into the DuckDB oracle below, so
# both engines score against bit-identical constants.
_ZNORM_M = 8
_ZNORM_QZ = [
    -0.7844645405527362,
    -0.7844645405527362,
    -0.3922322702763681,
    0.3922322702763681,
    2.3533936216582085,
    0.3922322702763681,
    -0.3922322702763681,
    -0.7844645405527362,
]
_QZ_VALUES = ", ".join(
    f"({i}, {repr(v)})" for i, v in enumerate(_ZNORM_QZ)
)


@query(
    "timeseries_znorm_subsequence_topk",
    oracle=f"""
    WITH d AS (SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
                      ROUND(SUM(value), 6) AS v
               FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, v,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS idx
          FROM d),
    qz(off, q) AS (VALUES {_QZ_VALUES}),
    w AS (SELECT a.user_id, a.idx AS start, b.idx - a.idx AS off, b.v
          FROM r a JOIN r b
            ON a.user_id = b.user_id
           AND b.idx BETWEEN a.idx AND a.idx + {_ZNORM_M - 1}),
    s AS (SELECT w.user_id, w.start,
                 COUNT(*)        AS n,
                 AVG(w.v)        AS mu,
                 SUM(w.v * w.v)  AS s2,
                 SUM(w.v * qz.q) AS cq
          FROM w JOIN qz ON w.off = qz.off
          GROUP BY 1, 2
          HAVING COUNT(*) = {_ZNORM_M}),
    scored AS (SELECT user_id, CAST(start AS INT) AS start_idx,
                      ROUND(SQRT(GREATEST(
                        2 * {_ZNORM_M}
                        - 2 * cq / SQRT(s2 / {_ZNORM_M} - mu * mu),
                        0.0)), 6) AS znorm_dist
               FROM s
               WHERE s2 / {_ZNORM_M} - mu * mu > 1e-12)
    SELECT user_id, start_idx, znorm_dist
    FROM scored
    ORDER BY znorm_dist, user_id, start_idx
    LIMIT 20
    """,
)
def timeseries_znorm_subsequence_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-normalized subsequence similarity search — the UCR-suite /
    Matrix-Profile core primitive, re-expressed in pure Catalyst HOFs:
    find the 20 length-8 windows of the per-user daily-value series
    whose shape is closest (z-normalized euclidean distance) to a
    fixed spike pattern. Shape search, not level search: each window
    is normalized by its own mean/std, so a 10x-amplitude user matches
    the same spike profile. Distances use the dot-product identity
    dist^2 = 2m - 2*sum(w*qz)/sd (valid because sum(qz)=0 and
    sum(qz^2)=m), so no normalized window is ever materialized.

    100 TB shape: one shuffle total — the (user, day) aggregate —
    after which each user's series folds to ONE row holding a bounded
    array (series length is time-bounded: 10 years of days = 3.7k
    doubles), and window generation + scoring run inside codegen via
    slice/aggregate/zip_with with zero row amplification (contrast the
    oracle's m-fold self-join, which is the tractable-at-sf0.01 spec,
    not the plan). The global top-20 is a TakeOrderedAndProject:
    per-partition partial top-k, no global sort. A row-level join
    formulation would shuffle m copies of every point; the array form
    ships each series once."""
    m = _ZNORM_M
    qz = F.array(*[F.lit(v) for v in _ZNORM_QZ])
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    ser = (
        d.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "v"))).alias("pts"))
        .select(
            "user_id", F.transform("pts", lambda p: p["v"]).alias("vs")
        )
        .filter(F.size("vs") >= m)
    )
    win = ser.select(
        "user_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("vs") - (m - 1)),
                lambda s: F.slice("vs", s, m),
            )
        ).alias("p0", "w"),
    ).select("user_id", (F.col("p0") + 1).cast("int").alias("start_idx"), "w")
    tot = F.aggregate("w", F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(
        F.transform("w", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cq = F.aggregate(
        F.zip_with("w", qz, lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    mu = tot / m
    var = s2 / m - mu * mu
    scored = (
        win.select(
            "user_id",
            "start_idx",
            var.alias("var"),
            (2 * m - 2 * cq / F.sqrt(var)).alias("d2"),
        )
        .filter(F.col("var") > 1e-12)
        .select(
            "user_id",
            "start_idx",
            F.round(F.sqrt(F.greatest("d2", F.lit(0.0))), 6).alias(
                "znorm_dist"
            ),
        )
    )
    return scored.orderBy("znorm_dist", "user_id", "start_idx").limit(20)


@query(
    "timeseries_sax_motifs",
    oracle=f"""
    WITH d AS (SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
                      ROUND(SUM(value), 6) AS v
               FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, v,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS idx
          FROM d),
    w AS (SELECT a.user_id, a.idx AS start, b.idx - a.idx AS off, b.v
          FROM r a JOIN r b
            ON a.user_id = b.user_id
           AND b.idx BETWEEN a.idx AND a.idx + {_ZNORM_M - 1}),
    st AS (SELECT user_id, start, AVG(v) AS mu, SUM(v * v) AS s2
           FROM w GROUP BY 1, 2
           HAVING COUNT(*) = {_ZNORM_M}
              AND SUM(v * v) / {_ZNORM_M} - AVG(v) * AVG(v) > 1e-12),
    z AS (SELECT w.user_id, w.start, w.off,
                 (w.v - st.mu)
                   / SQRT(st.s2 / {_ZNORM_M} - st.mu * st.mu) AS z
          FROM w JOIN st USING (user_id, start)),
    paa AS (SELECT user_id, start,
                   CAST(FLOOR(off / 2.0) AS INT) AS seg,
                   SUM(z) / 2 AS p
            FROM z GROUP BY 1, 2, 3),
    sym AS (SELECT user_id, start, seg,
                   CASE WHEN p < -0.6745 THEN 'a'
                        WHEN p < 0.0     THEN 'b'
                        WHEN p < 0.6745  THEN 'c'
                        ELSE 'd' END AS s
            FROM paa),
    words AS (SELECT user_id, start,
                     STRING_AGG(s, '' ORDER BY seg) AS sax_word
              FROM sym GROUP BY 1, 2)
    SELECT sax_word,
           CAST(COUNT(*) AS BIGINT)               AS n_windows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(user_id)                            AS example_user
    FROM words
    GROUP BY sax_word
    ORDER BY n_windows DESC, sax_word
    LIMIT 10
    """,
)
def timeseries_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif discovery — the DISCOVERY twin of
    timeseries_znorm_subsequence_topk's query SEARCH: every length-8
    window of every user's daily series is z-normalized, compressed by
    PAA to 4 segment means, discretized against the standard-normal
    quartile breakpoints (-0.6745, 0, 0.6745 -> a/b/c/d), and the most
    frequent 4-letter SAX words are the corpus's recurring shapes
    (Lin et al.'s symbolic aggregate approximation, the standard
    pre-filter for distributed motif mining). No query pattern needed;
    the output says WHAT shapes recur and how broadly (window count,
    distinct users, an example location).

    Cross-engine float discipline: both engines derive per-element z
    values from the SAME rounded daily sums and average each segment
    as (z1+z2)/2, so a PAA mean only crosses a breakpoint together on
    both sides (the breakpoints are irrational-valued literals no
    exact sum lands on). 100 TB shape: identical to the znorm search —
    one (user, day) shuffle, per-user bounded arrays, window/PAA/
    symbol work all in codegen — plus one final hash aggregate on the
    4-letter word (alphabet^segments = 256 keys, map-side collapsed),
    and the top-10 is a TakeOrderedAndProject."""
    m = _ZNORM_M
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    ser = (
        d.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("day", "v"))).alias("pts"))
        .select(
            "user_id", F.transform("pts", lambda p: p["v"]).alias("vs")
        )
        .filter(F.size("vs") >= m)
    )
    win = ser.select(
        "user_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("vs") - (m - 1)),
                lambda s: F.slice("vs", s, m),
            )
        ).alias("p0", "w"),
    ).select("user_id", (F.col("p0") + 1).cast("int").alias("start"), "w")
    tot = F.aggregate("w", F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(
        F.transform("w", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    mu = tot / m
    var = s2 / m - mu * mu
    zw = win.filter(var > 1e-12).select(
        "user_id",
        "start",
        F.transform(
            "w", lambda x: (x - mu) / F.sqrt(var)
        ).alias("z"),
    )
    # PAA segment means as (z1+z2)/2 — the exact op order the oracle's
    # 2-row SUM(z)/2 produces
    def _sym(p):
        return (
            F.when(p < -0.6745, F.lit("a"))
            .when(p < 0.0, F.lit("b"))
            .when(p < 0.6745, F.lit("c"))
            .otherwise(F.lit("d"))
        )

    segs = [
        (F.element_at("z", 2 * j + 1) + F.element_at("z", 2 * j + 2)) / 2
        for j in range(m // 2)
    ]
    words = zw.select(
        "user_id",
        "start",
        F.concat(*[_sym(p) for p in segs]).alias("sax_word"),
    )
    return (
        words.groupBy("sax_word")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("user_id").alias("example_user"),
        )
        .orderBy(F.col("n_windows").desc(), "sax_word")
        .limit(10)
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    t AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(n_transitions / SUM(n_transitions)
                   OVER (PARTITION BY from_type), 6) AS prob
    FROM t
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next = to | current = from), estimated from every
    consecutive event pair inside a user's stream (streams never chain
    across users). The workhorse of clickstream/journey modeling;
    row-normalized so each from_type's probabilities sum to 1.

    Plan shape: one user_id exchange for the LEAD window, then a
    groupBy on (from, to) whose key space is |event_type|^2 (~25),
    so the partial (map-side) aggregate collapses each partition to a
    handful of rows before the second, trivial shuffle; the final
    row-normalization is a window over the tiny matrix itself.

    100 TB shape: cost is the per-user sort inside the window — the
    same exchange every sessionization query here pays — and the
    transition-count state is bounded by the type alphabet squared,
    independent of corpus size. prob divides two exact counts, so both
    engines agree bit-for-bit before rounding."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(norm), 6
        ).alias("prob"),
    ).orderBy("from_type", "to_type")


@query(
    "events_autocorrelation",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1
    ),
    lags AS (SELECT CAST(UNNEST(generate_series(1, 7)) AS INT) AS lag)
    SELECT l.lag                    AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CORR(a.v, b.v), 6) AS acf
    FROM d a
    JOIN lags l ON TRUE
    JOIN d b ON b.day = a.day + l.lag
    GROUP BY l.lag
    ORDER BY lag
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..7) of the global daily value
    series — the ACF sweep behind seasonality detection (a weekly
    rhythm shows as a lag-7 peak). Stated as a lag-join, not a
    recursion: the daily series self-joins on day+k for each of the 7
    lags and Pearson-correlates the aligned pairs.

    Plan shape: the only data-sized work is the daily aggregate (one
    shuffle with map-side partial sums); everything after runs on a
    CALENDAR-bounded relation — at most |days in range| rows no matter
    the corpus — crossed with a broadcast 7-row lag table and
    self-joined on the day key.

    100 TB shape: 100 TB of events still spans the same calendar, so
    the post-aggregate series stays a few thousand rows; the ACF join
    cost is invariant to corpus growth while the daily aggregate
    parallelizes embarrassingly. The daily sums entering CORR
    accumulate in DECIMAL on both engines (the repo's money-sum rule,
    per-value 2dp cast then exact integer arithmetic), so the inputs
    are order-independent and bit-identical across engines — a rounded
    double SUM would still be order-dependent under the rounding
    (ADVICE r9)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("v")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = d.alias("a").crossJoin(F.broadcast(lags))
    pairs = a.join(
        d.alias("b"), F.date_add(F.col("a.day"), F.col("lag")) == F.col("b.day")
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("a.v", "b.v"), 6).alias("acf"),
        )
        .orderBy("lag")
    )
