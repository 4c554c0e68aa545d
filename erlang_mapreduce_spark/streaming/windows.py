"""Time-window operators over `events` (SURVEY.md §2.B "Streaming").

These use the same window()/session_window() expressions Structured
Streaming executes incrementally; run here in batch mode so DuckDB can
oracle-check the semantics (a streaming query with availableNow + complete
mode produces exactly these results). The true incremental path — watermarks,
state store, late-data drop — lives in streams.py (rows-only checks).

Spark's window(ts, ...) buckets align to the unix epoch; the oracles
reproduce that with epoch arithmetic (300 s and 600 s divide both engines'
epoch origins, so alignment is identical). window()/session_window() DROP
NULL-timestamp rows (no bucket to land in); every oracle mirrors that with
an explicit ts IS NOT NULL (fuzz-found: the fixture has no NULL ts, random
corpora do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exact import dsum, dsum_sql
from ..registry import query
from ..tables import load

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_tumbling",
    oracle=f"""
SELECT strftime(to_timestamp(floor(epoch(ts) / 300) * 300),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS cnt,
       {dsum_sql('value')} AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window count+sum per event type — the streaming
    groupBy(window(...)) aggregation, batch-executed. At scale this is one
    hash shuffle on (window, type); streaming keeps per-window state until
    the watermark closes it."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle="""
WITH slid AS (
    SELECT to_timestamp(floor(epoch(ts) / 300) * 300 - k.k * 300) AS win_start,
           user_id
    FROM events, (SELECT unnest([0, 1]) AS k) k
    WHERE ts IS NOT NULL
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       count(*) AS cnt,
       count(DISTINCT user_id) AS nd_users
FROM slid
GROUP BY 1
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute window every 5 minutes — each event lands in
    2 windows (window() explodes to window copies before the agg; shuffle
    volume = slide-factor × rows, the scale cost of overlapping windows)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.count_distinct("user_id").alias("nd_users"),
        )
        .select(
            F.date_format("w.start", _TS_FMT).alias("win_start"),
            "cnt",
            "nd_users",
        )
    )


@query(
    "stream_session",
    oracle="""
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessioned AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM sessioned
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute inactivity gap) per user via Spark's native
    session_window — merged incrementally in streaming, computed via a
    sort-based group in batch. Oracle reproduces it with the classic
    gaps-and-islands SQL."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
        )
    )


@query(
    "rollup_time_hypertable",
    oracle=f"""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 1
            THEN 'day' ELSE 'hour' END AS resolution,
       count(*) AS cnt,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY GROUPING SETS
    ((event_type, date_trunc('day', ts)),
     (event_type, date_trunc('day', ts), date_trunc('hour', ts)))
""",
)
def rollup_time_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over events
    produces BOTH the hourly and the daily materialization (grouping-sets
    rollup on truncated time), tagged by resolution — the batch equivalent
    of a timeseries store's cascaded downsampling. Spark expands the sets
    in a single Expand + HashAggregate: the fact table is scanned ONCE
    however many resolutions are materialized, which is exactly what you
    want when the scan is 100 TB; adding 'week'/'month' levels costs only
    extra aggregate state, not extra scans."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "hour"
        ),
        "value",
    )
    # rollup(a,b,c) grouping_id: 0 = (a,b,c), 1 = (a,b) — keep just those
    # two, i.e. the GROUPING SETS the oracle declares.
    return (
        e.rollup("event_type", "day", "hour")
        .agg(
            F.count("*").alias("cnt"),
            dsum("value").alias("sum_value"),
            F.grouping_id().alias("_gid"),
        )
        .filter(F.col("_gid").isin(0, 1))
        .select(
            "event_type",
            "day",
            "hour",
            F.when(F.col("_gid") == 1, "day").otherwise("hour").alias(
                "resolution"
            ),
            "cnt",
            "sum_value",
        )
    )


@query(
    "ts_gap_fill",
    oracle=f"""
WITH b AS (
    SELECT event_type,
           to_timestamp(floor(epoch(ts) / 300) * 300) AS bucket,
           count(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
         FROM b GROUP BY 1),
grid AS (
    SELECT event_type,
           unnest(generate_series(lo, hi, INTERVAL 5 MINUTE)) AS bucket
    FROM span
),
j AS (
    SELECT g.event_type, g.bucket,
           coalesce(b.cnt, 0) AS cnt,
           CAST(b.cnt IS NULL AS INTEGER) AS filled,
           b.sum_value
    FROM grid g LEFT JOIN b USING (event_type, bucket)
)
SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       cnt, filled,
       last_value(sum_value IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS value_ff
FROM j
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling + forward fill — the timeseries-store feature every
    metrics pipeline needs on top of bucketed aggregation: emit a row for
    EVERY 5-minute bucket in each event_type's span (missing buckets get
    cnt 0 and filled=1) and carry the last observed sum forward. The
    bucket aggregate is materialized once (pooled persist — blocks freed
    at the next pooled-op invocation, ckpt.py) because the grid derives
    from it AND left-joins back to it — two consumers, and ReuseExchange
    would not save the recompute; post-agg cardinality is
    O(buckets × types), tiny at any corpus scale. The dense grid comes
    from explode(sequence(lo, hi)) per type (narrow), and the forward
    fill is last(ignorenulls) over an unbounded-preceding frame — one
    sort-window per type, no self-join."""
    from pyspark.sql import Window

    from ..ckpt import pooled_persist, release_transient_storage

    release_transient_storage()  # free the previous invocation's blocks
    e = load(spark, sf_dir, "events")
    b = pooled_persist(
        e.groupBy(
            "event_type", F.window("ts", "5 minutes").alias("w")
        )
        .agg(F.count("*").alias("cnt"), dsum("value").alias("sum_value"))
        .select("event_type", F.col("w.start").alias("bucket"), "cnt",
                "sum_value")
    )
    span = b.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 5 MINUTES"))
        ).alias("bucket"),
    )
    j = grid.join(b, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.date_format("bucket", _TS_FMT).alias("bucket"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.col("cnt").isNull().cast("int").alias("filled"),
        F.last("sum_value", ignorenulls=True).over(w).alias("value_ff"),
    )
