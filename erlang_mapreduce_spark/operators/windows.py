"""Window-function operators (SURVEY.md §2.B "Window functions") — ranking,
analytic (lag/lead/first), and frame-based running/sliding aggregates.

All are single-shuffle plans: one Exchange on the partition key, one sort
within partitions, then the WindowExec runs pipelined. Orderings are always
TOTAL (unique tie-break column included) so results are deterministic —
a window over a non-total order is a latent nondeterminism bug that only
shows up when partitioning changes (e.g. at real scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "win_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       row_number() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS rnk,
       dense_rank() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS drnk
FROM customer
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation by balance. row_number gets
    a unique tie-break; rank/dense_rank are tie-stable by definition."""
    c = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@query(
    "win_analytic",
    oracle="""
SELECT event_id,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       first_value(value) OVER w AS first_value,
       lag(event_type, 2, 'none') OVER w AS prev2_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
""",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / offset-with-default per user timeline.
    The projection keeps every row (unlike the timeline AGGREGATES, which
    drop untimed events), so NULL ts must have ONE agreed position: both
    sides order ts NULLS LAST explicitly — Spark's asc default is nulls
    first, DuckDB's nulls last (fuzz-found divergence)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    return e.select(
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


@query(
    "win_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(29,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg3
FROM orders
""",
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average per customer order history.
    Frame sums go through DECIMAL: engines implement sliding frames with
    different accumulation strategies (e.g. pairwise vs subtract-on-slide),
    so float frame-sums are NOT reproducible across engines — decimal is."""
    o = load(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(29,6)")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(mov).cast("double") / F.count("*").over(mov)).alias(
            "moving_avg3"
        ),
    )


@query(
    "win_ntile",
    oracle="""
SELECT c_custkey, c_nationkey,
       ntile(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey) AS quartile,
       percent_rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC) AS pct_rank,
       cume_dist() OVER (PARTITION BY c_nationkey
                         ORDER BY c_acctbal DESC) AS cume
FROM customer
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank family: ntile quartiles + percent_rank + cume_dist
    per nation by balance. ntile's bucket assignment depends on row order, so
    it gets the unique tie-break; percent_rank/cume_dist are tie-stable
    rationals ((rank-1)/(n-1), peers/n) — a single exact-int division is
    correctly rounded identically in any IEEE engine, so no float rounding
    is needed. Same single-shuffle one-sort plan as win_rank."""
    c = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w_total).alias("quartile"),
        F.percent_rank().over(w_ties).alias("pct_rank"),
        F.cume_dist().over(w_ties).alias("cume"),
    )


@query(
    "cdc_latest_by_key",
    oracle="""
SELECT user_id, event_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1
""",
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot: the latest record per key, the materialized-view
    primitive behind every CDC/upsert table. NOT implemented as the obvious
    row_number()=1 window (which shuffles EVERY row, then sorts each key's
    full history just to keep one row): a single max(struct(ts, event_id,
    payload...)) aggregate gets partial/final combining (a SortAggregate
    pair — struct max is not hash-aggregable — but the sort is per map
    partition, pre-shuffle), so the exchange carries one row per
    (key × map partition) regardless of history depth —
    the same partial-agg leverage as the reference's per-mapper ETS combine
    (mapreduce.erl:275-282). Struct comparison is lexicographic, so
    (ts, event_id) leads the struct as the version key; the oracle states the
    same semantics as the row_number formulation over the identical total
    order."""
    e = load(spark, sf_dir, "events")
    latest = e.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("m")
    )
    return latest.select(
        "user_id",
        F.col("m.event_id").alias("event_id"),
        F.col("m.event_type").alias("event_type"),
        F.col("m.value").alias("value"),
        F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


@query(
    "win_range_interval",
    oracle=f"""
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(SUM(CAST(value AS DECIMAL(29,6)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS sum_10m,
       COUNT(*) OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
           AS cnt_10m
FROM events
""",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based window frame (RANGE over a 10-minute trailing interval),
    vs win_frame's row-count frames: each event sums every event of the
    same user in the preceding 600 seconds — however many rows that is.
    Spark's rangeBetween needs a numeric ordering key, so the frame orders
    by WHOLE epoch seconds (unix_timestamp truncates; the oracle floors
    DuckDB's fractional epoch() to match — sub-second precision would give
    the two engines different frame boundaries). Same
    single-shuffle one-sort WindowExec as row frames; the frame sum goes
    through DECIMAL because a sliding accumulator is float-order-dependent.
    RANGE frames peer-group ties (same timestamp ⇒ same frame), so the
    result is deterministic even without a unique tie-break."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, Window.currentRow)
    )
    dec = F.col("value").cast("decimal(29,6)")
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.sum(dec).over(w).cast("double").alias("sum_10m"),
        F.count("*").over(w).alias("cnt_10m"),
    )


@query(
    "cdc_scd2",
    oracle="""
SELECT user_id, event_id, event_type, value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → SCD-type-2 dimension: every change record becomes a
    validity interval [valid_from, valid_to) per key, closed by the NEXT
    change (lead over the per-key timeline); the open interval is the
    current row. The complement of cdc_latest_by_key: that op keeps only
    the newest state, this one keeps full point-in-time history — the
    table shape behind AS OF queries and slowly-changing dims. One
    exchange on user_id + one in-partition sort; lead() is pipelined in
    the same WindowExec. The order is total (ts, event_id), so interval
    chaining is deterministic under duplicate timestamps; intervals
    partition each key's timeline with no gaps or overlaps by
    construction. At 100 TB the same plan holds — history depth per key
    only changes partition height, not the shuffle count. Change records
    with NULL ts are dropped on BOTH sides: a validity interval needs a
    start time, and lead(ts) IS NULL would otherwise conflate "last
    change" with "next change is untimed" (plus the engines order NULL ts
    at opposite ends — Spark nulls first, DuckDB nulls last)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
