"""Event-stream analytics over `events` — the OLAP workloads an analytics
engine runs on clickstream-shaped data: cohort retention and ordered-step
funnels. (Sessionization lives in streaming/windows.py `stream_session`,
computed with the same semantics in batch and incrementally.)

Both ops reduce to counts, so their oracles are exact with no float
handling at all. Reference scope note: the reference engine
(mapreduce.erl) has no event workloads — these extend the declared
engine surface the same way the curation ops do (SURVEY.md §2.B.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "analytics_cohort_retention",
    oracle="""
WITH act AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
coh AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
SELECT strftime(coh.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', coh.cohort, act.day) AS INTEGER) AS offset_days,
       count(*) AS n_users
FROM act JOIN coh USING (user_id)
GROUP BY 1, 2
""",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by their first-activity day
    (the cohort), then counted per (cohort, day-offset) — the table behind
    every retention curve. Plan shape: distinct (user, day) activity via
    one hash agg (map-side combine collapses each user's events per day
    before the exchange), per-user cohort as a second agg over THAT
    relation (orders of magnitude smaller than raw events), then a join
    back keyed on user_id — the activity relation is already partitioned
    by a user-prefixed key, and the final count agg emits
    |cohorts|×|offsets| rows. Raw events are scanned exactly once. Counts
    only — no float hashing concerns."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    act = e.distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort").alias("offset_days"),
        )
        .agg(F.count("*").alias("n_users"))
    )


_FUNNEL = ("view", "click", "purchase")


@query(
    "analytics_funnel",
    oracle=f"""
WITH ev AS (
    -- microsecond truncation up front: Spark reads the TIMESTAMP(NANOS)
    -- fixture as long nanos and truncates to micros (tables.load), and
    -- this op compares event timestamps AGAINST EACH OTHER with strict >,
    -- so the oracle must compare at the same precision even if DuckDB's
    -- parquet reader someday surfaces TIMESTAMP_NS here
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
s1 AS (
    SELECT user_id, min(ts) AS t FROM ev
    WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM ev e JOIN s1 USING (user_id)
    WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts > s1.t
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM ev e JOIN s2 USING (user_id)
    WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts > s2.t
    GROUP BY 1
)
SELECT 1 AS step, '{_FUNNEL[0]}' AS step_name,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT 2, '{_FUNNEL[1]}', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, '{_FUNNEL[2]}', (SELECT count(*) FROM s3)
""",
)
def analytics_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view → click → purchase): a user converts at
    step k only with an event STRICTLY AFTER their step-k-1 conversion
    time — min-ts per step, sequenced. The scalable plan is one
    filtered-agg-and-join per step, every one keyed on user_id: step k's
    events are filtered BEFORE the join (predicate reaches the scan), the
    join hydrates each candidate with the prior step's timestamp, and the
    min-agg reuses the user_id partitioning. Step relations shrink
    monotonically, so later stages cost less, and nothing ever collects or
    cross-joins. Output is 3 rows of exact counts."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    prev: DataFrame | None = None
    counts = []
    for step, etype in enumerate(_FUNNEL, start=1):
        stage = e.filter(F.col("event_type") == etype)
        if prev is not None:
            stage = stage.join(prev, "user_id").filter(
                F.col("ts") > F.col("t")
            )
        cur = stage.groupBy("user_id").agg(F.min("ts").alias("t"))
        counts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(step).alias("step"),
                F.lit(etype).alias("step_name"),
                "n_users",
            )
        )
        prev = cur.select("user_id", "t")
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out
