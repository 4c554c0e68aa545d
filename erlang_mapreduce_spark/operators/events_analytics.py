"""Event-stream analytics over `events` — the OLAP workloads an analytics
engine runs on clickstream-shaped data: cohort retention, ordered-step
funnels, gap-rule sessionization, and rank-based anomaly surfacing.
(`stream_session` in streaming/windows.py covers the session-WINDOW
aggregate; `analytics_sessionize` here assigns a session id to every
EVENT — the enrichment form downstream joins need.)

Ops here reduce to counts, ranks, and passthrough values, so their
oracles are exact with no float-arithmetic divergence surface at all.
Reference scope note: the reference engine (mapreduce.erl) has no event
workloads — these extend the declared engine surface the same way the
curation ops do (SURVEY.md §2.B.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exact import dsum, dsum_sql
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


SESSION_GAP_S = 1800  # 30-minute inactivity gap, the classic web default


@query(
    "analytics_sessionize",
    oracle=f"""
WITH ev AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec
    FROM events
    WHERE ts IS NOT NULL
),
marks AS (
    SELECT *,
           CASE WHEN lag(sec) OVER w IS NULL
                  OR sec - lag(sec) OVER w > {SESSION_GAP_S}
                THEN 1 ELSE 0 END AS is_new
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM marks
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM sess
GROUP BY user_id, session_seq
""",
)
def analytics_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-rule sessionization: a user's events split into sessions wherever
    the inactivity gap exceeds 30 minutes (lag + running-sum of
    session-start marks — the standard batch formulation), then per-session
    stats. The whole op is ONE exchange: the lag window, the running sum,
    and the per-(user, session) aggregate all cluster on user_id, and
    Spark's EnsureRequirements recognizes hashpartitioning(user_id) as
    satisfying the (user_id, session_seq) grouping, so the window sort
    feeds the final aggregate with no second shuffle. Gaps compare WHOLE
    epoch seconds on both engines (unix_timestamp truncates; the oracle
    floors DuckDB's fractional epoch() to match — the win_range_interval
    precedent), and the value sum goes through DECIMAL (exact.py).
    Orderings are total (ts, event_id), so session boundaries are
    deterministic under any partitioning. Events with NULL ts are dropped
    on BOTH sides: an untimed event has no place on a session timeline
    (and the engines would order it at opposite ends — Spark sorts nulls
    first, DuckDB's window ORDER BY defaults nulls last)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id", "event_id", "ts", "value",
            F.unix_timestamp("ts").alias("sec"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("sec") - F.lag("sec").over(w)
    marks = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0),
    )
    sess = marks.withColumn("session_seq", F.sum("is_new").over(run))
    return sess.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


ANOMALY_TOP_PER_100 = 1  # keep ceil(n/100) per type = the top ~1%


@query(
    "analytics_anomaly_extremes",
    oracle="""
WITH nn AS (
    SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
    SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id) AS rn,
           count(*)     OVER (PARTITION BY event_type) AS n
    FROM nn
)
SELECT event_type, event_id, value, rn
FROM ranked
WHERE rn <= (n + 99) // 100
""",
)
def analytics_anomaly_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based anomaly surfacing: the top ~1% of events by value within
    each event_type (k = ceil(n/100), computed as (n+99) integer-div 100 —
    never n*0.01, whose binary-float rounding can flip ceil() across
    engines). Rank thresholds are chosen over quantile thresholds
    deliberately: row_number over a total order is exact integer
    arithmetic, immune to the interpolation-formula ulp drift a
    `value > p99` filter would ride on. One exchange on event_type serves
    both window functions (verified: executedPlan has exactly 1 Exchange).
    Unlike topk_per_group, the rank filter canNOT be pushed below the sort
    (WindowGroupLimit needs a literal k; ceil(n/100) is data-dependent),
    so each partition sorts its full type population — at 100 TB with few
    very hot types, pre-aggregate k per type and salt, or fall back to a
    fixed-k topk_per_group. NULL values carry no anomaly signal and are
    dropped identically on both sides."""
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), "event_id"
    )
    w_all = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type", "event_id", "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    return ranked.filter(
        F.col("rn") <= F.expr("(n + 99) div 100")
    ).select("event_type", "event_id", "value", "rn")


AU_WINDOW_D = 7  # trailing window width in days


@query(
    "analytics_active_users_7d",
    oracle=f"""
WITH act AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
days AS (SELECT DISTINCT day FROM act)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       count(DISTINCT a.user_id) AS au7
FROM days d
JOIN act a ON a.day BETWEEN d.day - INTERVAL {AU_WINDOW_D - 1} DAY
                        AND d.day
GROUP BY 1
""",
)
def analytics_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — DISTINCT counting over a
    sliding window, which no window frame can express (count(DISTINCT)
    isn't a frame aggregate in either engine). The scalable formulation is
    bucket expansion, the same rewrite as join_interval: each distinct
    (user, activity-day) row fans out to the ≤7 report days it supports
    (narrow explode(sequence)), report days prune to days that actually
    occur via a broadcast semi-join against the tiny distinct-days
    relation, and one count-distinct agg per report day finishes it. Cost
    is O(7·|daily actives|) with ordinary hash exchanges — vs the naive
    day×events range join (BNLJ) or re-scanning events once per day.
    Raw events collapse to distinct (user, day) FIRST (map-side combine
    does most of that pre-shuffle), so the fan-out runs on the small
    relation."""
    act = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    days = act.select("day").distinct()
    fanned = act.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {AU_WINDOW_D - 1} DAYS"),
            )
        ).alias("report_day"),
    )
    return (
        fanned.join(
            F.broadcast(days), fanned.report_day == days.day, "left_semi"
        )
        .groupBy(F.date_format("report_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("au7"))
    )


@query(
    "analytics_transition_matrix",
    oracle="""
WITH ev AS (
    SELECT user_id, event_id, ts, event_type FROM events
    WHERE ts IS NOT NULL
),
tr AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM ev
)
SELECT from_type, to_type, count(*) AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY from_type), 6) AS prob
FROM tr
WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
""",
)
def analytics_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every consecutive (event, next event) pair inside one user's
    timeline, the count and the per-source-state transition probability —
    the behavioral-model statistic behind next-action prediction and
    anomaly scoring (a transition with near-zero learned probability is a
    surprise).

    Plan: one exchange on user_id for the lead() window, then a hash agg
    on the (from, to) pair — S² groups for S event types, trivially small
    at any corpus size — with the per-from normalizer as a window over the
    aggregate output (S² rows, no second pass over events). Ordering is
    the total (ts, event_id); NULL-ts events are dropped on both sides
    (no place on a timeline — the sessionize/scd2 convention) while NULL
    event TYPES are kept as real states (both engines group NULLs
    together); a transition TO the last event of a user (lead = NULL row
    boundary) is excluded by the to_type filter on both sides, which also
    drops transitions to NULL-type events only when the NULL is genuinely
    the lead value — identical semantics in both engines. The probability
    divides two exact ints in double and rounds to 6."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", "ts", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = tr.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(norm), 6
        ).alias("prob"),
    )


@query(
    "analytics_pattern_match",
    oracle="""
WITH ev AS (
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           substr(event_type, 1, 1) AS c
    FROM events
    WHERE ts IS NOT NULL
),
s AS (
    SELECT user_id,
           coalesce(string_agg(c, '' ORDER BY ts, event_id), '') AS seq
    FROM ev GROUP BY user_id
)
SELECT user_id,
       CAST(length(seq) AS BIGINT) AS seq_len,
       regexp_matches(seq, 'v[^c]*p') AS direct_purchase,
       regexp_matches(seq, 'e[^p]*p') AS recovered_purchase
FROM s
""",
)
def analytics_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (the MATCH_RECOGNIZE workload Spark
    lacks natively): each user's event history collapses to an ordered
    one-char-per-event string — v(iew) c(lick) p(urchase) s(ignup)
    e(rror), first letters are distinct — and row patterns become plain
    regexes over it: a view converting to purchase with NO intervening
    click (`v[^c]*p`), a purchase that recovered from an error
    (`e[^p]*p`). One shuffle (the per-user collect), then narrow
    JVM-codegen regex — the sequence string is O(events-per-user), the
    same per-key bound every stateful op here carries, and regex cost is
    linear in it. At 100 TB with pathological hot keys, cap the sequence
    with slice() after sort — detection over a bounded recent window,
    the same trade streaming state bounds make.

    Exactness: ordering is the total (ts, event_id); NULL event_types
    contribute nothing on either side (array_join and string_agg both
    skip NULLs; an all-NULL user is pinned to '' by the oracle's
    coalesce, matching array_join's natural empty); events with NULL ts
    are dropped on BOTH sides before sequencing (an unordered event has
    no position in a sequence — and the engines disagree on where to
    put it: Spark's sort_array sorts a NULL struct field first, DuckDB's
    ORDER BY defaults nulls last); and Java and DuckDB regexes agree on
    this alternation-free character-class subset (both are leftmost
    partial match)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id", "ts", "event_id",
            F.substring("event_type", 1, 1).alias("c"),
        )
    )
    s = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "c"))),
                lambda x: x["c"],
            ),
            "",
        ).alias("seq")
    )
    return s.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.col("seq").rlike("v[^c]*p").alias("direct_purchase"),
        F.col("seq").rlike("e[^p]*p").alias("recovered_purchase"),
    )


_RFM_SEG_SQL = """
CASE WHEN r_score = 4 AND f_score = 4 THEN 'champion'
     WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
     WHEN r_score <= 2 THEN 'at_risk'
     WHEN f_score >= 3 THEN 'loyal'
     ELSE 'regular' END
""".strip()


@query(
    "analytics_rfm",
    oracle=f"""
WITH cust AS (
    SELECT o_custkey,
           CAST(floor(epoch(max(o_orderdate))) AS BIGINT) AS rec,
           count(*) AS freq,
           {dsum_sql('o_totalprice')} AS mon
    FROM orders GROUP BY 1
),
b AS (
    SELECT quantile_cont(rec,  [0.25, 0.5, 0.75]) AS rq,
           quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq,
           quantile_cont(mon,  [0.25, 0.5, 0.75]) AS mq
    FROM cust
),
scored AS (
    SELECT c.o_custkey, c.rec, c.freq, c.mon,
           1 + CAST(c.rec > b.rq[1] AS INT) + CAST(c.rec > b.rq[2] AS INT)
             + CAST(c.rec > b.rq[3] AS INT) AS r_score,
           1 + CAST(c.freq > b.fq[1] AS INT) + CAST(c.freq > b.fq[2] AS INT)
             + CAST(c.freq > b.fq[3] AS INT) AS f_score,
           1 + CAST(c.mon > b.mq[1] AS INT) + CAST(c.mon > b.mq[2] AS INT)
             + CAST(c.mon > b.mq[3] AS INT) AS m_score
    FROM cust c, b
)
SELECT o_custkey, rec, freq, mon, r_score, f_score, m_score,
       {_RFM_SEG_SQL} AS segment
FROM scored
""",
)
def analytics_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic warehouse scoring workload: per customer, last-order epoch,
    order count, and decimal-exact spend, each scored into quartiles and
    mapped to a named segment (champion / loyal / at_risk / hibernating /
    regular).

    Scale shape: the naive scoring is three GLOBAL ntile windows — one
    sorted task holding every customer. Here quartile BOUNDARIES come
    from one `percentile` aggregate over the per-customer rollup (a
    9-double result, distributed partial agg), broadcast into a narrow
    three-comparison projection — the agg_quantile_bins pattern, which
    also carries the cross-engine exactness argument (dyadic fractions,
    exact interpolation on integer metrics, identical decimal-cast
    doubles on spend; quartile ties land in the LOWER bucket on both
    engines, where ntile would split them arbitrarily by row order).
    Epoch recency is floor()'d to BIGINT on both sides."""
    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.unix_timestamp(F.max("o_orderdate")).alias("rec"),
        F.count("*").alias("freq"),
        dsum("o_totalprice").alias("mon"),
    )
    b = cust.agg(
        F.expr("percentile(rec,  array(0.25D, 0.5D, 0.75D))").alias("rq"),
        F.expr("percentile(freq, array(0.25D, 0.5D, 0.75D))").alias("fq"),
        F.expr("percentile(mon,  array(0.25D, 0.5D, 0.75D))").alias("mq"),
    )

    def score(metric: str, qs: str):
        return (
            F.lit(1)
            + (F.col(metric) > F.col(qs)[0]).cast("int")
            + (F.col(metric) > F.col(qs)[1]).cast("int")
            + (F.col(metric) > F.col(qs)[2]).cast("int")
        )

    scored = cust.crossJoin(F.broadcast(b)).select(
        "o_custkey",
        "rec",
        "freq",
        "mon",
        score("rec", "rq").alias("r_score"),
        score("freq", "fq").alias("f_score"),
        score("mon", "mq").alias("m_score"),
    )
    return scored.select(
        "*",
        F.when(
            (F.col("r_score") == 4) & (F.col("f_score") == 4),
            F.lit("champion"),
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2),
            F.lit("hibernating"),
        )
        .when(F.col("r_score") <= 2, F.lit("at_risk"))
        .when(F.col("f_score") >= 3, F.lit("loyal"))
        .otherwise(F.lit("regular"))
        .alias("segment"),
    )


MOTIF_W = 8  # subsequence length
MOTIF_K = 10  # matches returned
# query pattern in value-millis: a spike ramp 0,0,1,2,4,2,1,0
_MOTIF_Q = (0, 0, 1000, 2000, 4000, 2000, 1000, 0)
_MOTIF_CLAMP = 100_000_000  # |value| ≤ 1e5 after millis scaling — keeps
#                             every (diff)² · W sum far inside int64


@query(
    "ts_motif_match",
    oracle=f"""
WITH ev AS (
    SELECT user_id, ts, event_id,
           least(greatest(CAST(floor(value * 1000) AS BIGINT),
                          -{_MOTIF_CLAMP}), {_MOTIF_CLAMP}) AS vm
    FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
      AND ts IS NOT NULL AND event_id IS NOT NULL
),
s AS (
    SELECT user_id,
           array_agg(vm ORDER BY ts, event_id) AS vs,
           array_agg(event_id ORDER BY ts, event_id) AS ids
    FROM ev GROUP BY user_id
),
wi AS (
    SELECT user_id, ids, vs,
           unnest(range(1, len(vs) - {MOTIF_W} + 2)) AS i
    FROM s
),
w AS (
    SELECT user_id, ids[CAST(i AS INTEGER)] AS start_event_id,
           vs[CAST(i AS INTEGER):CAST(i + {MOTIF_W} - 1 AS INTEGER)] AS win
    FROM wi
),
d AS (
    SELECT user_id, start_event_id,
           list_sum(list_transform(range(1, {MOTIF_W + 1}),
               j -> (win[CAST(j AS INTEGER)]
                     - {list(_MOTIF_Q)}[CAST(j AS INTEGER)])
                    * (win[CAST(j AS INTEGER)]
                       - {list(_MOTIF_Q)}[CAST(j AS INTEGER)]))) AS dist
    FROM w
)
SELECT user_id, start_event_id, CAST(dist AS BIGINT) AS dist,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY dist, user_id, start_event_id)
             AS rn
      FROM d)
WHERE rn <= {MOTIF_K}
""",
)
def ts_motif_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence (motif) search — the per-user sliding-window
    similarity query of the matrix-profile family: every length-W window
    of each user's value series, ordered by event time, is scored by
    Euclidean distance against a broadcast query pattern (a spike ramp
    here), and the K best-matching subsequences across all users are
    returned. The engine's similarity family covers vectors
    (sim_search*); this is its ordered-sequence corner.

    Cross-engine exactness by construction: values quantize to CLAMPED
    int64 millis (the clamp keeps Σ diff² inside int64 for any input
    corpus), the window is a frame-ordered collect_list whose order both
    engines pin with the same (ts, event_id) total order, and the
    distance is pure integer arithmetic — no float anywhere, so even
    tie-free ranking is exact (ties break on user_id, start_event_id).

    Scale shape: ONE shuffle (partition by user on the window frame);
    scoring is a narrow higher-order zip_with/aggregate expression in
    whole-stage codegen (no UDF); the global top-K is a
    TakeOrderedAndProject (per-partition heap, K·P driver merge), never
    a full sort. At 100 TB this is scan + per-user frames + K rows out —
    matrix-profile self-joins would instead pre-bucket by SAX/PAA
    symbol, the same candidate-pruning posture as sim_search_ann."""
    q = F.array(*[F.lit(v) for v in _MOTIF_Q])
    ev = (
        load(spark, sf_dir, "events")
        # a row without a timestamp (or id) cannot take a deterministic
        # place in the series — and the engines disagree on NULL sort
        # placement (Spark first, DuckDB's array_agg last), so they are
        # excluded, not ordered
        .filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.least(
                F.greatest(
                    F.floor(F.col("value") * 1000).cast("long"),
                    F.lit(-_MOTIF_CLAMP),
                ),
                F.lit(_MOTIF_CLAMP),
            ).alias("vm"),
        )
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, MOTIF_W - 1)
    )
    wins = ev.select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        F.collect_list("vm").over(frame).alias("win"),
    ).filter(F.size("win") == MOTIF_W)
    scored = wins.select(
        "user_id",
        "start_event_id",
        F.aggregate(
            F.zip_with("win", q, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist"),
    )
    top = scored.orderBy("dist", "user_id", "start_event_id").limit(MOTIF_K)
    rank_w = Window.orderBy("dist", "user_id", "start_event_id")
    return top.select(
        "user_id",
        "start_event_id",
        "dist",
        F.row_number().over(rank_w).cast("int").alias("rank"),
    )
