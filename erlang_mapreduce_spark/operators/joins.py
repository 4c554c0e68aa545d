"""Join operators (SURVEY.md §2.B "Joins").

The reference has no joins — its closest structural cousin is the 26-way
key-routed shuffle (sendToReducer, mapreduce.erl:216-229). All ops here are
north-star extensions, each implemented with the physical strategy you'd
want at 100 TB:

- dimension joins broadcast explicitly (no shuffle of the fact table);
- large-large equi-joins shuffle on the key and let AQE pick SMJ vs
  shuffled-hash (and split skewed partitions);
- the interval join uses the bucket-expansion trick to stay an EQUI-join
  (Spark's native plan for a pure range predicate is a nested-loop —
  O(n·m) — which is the known weak spot, SURVEY.md §4.2);
- the as-of join is a union + running `last()` window: one shuffle on the
  key, no per-key Python, no merge_asof materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exact import dsum, dsum_sql
from ..registry import query
from ..tables import load

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "join_broadcast",
    oracle="""
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⨝ broadcast dims: nation/region ship to every executor once;
    the customer scan never shuffles. The r_name filter prunes before the
    join (Catalyst pushes it below)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "join_sortmerge",
    oracle=f"""
SELECT o_orderkey, o_orderstatus,
       count(*) AS n_lines,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus <> 'P'
GROUP BY o_orderkey, o_orderstatus
""",
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join (orders ⨝ lineitem): both sides shuffle on the
    key; AQE picks sort-merge or shuffled-hash and handles skew at runtime.
    The post-join aggregate reuses the join's hash partitioning — no second
    shuffle (verified in tests/test_plans.py)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_outer",
    oracle=f"""
WITH cn AS (SELECT c_nationkey AS nk, count(*) AS c_cnt FROM customer
            GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, count(*) AS s_cnt,
                   {dsum_sql('s_acctbal')} AS s_bal
            FROM supplier GROUP BY 1)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey, c_cnt, s_cnt, s_bal
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (covers the left/right null-extension semantics in
    both directions): per-nation customer counts vs supplier counts, nulls
    where either side is absent. Aggregating BEFORE the outer join keeps
    the joined relations tiny — at scale, outer joins over pre-aggregated
    keys beat row-level outer joins by orders of magnitude."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("c_cnt"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("s_cnt"), dsum("s_acctbal").alias("s_bal"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "c_cnt", "s_cnt", "s_bal"
    )


@query(
    "join_semi_anti",
    oracle="""
SELECT 'has_order' AS tag, c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'no_order' AS tag, c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence joins: left-semi + left-anti. Semi/anti joins only ship the
    join key of the right side (and stop at first match) — the right way to
    express EXISTS at scale, never a join+distinct."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    semi = c.join(o, cond, "left_semi").select(
        F.lit("has_order").alias("tag"), "c_custkey"
    )
    anti = c.join(o, cond, "left_anti").select(
        F.lit("no_order").alias("tag"), "c_custkey"
    )
    return semi.unionAll(anti)


_BINS = [
    (0.0, 50.0, "low"),
    (50.0, 100.0, "mid"),
    (100.0, 150.0, "high"),
    (150.0, 1e6, "top"),
]


@query(
    "join_theta_range",
    oracle="""
SELECT e.event_id, e.value, b.label
FROM events e
JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 100.0, 'mid'),
             (100.0, 150.0, 'high'), (150.0, 1000000.0, 'top'))
     b(lo, hi, label)
  ON e.value >= b.lo AND e.value < b.hi
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join: events banded into value bins. The bin
    side is broadcast, so the physical plan is a BroadcastNestedLoopJoin
    over a 4-row table — O(n·4), fine at any scale. A large-large theta
    join would instead need the binning rewrite (see join_interval)."""
    e = load(spark, sf_dir, "events")
    bins = spark.createDataFrame(_BINS, ["lo", "hi", "label"])
    return e.join(
        F.broadcast(bins),
        (e.value >= bins.lo) & (e.value < bins.hi),
    ).select("event_id", "value", "label")


_INTERVALS = [
    ("2024-01-02 00:00:00", "2024-01-05 12:00:00", "w1"),
    ("2024-01-05 12:00:00", "2024-01-09 00:00:00", "w2"),
    ("2024-01-12 00:00:00", "2024-01-20 06:30:00", "w3"),
    ("2024-01-25 18:00:00", "2024-02-01 00:00:00", "w4"),
]


@query(
    "join_interval",
    oracle="""
SELECT e.event_id, i.label
FROM events e
JOIN (VALUES (TIMESTAMP '2024-01-02 00:00:00',
              TIMESTAMP '2024-01-05 12:00:00', 'w1'),
             (TIMESTAMP '2024-01-05 12:00:00',
              TIMESTAMP '2024-01-09 00:00:00', 'w2'),
             (TIMESTAMP '2024-01-12 00:00:00',
              TIMESTAMP '2024-01-20 06:30:00', 'w3'),
             (TIMESTAMP '2024-01-25 18:00:00',
              TIMESTAMP '2024-02-01 00:00:00', 'w4'))
     i(t_start, t_end, label)
  ON e.ts >= i.t_start AND e.ts < i.t_end
""",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-in-interval join via BUCKET EXPANSION: each interval explodes
    to the days it covers; events equi-join on their day bucket, then a
    residual range filter exact-matches the boundaries. This turns an
    O(n·m) nested-loop into a hash equi-join — the pattern that survives
    a large interval table at 100 TB (Spark has no native range-join
    optimization; this rewrite is the §4.2 'known weak spot' answer)."""
    e = load(spark, sf_dir, "events")
    iv = spark.createDataFrame(_INTERVALS, ["t_start", "t_end", "label"]).select(
        F.to_timestamp("t_start").alias("t_start"),
        F.to_timestamp("t_end").alias("t_end"),
        "label",
    )
    iv_days = iv.select(
        "t_start",
        "t_end",
        "label",
        F.explode(
            F.sequence(
                F.date_trunc("day", "t_start"),
                F.date_trunc("day", F.col("t_end") - F.expr("INTERVAL 1 SECOND")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    ev = e.withColumn("day", F.date_trunc("day", "ts"))
    return (
        ev.join(F.broadcast(iv_days), "day")
        .filter((F.col("ts") >= F.col("t_start")) & (F.col("ts") < F.col("t_end")))
        .select("event_id", "label")
    )


@query(
    "join_asof",
    oracle="""
WITH purchases AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase' AND ts IS NOT NULL),
     signups   AS (SELECT user_id, ts FROM events
                   WHERE event_type = 'signup' AND ts IS NOT NULL)
SELECT p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
FROM purchases p
ASOF JOIN signups s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest signup at-or-before
    it, per user (DuckDB ASOF JOIN tie policy: >= includes equal
    timestamps). Implemented as union + running last(): one shuffle on
    user_id, sort within partition, running carry of the signup timestamp —
    O(n log n) per key group, no per-key Python, no nested loop. Signup
    rows sort BEFORE purchases at equal ts so >= semantics hold. NULL-ts
    rows are dropped on BOTH sides: an untimed record has no as-of
    position — and DuckDB's ASOF sort treats a NULL probe ts as +inf
    (matching it to the LAST signup) where the predicate semantics say
    no match, so the filter is also what keeps the engines agreeing
    (fuzz-found, tests/test_sql_fuzz.py)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_signup"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_signup")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_signup").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = signups.unionAll(purchases).withColumn(
        "signup_ts",
        F.last(F.when(F.col("is_signup") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter((F.col("is_signup") == 0) & F.col("signup_ts").isNotNull())
        .select(
            "event_id",
            F.date_format("ts", _TS_FMT).alias("purchase_ts"),
            F.date_format("signup_ts", _TS_FMT).alias("signup_ts"),
        )
    )


N_SALT = 8


@query(
    "join_skew_salted",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS cnt,
       {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: the fact side gets a deterministic salt in
    [0, 8) per row; the (smaller) build side is exploded 8× so every
    (key, salt) pairing exists. A hot key's rows then spread over 8 shuffle
    partitions instead of one straggler task. The salt changes only the
    DISTRIBUTION, never the result — the oracle is the plain join. AQE's
    skew-join split handles moderate skew automatically; explicit salting
    is for the pathological keys AQE can't split (a single key bigger than
    one executor's memory — the reference's first-letter partitioning,
    mapreduce.erl:226, is exactly this failure mode at 26 keys)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted_fact = li.withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALT)).cast(
            "int"
        ),
    )
    salted_build = o.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    )
    joined = salted_fact.join(
        salted_build,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (salted_fact["_salt"] == salted_build["_salt"]),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        dsum("l_extendedprice").alias("sum_price"),
    )


BUCKET_ROOT = "/tmp/spark_graft_buckets"
N_BUCKETS = 16


@query(
    "join_bucketed",
    oracle=f"""
SELECT l_orderkey,
       count(*) AS n_items,
       {dsum_sql('l_extendedprice')} AS sum_price,
       any_value(o_totalprice) AS o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey
""",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written once bucketed+sorted by
    the join key (bucketBy 16 on orderkey), then joined WITHOUT a shuffle —
    the scan's bucket layout satisfies the join's distribution requirement,
    so the plan is a zero-Exchange sort-merge join. This is the 100 TB
    answer for a fact-to-fact join repeated across many queries: pay the
    partitioning once at write time, never again (the durable analog of
    the reference's reusable pre-split partition files, mapreduce.erl:57-64,
    README.md:10-11). The grouped aggregate also reuses the bucket
    distribution — no Exchange anywhere in the plan."""
    import os

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    db = f"bucketdb_{sf_tag.replace('.', '_')}"
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    tables = {
        "lineitem_b": (
            load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_linenumber", "l_extendedprice"
            ),
            "l_orderkey",
        ),
        "orders_b": (
            load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
            "o_orderkey",
        ),
    }
    for tname, (df, key) in tables.items():
        full = f"{db}.{tname}"
        if not spark.catalog.tableExists(full):
            # EXTERNAL table (explicit /tmp path): a vanilla session's
            # in-memory catalog forgets tables between runs while a managed
            # location would linger under ./spark-warehouse and collide —
            # external + overwrite is re-runnable from any session
            (
                df.write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .option("path", os.path.join(BUCKET_ROOT, sf_tag, tname))
                .mode("overwrite")
                .saveAsTable(full)
            )
    li = spark.table(f"{db}.lineitem_b")
    o = spark.table(f"{db}.orders_b")
    # MERGE hint: at test SF the build side fits the broadcast threshold and
    # Catalyst would pick BHJ, hiding the point of the exercise — force the
    # sort-merge path, which with bucketed+sorted tables needs neither an
    # Exchange nor a Sort (at 100 TB SMJ is what you'd get anyway)
    joined = li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
    return joined.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        dsum("l_extendedprice").alias("sum_price"),
        F.any_value("o_totalprice").alias("o_totalprice"),
    )


@query(
    "join_null_safe",
    oracle="""
WITH a AS (SELECT event_id, nullif(event_type, 'click') AS k FROM events
           WHERE event_id % 2 = 0),
     b AS (SELECT event_id, nullif(event_type, 'click') AS k FROM events
           WHERE event_id % 2 = 1)
SELECT a.k AS k, count(*) AS pair_cnt
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — required when the join key is an
    optional attribute and 'both missing' means 'same'. ('click' is mapped
    to NULL here to exercise it.) Crucially <=> is still a HASH join key in
    Spark (EqualNullSafe is sargable for hashing — NULL hashes to a
    bucket), NOT a nested loop. At scale a hot NULL bucket is a skew key
    like any other — AQE skew split handles it.

    The pair COUNT is computed by pre-aggregating each side per key and
    multiplying — the textbook many-to-many join-count rewrite. The key
    here is low-cardinality (a handful of event types), so the naive
    join-then-count materializes |a_k|x|b_k| rows per key before throwing
    them away: measured 27 s at sf0.1 (~1.7e9 joined rows) and pure
    scale-death at 100 TB; the pre-aggregated form moves ONE row per key
    through the null-safe join and is corpus-linear. The round-13
    registry sweep caught this — the op sat outside every bench set."""
    e = load(spark, sf_dir, "events")
    k = F.nullif("event_type", F.lit("click")).alias("k")
    a_cnt = (
        e.filter(F.col("event_id") % 2 == 0).select(k)
        .groupBy("k").agg(F.count("*").alias("cnt_a")).alias("a")
    )
    b_cnt = (
        e.filter(F.col("event_id") % 2 == 1).select(k)
        .groupBy("k").agg(F.count("*").alias("cnt_b")).alias("b")
    )
    return (
        a_cnt.join(b_cnt, F.col("a.k").eqNullSafe(F.col("b.k")))
        .select(
            F.col("a.k").alias("k"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("pair_cnt"),
        )
    )


ASOF_TOL = "7 days"  # max staleness a match may carry


@query(
    "join_asof_tolerance",
    oracle="""
WITH purchases AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
     signups   AS (SELECT user_id, ts FROM events
                   WHERE event_type = 'signup')
SELECT p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CASE WHEN s.ts IS NOT NULL
              AND p.ts <= s.ts + INTERVAL 7 DAY
            THEN strftime(s.ts, '%Y-%m-%d %H:%M:%S') END AS signup_ts
FROM purchases p
ASOF LEFT JOIN signups s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with BOUNDED STALENESS, left semantics: every purchase
    row survives; its matched signup timestamp is kept only when the
    signup happened within the preceding 7 days, else NULL (pd.merge_asof
    `tolerance=` semantics — a stale match is usually worse than no
    match). Same union + running-last() single-shuffle plan as join_asof,
    minus the matched-only filter, plus the tolerance null-out; the
    tolerance test is exact timestamp-interval arithmetic on both
    engines. The oracle keeps DuckDB's ASOF LEFT JOIN native and applies
    the identical tolerance as a CASE over the matched value."""
    e = load(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.lit(1).alias("is_signup"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_signup")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_signup").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = signups.unionAll(purchases).withColumn(
        "signup_ts",
        F.last(
            F.when(F.col("is_signup") == 1, F.col("ts")), ignorenulls=True
        ).over(w),
    )
    in_tol = F.col("signup_ts").isNotNull() & (
        F.col("ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {ASOF_TOL}")
    )
    return carried.filter(F.col("is_signup") == 0).select(
        "event_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.when(in_tol, F.date_format("signup_ts", _TS_FMT)).alias(
            "signup_ts"
        ),
    )


# Runtime bloom-filter injection confs for join_bloom_filtered. The scan-size
# threshold is 0 ONLY because the fixture is megabytes: Spark's default
# requires a 10 GB+ probe-side scan before it bothers building the filter —
# i.e., at the 100 TB posture the feature engages with NO conf changes and
# this override exists purely so the sandbox exercises the same plan.
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _bloom_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazily-planned join join_bloom_filtered executes (shared with the
    plan test, which asserts might_contain under _BLOOM_CONFS)."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "join_bloom_filtered",
    oracle=f"""
SELECT o.o_orderpriority, l.l_returnflag,
       count(*) AS cnt,
       {dsum_sql('l.l_extendedprice')} AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1, 2
""",
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join — the scan-side pre-filter that makes
    selective big-big joins affordable at 100 TB: Catalyst builds a bloom
    filter over the SELECTIVE side's join keys (urgent orders) and injects
    `might_contain` into the probe side's scan, so ~80% of lineitem rows
    drop BEFORE the shuffle instead of after the join. Semantically
    invisible (bloom false positives only let extra rows reach the join,
    which discards them), so the oracle is the plain join — the hash match
    proves the filtered plan changes nothing.

    Eager by necessity: the injection is session-conf-driven and the
    confs must not leak into other operators sharing the driver's session,
    so the op applies them, materializes the (priority × returnflag)
    aggregate — bounded rows — and restores every conf in a finally.
    The broadcast threshold is disabled while it runs because bloom
    filters only attach to shuffle joins (a broadcast join IS already a
    probe-side filter); at real scale the filtered dim exceeds the
    broadcast threshold on its own. tests/test_maintenance.py pins both
    the `might_contain` injection and the conf restoration."""
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        j = _bloom_query(spark, sf_dir)
        # bounded collect: j is the per-priority aggregate (<= 5 rows) —
        # materialized so the conf restoration below cannot re-plan it
        return spark.createDataFrame(j.collect(), j.schema)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
