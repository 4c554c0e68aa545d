"""Table-maintenance operators — the jobs that keep a 100 TB lakehouse
healthy: CDC MERGE (upsert/delete application) and small-file compaction.

Neither exists in the reference engine (mapreduce.erl has a single
write-results-to-one-file sink, mapreduce.erl:204-210); these extend the
declared surface the same way the curation ops do (SURVEY.md §2.B.2). Both
reduce to counts, passthrough values and decimal sums, so their oracles are
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exact import dsum, dsum_sql
from ..registry import query
from ..tables import load


@query(
    "merge_upsert",
    oracle="""
WITH changes AS (
    -- deterministic CDC batch derived from the dim itself:
    -- key%7==0 -> delete, else key%3==0 -> update (acctbal += 100),
    -- and key%5==0 spawns an insert under key+100000
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal + 100.0 AS s_acctbal,
           CASE WHEN s_suppkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
    FROM supplier WHERE s_suppkey % 7 = 0 OR s_suppkey % 3 = 0
    UNION ALL
    SELECT s_suppkey + 100000, 'NEW_' || CAST(s_suppkey AS VARCHAR),
           s_nationkey, 0.0, 'I'
    FROM supplier WHERE s_suppkey % 5 = 0
),
merged AS (
    SELECT b.s_suppkey,
           coalesce(c.s_name, b.s_name) AS s_name,
           coalesce(c.s_nationkey, b.s_nationkey) AS s_nationkey,
           coalesce(c.s_acctbal, b.s_acctbal) AS s_acctbal,
           c.op
    FROM supplier b LEFT JOIN changes c
      ON b.s_suppkey = c.s_suppkey AND c.op IN ('U', 'D')
)
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM merged WHERE op IS NULL OR op = 'U'
UNION ALL
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM changes WHERE op = 'I'
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the lakehouse CDC apply step): a change batch
    of upserts/deletes/inserts lands on a base table — matched-update,
    matched-delete, not-matched-insert, untouched rows pass through. The
    batch is derived deterministically from the dim itself (key%7 deletes,
    key%3 updates, key%5 spawns inserts under a shifted key) so the oracle
    can rebuild it exactly.

    Physical shape: the change batch is ALWAYS small relative to the base
    (that is what makes it a "batch"), so the matched-side apply is a
    base LEFT JOIN broadcast(changes) — the base streams through untouched,
    no shuffle of the 100 TB side — and inserts append via union. This is
    exactly how Delta/Iceberg MERGE executes its find-touched-files pass;
    a full-outer formulation would shuffle the whole base instead. Deletes
    filter AFTER the join (op='D' rows drop), updates overwrite via
    coalesce. At real scale the remaining delta is file-level rewrite
    granularity, which is a storage-format concern, not a plan concern.
    Values are passthrough or +constant — no aggregation, no float-order
    surface."""
    base = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    matched = base.filter((k % 7 == 0) | (k % 3 == 0)).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        (F.col("s_acctbal") + F.lit(100.0)).alias("s_acctbal"),
        F.when(k % 7 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    inserts = base.filter(k % 5 == 0).select(
        (k + 100000).alias("s_suppkey"),
        F.concat(F.lit("NEW_"), k.cast("string")).alias("s_name"),
        "s_nationkey",
        F.lit(0.0).alias("s_acctbal"),
        F.lit("I").alias("op"),
    )
    c = F.broadcast(matched).alias("c")
    b = base.alias("b")
    merged = b.join(c, F.col("b.s_suppkey") == F.col("c.s_suppkey"), "left")
    applied = merged.filter(
        F.col("c.op").isNull() | (F.col("c.op") == "U")
    ).select(
        F.col("b.s_suppkey").alias("s_suppkey"),
        F.coalesce("c.s_name", "b.s_name").alias("s_name"),
        F.coalesce("c.s_nationkey", "b.s_nationkey").alias("s_nationkey"),
        F.coalesce("c.s_acctbal", "b.s_acctbal").alias("s_acctbal"),
    )
    return applied.unionAll(inserts.drop("op"))


# Compaction target: roll writer files after this many records. At 100 TB
# the analog is a byte target (128-256 MiB per file); records are the
# deterministic stand-in the oracle can reproduce with integer arithmetic.
COMPACT_ROWS_PER_FILE = 8192


@query(
    "compact_small_files",
    oracle=f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST((count(*) + {COMPACT_ROWS_PER_FILE - 1})
            // {COMPACT_ROWS_PER_FILE} AS BIGINT) AS n_files,
       {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the OPTIMIZE job every partitioned 100 TB
    sink needs: a fragmented hive-layout table (here: lineitem written
    through a 16-way round-robin repartition, so every task sprays a
    sliver-file into every partition dir — the classic way small files are
    born) is rewritten so each partition holds ceil(rows/8192) right-sized
    files.

    The compaction clusters rows into EXACT 8192-row file groups while
    keeping every writer core busy — `repartition(partition_col)` alone
    would funnel each partition value into ONE task (3 values ⇒ 3 live
    cores; measured 5 s of the 6.8 s total at the 10× probe scale):

    1. a counting pass records exact rows per (partition value, input
       split) — `spark_partition_id()` is stable across the two jobs
       because both plans scan the same parquet splits with no prior
       exchange; the count scan prunes to one column;
    2. a window prefix-sum over that SMALL table (rows = values × splits)
       turns counts into per-split starting offsets, broadcast-joined
       back so the offset lookup stays in the scan stage;
    3. `row_number` over (value, split) — parallelism values × splits,
       never one-task-per-value — plus the offset gives each row an exact
       per-value ordinal, whose div-8192 is its file-group id;
    4. the write shuffle keys on (value, group id): groups land whole in
       whichever task hashes them, and since every group is exactly 8192
       rows (one remainder per value), `maxRecordsPerFile` rolls the
       writer at group boundaries no matter how groups share tasks —
       total files per value is EXACTLY ceil(n/8192) while ~all cores
       write.

    The returned accounting is (rows, ACTUAL on-disk file count, decimal
    content sum) per partition, and the oracle recomputes the file count
    as ceil(n/8192) with integer arithmetic — the hash matches iff the
    rewrite produced exactly the predicted layout with no row lost. At
    100 TB the counts table is #values × #splits rows — broadcast-sized
    for date-partitioned tables (1e3 values × 1e5 splits only if every
    split holds every value, which partition-dir locality prevents); the
    trigger in production is a file-listing pass filtering dirs whose
    mean file size is under target — the rewrite plan is unchanged."""
    import os
    import shutil

    from ..sources.scans import SINK_ROOT

    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag",
    )
    app_root = os.path.join(SINK_ROOT, spark.sparkContext.applicationId)
    base = os.path.join(
        app_root, os.path.basename(os.path.normpath(sf_dir)), "compact"
    )
    frag, tidy = os.path.join(base, "frag"), os.path.join(base, "tidy")
    try:
        # 1. the "before" state: a fragmented sink (every round-robin task
        # writes one sliver per partition value it holds). Written snappy
        # (r16, guide §6): this table is the op's OWN synthetic fixture —
        # production compacts a table some upstream writer produced, and
        # snappy is the common upstream default — while the compacted
        # output below keeps the session's production codec (zstd). The
        # fixture is written once and read twice (count pass + rewrite),
        # so the cheaper codec pays three times; measured ~0.5 s of the
        # 3.9 s cell at sf0.1, file counts and sums unchanged.
        from ..session import scoped_conf

        with scoped_conf(
            spark, {"spark.sql.parquet.compression.codec": "snappy"}
        ):
            src.repartition(16).write.mode("overwrite").partitionBy(
                "l_returnflag"
            ).parquet(frag)
        # 2. compaction: exact 8192-row file groups, parallel writers
        # (docstring steps 1-4). _pv is a null-safe surrogate of the
        # partition value — groupBy/join/repartition all treat NULL keys
        # differently (join would DROP null-partition rows); the hive
        # writer still partitions on the real column. (writer's schema on
        # read-back: an empty source writes no data files and inference
        # would fail — see pipeline_dataset_export)
        from pyspark.sql import Window

        back_schema = src.schema
        frag_df = (
            spark.read.schema(back_schema)
            .parquet(frag)
            .withColumn(
                "_pv", F.coalesce("l_returnflag", F.lit("\x00null"))
            )
            .withColumn("_pid", F.spark_partition_id())
        )
        cnts = frag_df.groupBy("_pv", "_pid").agg(F.count("*").alias("_n"))
        woff = (
            Window.partitionBy("_pv")
            .orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = cnts.select(
            "_pv",
            "_pid",
            F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
        )
        wrn = Window.partitionBy("_pv", "_pid").orderBy(
            F.monotonically_increasing_id()
        )
        (
            frag_df.join(F.broadcast(offs), ["_pv", "_pid"])
            .withColumn(
                "_fidx",
                F.floor(
                    (F.col("_off") + F.row_number().over(wrn) - 1)
                    / COMPACT_ROWS_PER_FILE
                ),
            )
            .repartition("_pv", "_fidx")
            .drop("_pv", "_pid", "_off", "_fidx")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", COMPACT_ROWS_PER_FILE)
            .partitionBy("l_returnflag")
            .parquet(tidy)
        )
        # 3. account against the compacted sink: rows + decimal content sum
        # from the data, file counts from the filesystem
        tidy_df = spark.read.schema(back_schema).parquet(tidy)
        acct = tidy_df.groupBy("l_returnflag").agg(
            F.count("*").alias("n_rows"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        counts: dict[str | None, int] = {}
        if os.path.isdir(tidy):
            for d in os.listdir(tidy):
                p = os.path.join(tidy, d)
                if d.startswith("l_returnflag=") and os.path.isdir(p):
                    # NULL partition values are written to the hive default
                    # dir; the read-back aggregate keys them as None — map
                    # the dir name back so counts.get finds them
                    val = d.split("=", 1)[1]
                    key = None if val == "__HIVE_DEFAULT_PARTITION__" else val
                    counts[key] = sum(
                        1 for f_ in os.listdir(p) if f_.endswith(".parquet")
                    )
        rows = [
            (r["l_returnflag"], r["n_rows"], counts.get(r["l_returnflag"], 0),
             r["sum_price"])
            for r in acct.collect()
        ]
        return spark.createDataFrame(
            rows,
            "l_returnflag string, n_rows bigint, n_files bigint, "
            "sum_price double",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        for d_ in (os.path.dirname(base), app_root):
            try:
                os.rmdir(d_)
            except OSError:
                pass


ZORDER_BITS = 16  # per-dimension bits interleaved into a 32-bit z-value
# dropping the low 10 z-bits (5 per dimension) makes every bucket a
# ≤ 32×32 box in (part, supp) space — the provable locality bound the
# layout test pins
ZBUCKET_SHIFT = 10


def _z_interleave_sql(x: str, y: str) -> str:
    """Bit-interleave SQL identical in Spark and DuckDB: x's bit i lands at
    z-bit 2i, y's at 2i+1 — pure shift/and/sum integer arithmetic."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "sort_zorder_layout",
    oracle=f"""
WITH z AS (
    SELECT l_partkey, l_suppkey,
           ({_z_interleave_sql('l_partkey', 'l_suppkey')}) >> {ZBUCKET_SHIFT}
               AS zbucket
    FROM lineitem
)
SELECT zbucket, count(*) AS n_rows,
       min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
       min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
FROM z GROUP BY zbucket
""",
)
def sort_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout accounting — the multi-dimensional
    clustering behind OPTIMIZE ZORDER BY: interleaving the bits of
    (l_partkey, l_suppkey) gives a single sort key whose contiguous
    ranges cover SMALL rectangles in BOTH dimensions, so files written in
    z-order carry tight min/max footer stats on both columns and a
    predicate on EITHER column skips most files — impossible for a
    lexicographic sort, which clusters only its leading column. The op
    emits each z-bucket's row count and per-dimension bounding box; the
    locality property (every bucket's box is a tiny fraction of the full
    domain) is pinned in tests/test_maintenance.py.

    Everything is shift/and/add integer arithmetic generated from ONE
    formula string shared verbatim by the Spark projection and the DuckDB
    oracle — no float surface at all. Plan: narrow projection + one hash
    agg. At 100 TB the same z-value feeds repartitionByRange + sortWithin
    Partitions before the write (file-boundary placement is then
    sampling-dependent, which is why the op accounts buckets, not files —
    the skipping math per bucket is identical)."""
    z = F.expr(_z_interleave_sql("l_partkey", "l_suppkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.shiftright(z.cast("long"), ZBUCKET_SHIFT).alias("zbucket"),
    )
    return li.groupBy("zbucket").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("part_lo"),
        F.max("l_partkey").alias("part_hi"),
        F.min("l_suppkey").alias("supp_lo"),
        F.max("l_suppkey").alias("supp_hi"),
    )


@query(
    "snapshot_time_travel",
    oracle="""
WITH changes AS (
    SELECT s_suppkey, s_acctbal + 100.0 AS s_acctbal,
           CASE WHEN s_suppkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
    FROM supplier WHERE s_suppkey % 7 = 0 OR s_suppkey % 3 = 0
    UNION ALL
    SELECT s_suppkey + 100000, 0.0, 'I'
    FROM supplier WHERE s_suppkey % 5 = 0
),
v1 AS (
    SELECT b.s_suppkey,
           coalesce(c.s_acctbal, b.s_acctbal) AS s_acctbal
    FROM supplier b LEFT JOIN changes c
      ON b.s_suppkey = c.s_suppkey AND c.op IN ('U', 'D')
    WHERE c.op IS NULL OR c.op = 'U'
    UNION ALL
    SELECT s_suppkey, s_acctbal FROM changes WHERE op = 'I'
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(SUM(CAST((s_acctbal) AS DECIMAL(29,6))) AS DOUBLE) AS sum_bal
FROM supplier
UNION ALL
SELECT 1, count(*),
       CAST(SUM(CAST((s_acctbal) AS DECIMAL(29,6))) AS DOUBLE)
FROM v1
""",
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel — the versioned-table read every lakehouse
    format sells as `AS OF`: version 0 (the supplier dim as loaded) and
    version 1 (after the merge_upsert CDC batch) coexist as immutable
    snapshot dirs, and BOTH stay queryable after the merge — the report
    aggregates each version independently and must match the source-side
    reconstruction of both states. Old versions being readable (not
    overwritten) is precisely what distinguishes this from an in-place
    UPDATE, and is the mechanism behind reproducible training-data
    snapshots: a dataset release pins a version id, later merges don't
    move it.

    Implementation is the roll-your-own version layer the foreachBatch
    upsert op also uses: one immutable dir per version plus a
    deterministic version id; a real deployment swaps the dir convention
    for Delta/Iceberg's transaction log (which adds atomic commit +
    file-level pruning) without changing the read semantics. Scratch
    snapshots are deleted after the bounded accounting collect."""
    import os
    import shutil
    import time

    from ..exact import _DEC
    from ..sources.scans import SINK_ROOT

    base = os.path.join(
        SINK_ROOT,
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-tt-{time.time_ns()}",
    )
    v0_df = load(spark, sf_dir, "supplier")
    v1_df = merge_upsert(spark, sf_dir)
    try:
        paths = {}
        for ver, df in ((0, v0_df), (1, v1_df)):
            p = os.path.join(base, f"v{ver}")
            df.write.mode("overwrite").parquet(p)
            paths[ver] = p
        reports = []
        for ver, p in paths.items():
            back = spark.read.schema(v0_df.schema).parquet(p)
            reports.append(
                back.agg(
                    F.count("*").alias("n_rows"),
                    F.sum(F.col("s_acctbal").cast(_DEC))
                    .cast("double")
                    .alias("sum_bal"),
                ).select(
                    F.lit(ver).alias("version"), "n_rows", "sum_bal"
                )
            )
        out = reports[0].unionAll(reports[1])
        # bounded collect: one accounting row per snapshot version (2) —
        # materialized because the snapshot dir is deleted in the finally
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        try:
            os.rmdir(os.path.dirname(base))
        except OSError:
            pass


# dq_expectations thresholds: (check_name, threshold). Metrics are defined
# so that PASS means metric >= threshold — one comparison direction keeps
# the report uniform.
DQ_CHECKS = (
    ("orders_orderkey_unique", 1.0),       # distinct/count
    ("lineitem_ref_integrity", 1.0),       # matched/count (FK → orders)
    ("customer_acctbal_nonnull", 0.9),     # non-null fraction
    ("events_value_in_range", 0.9),        # fraction in [-1000, 10000]
    ("documents_text_nonempty", 0.9),      # non-null AND non-empty fraction
)


@query(
    "dq_expectations",
    oracle=f"""
SELECT 'orders_orderkey_unique' AS check_name,
       round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
             / nullif(count(*), 0), 6) AS metric,
       CAST({DQ_CHECKS[0][1]} AS DOUBLE) AS threshold,
       coalesce(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                / nullif(count(*), 0) >= {DQ_CHECKS[0][1]}, TRUE) AS pass
FROM orders
UNION ALL
SELECT 'lineitem_ref_integrity',
       round(CAST(count(o.o_orderkey) AS DOUBLE) / nullif(count(*), 0), 6),
       CAST({DQ_CHECKS[1][1]} AS DOUBLE),
       coalesce(CAST(count(o.o_orderkey) AS DOUBLE) / nullif(count(*), 0)
                >= {DQ_CHECKS[1][1]}, TRUE)
FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
  ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'customer_acctbal_nonnull',
       round(CAST(count(c_acctbal) AS DOUBLE) / nullif(count(*), 0), 6),
       CAST({DQ_CHECKS[2][1]} AS DOUBLE),
       coalesce(CAST(count(c_acctbal) AS DOUBLE) / nullif(count(*), 0)
                >= {DQ_CHECKS[2][1]}, TRUE)
FROM customer
UNION ALL
SELECT 'events_value_in_range',
       round(CAST(count(CASE WHEN value >= -1000 AND value <= 10000
                             THEN 1 END) AS DOUBLE)
             / nullif(count(*), 0), 6),
       CAST({DQ_CHECKS[3][1]} AS DOUBLE),
       coalesce(CAST(count(CASE WHEN value >= -1000 AND value <= 10000
                                THEN 1 END) AS DOUBLE)
                / nullif(count(*), 0) >= {DQ_CHECKS[3][1]}, TRUE)
FROM events
UNION ALL
SELECT 'documents_text_nonempty',
       round(CAST(count(CASE WHEN text IS NOT NULL AND length(text) > 0
                             THEN 1 END) AS DOUBLE)
             / nullif(count(*), 0), 6),
       CAST({DQ_CHECKS[4][1]} AS DOUBLE),
       coalesce(CAST(count(CASE WHEN text IS NOT NULL AND length(text) > 0
                                THEN 1 END) AS DOUBLE)
                / nullif(count(*), 0) >= {DQ_CHECKS[4][1]}, TRUE)
FROM documents
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations gate (the Deequ/Great-Expectations
    workload): declarative constraints — key uniqueness, referential
    integrity, non-null and in-range fractions — evaluated into one
    (check, metric, threshold, pass) report that a pipeline asserts on
    before trusting a snapshot. Complements profile_columns: that op
    DESCRIBES a table, this one JUDGES five cross-table contracts.

    Plan shape: one aggregate per checked table (each a partial/final
    pair over one scan — checks against the same table share its scan),
    and referential integrity as a LEFT join against the distinct FK
    target counting matches — at 100 TB that is one shuffle on the key
    (or a broadcast when the dimension fits), never an unbounded anti
    materialization; everything else is scan-local. Metrics are exact
    int/int divisions rounded to 6; empty tables yield NULL metric and
    vacuous pass=true on both engines (nullif/coalesce)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    e = load(spark, sf_dir, "events")
    d = load(spark, sf_dir, "documents")

    def report(name: str, thr: float, num, den) -> DataFrame:
        frac = num.cast("double") / F.nullif(den, F.lit(0))
        return F.struct(
            F.lit(name).alias("check_name"),
            F.round(frac, 6).alias("metric"),
            F.lit(thr).alias("threshold"),
            F.coalesce(frac >= thr, F.lit(True)).alias("pass"),
        )

    rows = [
        o.agg(
            report(
                DQ_CHECKS[0][0], DQ_CHECKS[0][1],
                F.count_distinct("o_orderkey"), F.count("*"),
            ).alias("r")
        ),
        li.join(
            o.select("o_orderkey").distinct(),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        ).agg(
            report(
                DQ_CHECKS[1][0], DQ_CHECKS[1][1],
                F.count("o_orderkey"), F.count("*"),
            ).alias("r")
        ),
        c.agg(
            report(
                DQ_CHECKS[2][0], DQ_CHECKS[2][1],
                F.count("c_acctbal"), F.count("*"),
            ).alias("r")
        ),
        e.agg(
            report(
                DQ_CHECKS[3][0], DQ_CHECKS[3][1],
                F.count(
                    F.when(
                        (F.col("value") >= -1000) & (F.col("value") <= 10000),
                        1,
                    )
                ),
                F.count("*"),
            ).alias("r")
        ),
        d.agg(
            report(
                DQ_CHECKS[4][0], DQ_CHECKS[4][1],
                F.count(
                    F.when(
                        F.col("text").isNotNull() & (F.length("text") > 0), 1
                    )
                ),
                F.count("*"),
            ).alias("r")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.select("r.*")
