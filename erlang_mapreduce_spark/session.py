"""SparkSession factory tuned for the engine.

The reference hard-codes its "cluster config" (26 mappers / 26 reducers,
random placement — mapreduce.erl:85-93, :149-155). We instead centralize a
session factory whose defaults are chosen for scale-out behavior:

- AQE on (runtime coalescing, skew-join splitting, join-strategy switch) —
  the antidote to the reference's fixed 26-way first-letter partitioning,
  which is a skew object lesson (SURVEY.md §4.3).
- shuffle.partitions sized by env (local test default 32 = driver local[32];
  on a real cluster this is overridden or left to AQE's coalescing).
- UTC session timezone so timestamp semantics are stable across engines.
- Arrow enabled for any pandas-UDF path (the only sanctioned Python hot path).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's partition coalescing is BYTE-based, but the text/gram/sketch
    # ops are CPU-heavy per byte: a 5k-doc fixture shuffle is ~1 MB, which
    # default coalescing (minPartitionSize=1m) folds into ONE partition —
    # serializing interpreted gram builds and Arrow UDF signature math on
    # a single core (measured: dedup_minhash's whole post-rep pipeline ran
    # 1-task). A 32k floor keeps ~20-30 tasks on fixture-sized shuffles
    # while being invisible at scale, where every partition is megabytes.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "32k",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # local-test sizing; a 1000-executor deployment overrides via spark-submit
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.parquet.compression.codec": "zstd",
    # driver fixtures carry TIMESTAMP(NANOS) (events.ts); read as long nanos
    # and convert in tables.load (Spark has no ns timestamp type)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # stage-progress bars are console noise here (no interactive user) and
    # they flood the driver's ~2,000-char bench-stdout capture — BENCH_r03
    # lost its official JSON line to exactly that overflow
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.extraJavaOptions": "-Dlog4j2.level=error",
}


@contextmanager
def scoped_conf(spark: SparkSession, confs: dict[str, str]):
    """Set runtime SQL confs for the duration of a block, restoring the
    caller's values (or unsetting keys the session never had) on exit.

    Only affects executions that START inside the block — Spark snapshots
    the session conf when a query begins, so this is useful exactly for
    operators that materialize EAGERLY inside their own body (an action,
    a write, a localCheckpoint). A lazily returned plan executes later
    under whatever conf is live then; scoping it here would be a silent
    no-op, which is why graph_pagerank checkpoints its (tiny) result
    inside the scope instead of returning the raw lazy plan.

    Single-threaded-session assumption: the override mutates the
    SESSION-GLOBAL runtime conf, so a query launched concurrently from
    another thread of the same session during the block would snapshot
    (and silently run under) the scoped values. The engine's contract is
    one driving thread per session (bench, driver, and tests all comply);
    concurrent drivers should use separate sessions
    (``SparkSession.newSession()`` shares the context but not the conf).

    Motivation (round-6 regression): the session-wide AQE
    coalescePartitions.minPartitionSize=32k floor keeps CPU-heavy gram
    shuffles from collapsing to one task, but it also pinned
    graph_pagerank's ~8 tiny exchanges at ~32 near-empty tasks each
    (measured 2.49 s → 4.75 s at sf0.1) and multiplied
    pipeline_dataset_export's shard-file count. Those byte-light ops scope
    the floor back to Spark's default here rather than dragging the whole
    session's tuning with them."""
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        # get(k) with no default falls back to Spark's BUILT-IN default
        # for known keys (it raises only for unknown ones), which would
        # make exit pin that default explicitly instead of unsetting —
        # masking any later session-level retuning. get(k, None) returns
        # None exactly when the session never set the key.
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            try:
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
            except Exception:
                pass


def get_spark(app_name: str = "erlang-mapreduce-spark") -> SparkSession:
    """Build (or fetch) the session. Idempotent: returns the active session
    if one exists (configs are builder-level, so they only apply on first
    creation — tests and the driver both rely on this)."""
    builder = SparkSession.builder.appName(app_name)
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None and not os.environ.get("SPARK_MASTER_URL"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if master and master.startswith("local"):
        # local mode runs all 32 executor threads inside the DRIVER JVM,
        # whose default heap is 1g — at 10× the bench volume that thrashes
        # the GC (observed: GCLocker retry storms in the scaling probe).
        # Size it from the HOST (a quarter of physical RAM, capped at
        # 16g) — a hardcoded 16g would invite the OS OOM-killer on small
        # machines. On a real cluster the resource manager sets executor
        # memory and this branch never fires.
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
        if mem is None:
            try:
                ram_gb = (
                    os.sysconf("SC_PAGE_SIZE")
                    * os.sysconf("SC_PHYS_PAGES")
                ) // (1 << 30)
                mem = f"{max(1, min(16, ram_gb // 4))}g"
            except (ValueError, OSError):
                mem = "4g"
        builder = builder.config("spark.driver.memory", mem)
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
