"""True Structured Streaming operators (SURVEY.md §2.B: stream_watermark_late,
stream_stateful_dedup) — incremental execution with state, watermarks and
late-data handling, driven by a deterministic file-replay source.

The batch-checkable window semantics live in windows.py; these two ops are
about what ONLY the incremental engine does: advancing an event-time
watermark across micro-batches, dropping late rows, and evicting state.
They are rows-only for the driver (DuckDB has no streaming semantics);
tests/test_streaming.py pins their behavior (late rows dropped, duplicates
suppressed) against exact expectations.

Replay source: `events` is materialized once per sf into time-ordered
parquet chunks; readStream(maxFilesPerTrigger=1) turns each chunk into one
micro-batch, so the watermark advances chunk by chunk — deterministically,
because chunk boundaries are fixed quantiles of ts.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import shutil
import time
import uuid

import duckdb
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load

CHUNK_ROOT = "/tmp/spark_graft_stream_chunks"

# Per-micro-batch progress of the most recent replay, for the fixed-cost
# probe (tools/stream_cost_probe.py, r14 VERDICT task 7): recentProgress
# is a bounded local list the query keeps anyway — capturing it after
# awaitTermination costs nothing and changes no behavior. Keyed "__last__"
# (the probe runs ops one at a time) — not a public API.
LAST_PROGRESS: dict[str, list] = {}


def _record_progress(q) -> None:
    import json as _json

    try:
        LAST_PROGRESS["__last__"] = [
            p if isinstance(p, dict) else _json.loads(p.json)
            for p in (q.recentProgress or [])
            if p is not None
        ]
    except Exception:  # diagnostics only — never fail the query path
        LAST_PROGRESS["__last__"] = []
# Grace window before a superseded fingerprint's chunk dir is reclaimed:
# long enough for an in-flight replay (chunks replay in seconds) to drain,
# short enough that a rewritten-corpus leak is bounded to one window.
_PRUNE_GRACE_S = 600.0


def _chunk_ns(sf_dir: str, table: str) -> str:
    """Namespace (two nested path components) for the on-disk chunk cache:
    ``<leaf>-<md5(abspath, table)> / <md5(stat-fingerprint)>`` — the same
    discriminator scheme as ``dedup._shared_materialize``, with the
    fingerprint DELEGATED to ``dedup._corpus_fingerprint`` so a future
    tightening of the fingerprint (its known size+mtime limit) reaches
    this cache too. Keying by basename alone aliased two corpora sharing
    a leaf name, and a corpus regenerated in place kept serving the STALE
    chunks behind its .done sentinel (round-8 ADVICE).

    Superseded fingerprint dirs are PRUNED on entry: a corpus rewritten
    in place mints a new fingerprint every time, and without the sweep
    each rewrite leaked a full chunk set under CHUNK_ROOT for the
    machine's uptime. The sweep runs INSIDE the (abspath, table) group
    dir — distinct corpus paths occupy distinct groups whatever their
    leaf names (the digest, not the human-readable leaf prefix, is the
    key), so one corpus can never evict another's live cache; the only
    deletable state is an older fingerprint of the SAME path, which a
    concurrent reader could be replaying only if the corpus was rewritten
    mid-run — already undefined for that reader. The sweep is AGE-GATED,
    and the clock starts at SUPERSESSION, not at the dir's last write
    (round-11 ADVICE: gating on st_mtime alone deleted any dir built more
    than _PRUNE_GRACE_S ago the instant the corpus was rewritten — the
    grace only protected young dirs, and the round-9 FileNotFound race
    survived for old ones): the first sweep that sights a stale
    fingerprint dir drops a ``.superseded`` marker in it and skips; only
    a later sweep finding the marker older than _PRUNE_GRACE_S rmtrees.
    Every superseded dir therefore gets one full grace window measured
    from when it was first seen superseded, letting an in-flight replay
    drain, while in-place rewrites still reclaim space on the next entry
    after the window."""
    from ..operators.dedup import _corpus_fingerprint

    fp = _corpus_fingerprint(sf_dir, table)
    gdisc = hashlib.md5(
        repr((os.path.abspath(sf_dir), table)).encode()
    ).hexdigest()[:12]
    group = f"{os.path.basename(os.path.normpath(sf_dir))}-{gdisc}"
    if fp is None:
        # missing/unreadable table: UNCACHEABLE — a per-call namespace,
        # never pruned-into, never sentinel-reused, so every error state
        # stays distinct and a table that appears later cannot inherit a
        # None-keyed chunk set (round-9 ADVICE). The build under it either
        # fails loudly on the absent parquet or serves this call only.
        return os.path.join(group, f"uncached-{uuid.uuid4().hex[:12]}")
    fdisc = hashlib.md5(repr(fp).encode()).hexdigest()[:12]
    gdir = os.path.join(CHUNK_ROOT, group)
    now = time.time()
    try:
        for stale in os.listdir(gdir):
            if stale == fdisc:
                continue
            p = os.path.join(gdir, stale)
            if not os.path.isdir(p):
                # plain-file leftover (e.g. a partially-failed rmtree): the
                # marker protocol can never reclaim it — os.stat(marker)
                # raises NotADirectoryError forever (round-12 ADVICE item
                # 5). Age-gate on the file's own mtime, then unlink.
                try:
                    if now - os.stat(p).st_mtime > _PRUNE_GRACE_S:
                        os.unlink(p)
                except OSError:
                    pass
                continue
            marker = os.path.join(p, ".superseded")
            try:
                if now - os.stat(marker).st_mtime > _PRUNE_GRACE_S:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                # first sighting since supersession: start the grace
                # clock NOW (never from the dir's build time) and skip
                try:
                    with open(marker, "w") as f:
                        f.write("grace clock: see _chunk_ns docstring")
                except OSError:
                    pass
    except OSError:
        pass
    return os.path.join(group, fdisc)

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _materialize_chunks(sf_dir: str, mode: str) -> str:
    """Split events into 4 time-quantile chunks (+ a 5th: replayed/late
    rows). mode='late': chunk 4 re-sends the EARLIEST quartile with shifted
    ids (arrives after the watermark has passed → must be dropped).
    mode='dup': chunk 4 re-sends chunk 3 verbatim (duplicate event_ids
    within the watermark → must be suppressed by stateful dedup).
    mode='plain': just the 4 in-order chunks — no late/duplicate rows."""
    d = os.path.join(CHUNK_ROOT, _chunk_ns(sf_dir, "events"), mode)
    sentinel = os.path.join(d, ".done")
    if os.path.exists(sentinel):
        return d
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    src = f"{sf_dir}/events.parquet"
    con.execute(
        f"""CREATE TEMP TABLE ev AS
            SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
                   value, props,
                   ntile(4) OVER (ORDER BY ts, event_id) AS q
            FROM '{src}'"""
    )
    for i in range(4):
        con.execute(
            f"""COPY (SELECT event_id, ts, user_id, event_type, value, props
                      FROM ev WHERE q = {i + 1} ORDER BY ts, event_id)
                TO '{d}/chunk_{i}.parquet' (FORMAT PARQUET)"""
        )
    if mode == "late":
        con.execute(
            f"""COPY (SELECT event_id + 10000000 AS event_id, ts, user_id,
                             event_type, value, props
                      FROM ev WHERE q = 1 ORDER BY ts, event_id)
                TO '{d}/chunk_4.parquet' (FORMAT PARQUET)"""
        )
    elif mode == "dup":
        con.execute(
            f"""COPY (SELECT event_id, ts, user_id, event_type, value, props
                      FROM ev WHERE q = 4 ORDER BY ts, event_id)
                TO '{d}/chunk_4.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    n_chunks = 4 if mode == "plain" else 5
    # strictly increasing mtimes so the file source replays in chunk order
    base = time.time() - 100
    for i in range(n_chunks):
        os.utime(os.path.join(d, f"chunk_{i}.parquet"), (base + i, base + i))
    with open(sentinel, "w") as f:
        f.write("ok")
    return d


# State-store partition count pinned for every replay query in this
# module. A stateful streaming query's shuffle partition count is captured
# into its checkpoint at the first micro-batch and becomes the state-store
# layout: one store per partition PER STATEFUL OPERATOR, each snapshotted
# to the checkpoint every batch. It must therefore be sized to expected
# STATE volume (keys held), not to the session's batch shuffle width — the
# replay corpora hold at most a few thousand distinct keys, and inheriting
# the 32-wide batch default cost 32 near-empty store checkpoints per
# operator per micro-batch (measured: stream_stream_join 20.2 s → 4.3 s at
# sf0.1 from this setting alone; it runs TWO stateful sides × N batches).
# Production makes the same explicit first-run choice, sized to
# keys/executors; the semantics are partition-count-independent (every op
# here is hash-checked against its oracle at any width).
STREAM_STATE_PARTITIONS = 8


@contextlib.contextmanager
def _state_sized_shuffle(spark: SparkSession):
    """Pin spark.sql.shuffle.partitions to STREAM_STATE_PARTITIONS for the
    duration of a replay (set before .start(), held through
    awaitTermination — micro-batches plan while the query drains), then
    restore the session value."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_stream(
    spark: SparkSession, src_dir: str, transform, sink_name: str, output_mode: str
) -> DataFrame:
    """availableNow + one-file-per-trigger replay into a memory sink."""
    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    ckpt = f"/tmp/spark_graft_ckpt/{sink_name}-{time.time_ns()}"
    with _state_sized_shuffle(spark):
        q = (
            transform(stream)
            .writeStream.trigger(availableNow=True)
            .format("memory")
            .queryName(sink_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    _record_progress(q)
    # the memory sink holds the results; the per-run state-store dir is
    # dead weight once the query terminates — don't accumulate across runs
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink_name)


@query(
    "stream_watermark_late",
    oracle="""
WITH w AS (
    SELECT floor(epoch(ts) / 300) * 300 AS ws, count(*) AS cnt
    FROM events
    GROUP BY 1
),
m AS (SELECT epoch(max(ts)) - 1800 AS wm FROM events)
SELECT strftime(to_timestamp(w.ws), '%Y-%m-%d %H:%M:%S') AS win_start, cnt
FROM w, m
WHERE w.ws + 300 <= m.wm
""",
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling aggregation with real late-data dropping: the
    replay source sends 4 in-order chunks, then re-sends the earliest
    quartile. By then the 30-minute watermark sits near end-of-stream, so
    every replayed row is late → dropped from the aggregation state.
    Output (append mode): only windows finalized by the watermark — counts
    exclude all late rows (pinned in tests/test_streaming.py).

    SQL-oracle-checkable even though it runs incrementally, by the same
    in-order-replay argument as stream_stream_join: replayed chunks arrive
    in event-time order, so (a) no on-time row is ever late (watermark
    lags the max ts already replayed), (b) every replayed chunk-4 row IS
    late (its quartile passed 30+ min of stream ago), and (c) append mode
    emits exactly the windows whose end ≤ final watermark = max(ts) −
    30 min. The oracle is that batch aggregation with that filter; the
    equality is additionally pinned as a batch-twin test in
    tests/test_streaming.py."""
    d = _materialize_chunks(sf_dir, "late")

    def agg(stream):
        return (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "win_start"
                ),
                "cnt",
            )
        )

    sink = f"wm_late_{abs(hash(sf_dir)) % 10**8}"
    return _run_stream(spark, d, agg, sink, "append")


@query(
    "stream_stateful_dedup",
    oracle="""
SELECT event_id, user_id, event_type FROM events
""",
)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dropDuplicates: the replay source re-sends the
    final quartile verbatim (duplicate event_ids, within the watermark).
    Dedup state suppresses them; watermark bounds the state store (at
    100 TB/day the watermark IS what makes streaming dedup feasible —
    unbounded key state otherwise grows forever).

    SQL-oracle-checkable: (event_id, ts) is unique in the source (checked
    by the batch-twin test), the re-sent rows are verbatim copies arriving
    within the watermark (so state suppresses every one), and no on-time
    row is dropped (in-order replay keeps the watermark behind every
    unseen ts) — the streaming output is therefore exactly the source
    projection."""
    d = _materialize_chunks(sf_dir, "dup")

    def dedup(stream):
        return (
            stream.withWatermark("ts", "2 hours")
            .dropDuplicates(["event_id", "ts"])
            .select("event_id", "user_id", "event_type")
        )

    sink = f"dedup_{abs(hash(sf_dir)) % 10**8}"
    return _run_stream(spark, d, dedup, sink, "append")


@query(
    "stream_custom_state",
    oracle="""
WITH ev AS (
    SELECT user_id, value, ntile(4) OVER (ORDER BY ts, event_id) AS q
    FROM events
),
batches AS (
    SELECT user_id, value, q AS b FROM ev
    UNION ALL
    SELECT user_id, value, 5 AS b FROM ev WHERE q = 4
),
per AS (
    -- coalesce: the engine side is a running ACCUMULATOR starting at 0
    -- that skips NULL values, so a (user, batch) whose values are all
    -- NULL contributes 0 — plain SQL SUM would yield NULL there and the
    -- cumulative window would emit NULL for all-NULL-so-far users
    SELECT user_id, b,
           count(*) AS c,
           coalesce(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)),
                    0) AS micros
    FROM batches GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(c) OVER (PARTITION BY user_id ORDER BY b) AS BIGINT)
           AS n_events,
       sum(micros) OVER (PARTITION BY user_id ORDER BY b) / 1000000.0
           AS sum_value
FROM per
""",
)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (event count, value sum) maintained in explicit group state across
    micro-batches — the escape hatch for stateful semantics the built-in
    windowed aggregates can't express (the generalization of the
    reference's per-reducer ETS accumulation loop, mapreduce.erl:232-255,
    which is likewise keyed mutable state fed by a stream of messages).
    Update-mode emission: one row per (user, batch-where-user-appeared);
    the running counts are cumulative, so the per-user MAX equals the batch
    groupBy total (pinned in tests/test_streaming.py). State is bounded by
    the user-key cardinality; production variants add a timeout to evict
    idle keys.

    SQL-oracle-checkable: the replay chunks are DuckDB ntile(4) quantiles
    plus a verbatim re-send of the last one (_materialize_chunks), so the
    oracle reconstructs the exact (user, micro-batch) emission grid with
    the same ntile and a cumulative window. The running sum accumulates
    per-value MICRO-units as integers, not floats — float addition is
    order-sensitive across batch boundaries and the two engines would
    disagree in the last ulp; integer micros make the cumulative sum
    exact and order-free. The micro conversion is floor(v·1e6 + 0.5) on
    BOTH sides (never each engine's round(): numpy rounds half-to-even,
    DuckDB half-away-from-zero — a half-tie value would silently diverge
    by one micro), and NULL values are skipped like the float sum the
    rewrite replaced (n_events still counts their rows). The accumulator
    STARTS AT ZERO: a user whose values so far are all NULL reports
    sum_value 0.0, not NULL — the oracle coalesces its per-batch sum to
    match (found by corpus fuzz: plain SQL SUM is NULL over an all-NULL
    group)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = _materialize_chunks(sf_dir, "dup")

    def update(key, pdfs, state: GroupState):
        import numpy as np

        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].dropna().to_numpy()
            micros += int(np.floor(v * 1_000_000.0 + 0.5).astype("int64").sum())
        state.update((n, micros))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [micros / 1_000_000.0],
            }
        )

    def transform(stream):
        return stream.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value double",
            stateStructType="n long, micros long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    sink = f"custom_state_{abs(hash(sf_dir)) % 10**8}"
    return _run_stream(spark, d, transform, sink, "update")


@query(
    "stream_stream_join",
    oracle="""
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stream-stream interval join: clicks attributed to the view they
    followed within 10 minutes, per user — both sides are incremental
    streams with 30-minute watermarks, and the time-range predicate is
    what lets the state store evict buffered views once the click-side
    watermark passes view_ts + 10 min (without it, both sides buffer
    forever — THE scale constraint of streaming joins).

    This op gets a full SQL oracle even though it runs incrementally:
    with an in-order replay and an INNER join, no match can be lost —
    a click in batch k is never late (its ts ≥ everything already
    replayed), and its candidate views satisfy view_ts ≥ click_ts − 10 min
    > watermark − 10 min, which is exactly the eviction bound — so the
    availableNow result equals the batch join, row for row."""
    d = _materialize_chunks(sf_dir, "plain")

    def side(event_type: str, prefix: str):
        return (
            spark.readStream.schema(_EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
            .withWatermark(f"{prefix}_ts", "30 minutes")
        )

    views = side("view", "view")
    clicks = side("click", "click")
    joined = views.join(
        clicks,
        F.expr(
            """view_user = click_user
               AND click_ts >= view_ts
               AND click_ts <= view_ts + INTERVAL 10 MINUTES"""
        ),
    ).select(
        "view_id",
        F.col("click_id"),
        F.col("view_user").alias("user_id"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )
    sink = f"ssjoin_{abs(hash(sf_dir)) % 10**8}"
    ckpt = f"/tmp/spark_graft_ckpt/{sink}-{time.time_ns()}"
    with _state_sized_shuffle(spark):  # two stateful sides × N batches
        q = (
            joined.writeStream.trigger(availableNow=True)
            .format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    _record_progress(q)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink)


@query(
    "stream_file_sink",
    oracle="""
SELECT event_type, count(*) AS cnt,
       CAST(SUM(CAST((value) AS DECIMAL(29,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming FILE sink — the production shape the memory
    sinks above stand in for: raw events append to a parquet directory
    under a checkpointed writeStream, where the `_spark_metadata`
    transaction log is what makes the sink exactly-once (a micro-batch's
    files count only once committed; re-running after a crash replays
    from the checkpoint without double-writing). The read-back goes
    through `spark.read.parquet` on the sink dir — which consults that
    log, so only committed files are aggregated — and the per-type
    count/decimal-sum must equal the batch aggregation of the source
    (the replay is plain in-order chunks: nothing late, nothing
    duplicated). At 100 TB this is the landing-zone pattern: partitioned
    parquet + metadata log, compacted downstream.

    The scratch sink is materialized into the 5-row summary and deleted
    before returning (same bounded-collect accounting pattern as
    pipeline_dataset_export)."""
    from ..exact import _DEC

    d = _materialize_chunks(sf_dir, "plain")
    base = os.path.join(
        "/tmp/spark_graft_file_sink",
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{time.time_ns()}",
    )
    out, ckpt = os.path.join(base, "data"), os.path.join(base, "ckpt")
    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    try:
        q = (
            stream.writeStream.trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
        back = spark.read.schema(_EVENT_SCHEMA).parquet(out)
        acct = back.groupBy("event_type").agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        # bounded collect: acct is one row per event_type (O(types)); snapshotted to the driver
        # because the temp sink it reads is deleted in the finally below
        return spark.createDataFrame(acct.collect(), acct.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_UPSERT_SNAP_SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string, "
    "value double, n long"
)


def _upsert_batch_latest(df: DataFrame) -> DataFrame:
    """Per-user mergeable summary of one micro-batch: latest event by
    (ts, event_id) via max(struct) argmax, plus the event count."""
    return (
        df.groupBy("user_id")
        .agg(
            F.max(
                F.struct("ts", "event_id", "event_type", "value")
            ).alias("last"),
            F.count("*").alias("n"),
        )
        .select("user_id", "last.*", "n")
    )


def _upsert_merge_batch(
    spark: SparkSession,
    base: str,
    versions: dict[int, str],
    batch_df: DataFrame,
    batch_id: int,
) -> None:
    """One foreachBatch merge step of stream_foreachbatch_upsert —
    module-level so tests can re-invoke a committed batch (an at-least-once
    replay) directly. prev is derived from BATCH ID, never from "latest
    written": on a replay of batch N (v{N} committed, checkpoint not yet
    advanced), the previous snapshot must be the highest version < N —
    reading v{N} itself would merge batch N into its own output
    (double-counting `n`, argmax over its own result) AND overwrite the
    parquet path being read. Same device as stream_token_budget's merge."""
    delta = _upsert_batch_latest(batch_df)
    prev_ids = [b for b in versions if b < batch_id]
    if prev_ids:
        prev = spark.read.schema(_UPSERT_SNAP_SCHEMA).parquet(
            versions[max(prev_ids)]
        )
        delta = (
            prev.unionByName(delta)
            .groupBy("user_id")
            .agg(
                F.max(
                    F.struct("ts", "event_id", "event_type", "value")
                ).alias("last"),
                F.sum("n").alias("n"),
            )
            .select("user_id", "last.*", "n")
        )
    v = os.path.join(base, f"v{batch_id}")
    delta.write.mode("overwrite").parquet(v)
    versions[batch_id] = v


@query(
    "stream_foreachbatch_upsert",
    oracle="""
WITH ev AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value
    FROM events
),
rk AS (
    SELECT *,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM ev
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_type,
       value AS last_value
FROM rk WHERE rn = 1
""",
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE via foreachBatch — the incremental materialized-view
    pattern: each micro-batch is pre-aggregated (per-user latest event +
    event count: max(struct) argmax, mergeable), then upserted into a
    keyed parquet snapshot by re-aggregating snapshot ∪ batch — the
    foreachBatch escape hatch Spark prescribes for sinks with merge
    semantics (JDBC upserts, Delta MERGE). Each batch writes a NEW
    versioned snapshot dir keyed by batch id, and the merge reads its
    predecessor as the highest committed version < batch_id (never
    "latest written"): that makes the merge idempotent under
    foreachBatch's at-least-once replay (a re-run of batch k rewrites
    v{k} from the same v{<k} ∪ batch-k inputs instead of double-counting
    batch k into its own output) — the roll-your-own analog of a
    transactional sink. tests/test_streaming.py replays the last batch
    and pins snapshot equality.

    State per version is O(distinct users), not O(events) — the
    max(struct)+sum summaries are mergeable, which is exactly what lets
    the pattern absorb 100 TB of history into a bounded snapshot; at that
    scale the union-reaggregate becomes a MERGE into a bucketed/Delta
    table so each batch touches only matched files. In-order plain replay
    + inner accumulation loses nothing, so the final snapshot must equal
    the batch argmax/count over all events — the oracle. The bounded
    per-user result is materialized and the scratch snapshots deleted
    (the pipeline_dataset_export accounting pattern)."""
    d = _materialize_chunks(sf_dir, "plain")
    base = os.path.join(
        "/tmp/spark_graft_upsert",
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{time.time_ns()}",
    )
    versions: dict[int, str] = {}  # batch_id -> committed snapshot path

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _upsert_merge_batch(spark, base, versions, batch_df, batch_id)

    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    ckpt = os.path.join(base, "ckpt")
    try:
        with _state_sized_shuffle(spark):  # sizes the per-batch jobs too
            q = (
                stream.writeStream.trigger(availableNow=True)
                .foreachBatch(upsert)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
        if not versions:  # empty source: no batch ever fired
            return spark.createDataFrame(
                [],
                "user_id long, n_events long, last_ts string, "
                "last_type string, last_value double",
            )
        snap = spark.read.schema(_UPSERT_SNAP_SCHEMA).parquet(
            versions[max(versions)]
        )
        out = snap.select(
            "user_id",
            F.col("n").alias("n_events"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
        # bounded collect: out is a per-group summary (O(groups/keys), fixture <=100s of rows); snapshotted to the driver
        # because the temp sink it reads is deleted in the finally below
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


from ..operators.relational import _KMV_NUM, KMV_K  # one KMV device


@query(
    "stream_kmv_distinct",
    oracle=f"""
WITH h AS (
    SELECT DISTINCT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
    FROM events WHERE user_id IS NOT NULL
),
r AS (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS k_used,
       CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
            ELSE {_KMV_NUM!r} / CAST(max(h) AS DOUBLE) END AS est_distinct
FROM r WHERE rn <= {KMV_K} GROUP BY event_type
""",
)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-user estimation over the stream — a KMV
    sketch per event_type maintained across micro-batches via
    foreachBatch, the streaming twin of `agg_kmv_distinct`
    (relational.py): each batch folds to its k smallest distinct
    md5-hashes per group, merges with the previous snapshot (union →
    distinct → k smallest), and writes a NEW versioned snapshot keyed by
    batch id (the stream_foreachbatch_upsert idempotence device — a
    replayed batch rewrites its version from the same inputs).

    Why this streaming op can carry a FULL exact-hash oracle when the
    watermark ops cannot: KMV state is a deterministic function of the
    SET of keys seen — insertion order and duplicates are irrelevant
    (min-k of a union is the min-k of mins-k) — so after any in-order,
    late, or duplicated replay the final sketch equals the one-shot
    batch sketch over all events, which is exactly the SQL the oracle
    runs. This is mergeability doing the work replay-equivalence proofs
    do for the other foreachBatch ops, and it is precisely why a 100 TB
    pipeline keeps sketches (not raw keys) as streaming state: O(k)
    rows per group, exchange-free merges, and a restart can rebuild
    from any snapshot version."""
    from pyspark.sql import Window

    d = _materialize_chunks(sf_dir, "plain")
    base = os.path.join(
        "/tmp/spark_graft_kmv",
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{time.time_ns()}",
    )
    versions: dict[int, str] = {}
    w = Window.partitionBy("event_type").orderBy("h")

    def batch_sketch(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("user_id").isNotNull())
            .select(
                "event_type",
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
            )
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .drop("rn")
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_sketch(batch_df)
        # prev = highest version < batch_id (the _upsert_merge_batch replay
        # device). The KMV merge itself is additionally IDEMPOTENT —
        # min-k(distinct(S ∪ B ∪ B)) = min-k(distinct(S ∪ B)) — so unlike
        # the summing upsert, even merging a replayed batch into its own
        # v{N} output would not corrupt values; versioning by batch id
        # still matters to avoid overwriting the parquet path being read.
        prev_ids = [b for b in versions if b < batch_id]
        if prev_ids:
            prev = spark.read.schema("event_type string, h long").parquet(
                versions[max(prev_ids)]
            )
            delta = (
                prev.unionByName(delta)
                .distinct()
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= KMV_K)
                .drop("rn")
            )
        v = os.path.join(base, f"v{batch_id}")
        delta.write.mode("overwrite").parquet(v)
        versions[batch_id] = v

    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    ckpt = os.path.join(base, "ckpt")
    try:
        with _state_sized_shuffle(spark):  # sizes the per-batch jobs too
            q = (
                stream.writeStream.trigger(availableNow=True)
                .foreachBatch(merge)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
        if not versions:  # empty source: no batch ever fired
            return spark.createDataFrame(
                [], "event_type string, k_used long, est_distinct double"
            )
        snap = spark.read.schema("event_type string, h long").parquet(
            versions[max(versions)]
        )
        m = F.count("*")
        out = snap.groupBy("event_type").agg(
            m.cast("long").alias("k_used"),
            F.when(m < KMV_K, m.cast("double"))
            .otherwise(F.lit(_KMV_NUM) / F.max("h").cast("double"))
            .alias("est_distinct"),
        )
        # bounded collect: out is a per-group summary (O(groups/keys), fixture <=100s of rows); snapshotted to the driver
        # because the temp sink it reads is deleted in the finally below
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _materialize_doc_chunks(sf_dir: str) -> str:
    """Split documents into 4 ASCENDING-doc_id chunks (quartiles of the id
    order, mtime-ordered like `_materialize_chunks`): replaying them in
    order means every id smaller than a given doc has already streamed by
    the time that doc arrives — the property stream_minhash_dedup's
    batch-equivalence argument rests on."""
    d = os.path.join(CHUNK_ROOT, _chunk_ns(sf_dir, "documents"), "docs")
    sentinel = os.path.join(d, ".done")
    if os.path.exists(sentinel):
        return d
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""CREATE TEMP TABLE dv AS
            SELECT doc_id, text, lang, source, n_chars,
                   ntile(4) OVER (ORDER BY doc_id) AS q
            FROM '{sf_dir}/documents.parquet'"""
    )
    for i in range(4):
        con.execute(
            f"""COPY (SELECT doc_id, text, lang, source, n_chars
                      FROM dv WHERE q = {i + 1} ORDER BY doc_id)
                TO '{d}/chunk_{i}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    base = time.time() - 100
    for i in range(4):
        os.utime(os.path.join(d, f"chunk_{i}.parquet"), (base + i, base + i))
    with open(sentinel, "w") as f:
        f.write("ok")
    return d


def _minhash_oracle_prefix() -> str:
    """Shared CTE chain: documents → md5 gram hashes → 64-perm signatures
    → string band keys — the dedup_minhash oracle's construction, reused
    verbatim so the streaming dedup's flags are definitionally LSH flags
    over the SAME index."""
    from ..operators.dedup import (
        _GRAMS_CTE,
        MERSENNE_P,
        N_BANDS,
        N_HASH,
    )

    return f"""
{_GRAMS_CTE.strip()},
gh AS (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h1,
           ('0x' || substr(md5(gram), 16, 15))::BIGINT AS h2
    FROM grams
),
sig AS (
    SELECT doc_id, p.i,
           min(((h1 % {MERSENNE_P})
                + p.i * ((h2 % {MERSENNE_P - 1}) + 1)) % {MERSENNE_P}) AS s
    FROM gh CROSS JOIN (SELECT unnest(range(0, {N_HASH})) AS i) p
    GROUP BY doc_id, p.i
),
bands AS (
    SELECT doc_id, CAST(i // {N_HASH // N_BANDS} AS INTEGER) AS band_id,
           string_agg(s::VARCHAR, '-' ORDER BY i) AS bkey
    FROM sig GROUP BY doc_id, i // {N_HASH // N_BANDS}
)"""


@query(
    "stream_minhash_dedup",
    oracle=_minhash_oracle_prefix() + """,
own AS (SELECT band_id, bkey, min(doc_id) AS owner FROM bands GROUP BY 1, 2),
fl AS (
    SELECT b.doc_id,
           max(CASE WHEN o.owner < b.doc_id THEN 1 ELSE 0 END) AS dup
    FROM bands b
    JOIN own o ON o.band_id = b.band_id AND o.bkey = b.bkey
    GROUP BY b.doc_id
)
SELECT d.doc_id, coalesce(fl.dup, 0) = 1 AS is_dup
FROM documents d LEFT JOIN fl ON fl.doc_id = d.doc_id
""",
)
def stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-duplicate detection — the incremental twin of
    dedup_minhash: documents replay as ascending-doc_id micro-batches,
    each batch shingles → 64-perm minhash → 8-band LSH keys (the exact
    machinery of the batch op), and a foreachBatch-maintained bucket
    index flags any document whose band bucket is already owned by a
    smaller doc_id. This is the at-ingest dedup gate of a training-data
    pipeline: new crawl shards check against the corpus WITHOUT
    re-scanning it, and the state is the band index (O(docs·bands) keyed
    rows), not the corpus.

    Why a full exact-hash oracle: EVERY document registers its buckets
    (flagged duplicates too, as in any LSH index), so "flagged" ⇔ "some
    band bucket contains a smaller doc_id" — a pure function of the
    document SET. With ascending-id replay, every smaller id is in the
    state (or this batch) when a document arrives, so the incremental
    flags equal the batch predicate the oracle computes. Band keys are
    the raw signature strings here (minhash_bands string_keys mode):
    flags ARE the final output, so the in-engine-only xxhash64 would
    leave an unverifiable collision gap. Snapshots are versioned by
    batch id (the stream_foreachbatch_upsert idempotence device).

    These are LSH-candidate flags (the recall stage): production chains
    the exact-Jaccard verify behind them exactly as dedup_minhash does —
    kept out here so the op isolates the streaming-state semantics."""
    from ..ckpt import release_transient_storage
    from ..operators.dedup import _doc_gram_sets_md5, minhash_bands

    # Scope the pooled-checkpoint lease snapshot to THIS invocation: without
    # the release, repeated calls accumulate pooled blocks (the BENCH_r03
    # leak class) and guard_result below would snapshot leases accrued by
    # earlier runs, so LRU eviction of an unrelated entry could spuriously
    # raise CheckpointReleasedError when this result is forced (r13 ADVICE).
    release_transient_storage()
    d = _materialize_doc_chunks(sf_dir)
    base = os.path.join(
        "/tmp/spark_graft_sdedup",
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{time.time_ns()}",
    )
    versions: dict[int, str] = {}
    state_schema = "band_id int, bkey string, owner long"

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the shingling + 64-perm minhash is the batch's dominant
        # cost and TWO actions read it (the owner-index write and the flag
        # join) — without the cache each batch ran the signature pipeline
        # twice (measured ~2x this op's wall time at sf0.1)
        bands = minhash_bands(
            _doc_gram_sets_md5(batch_df), string_keys=True
        ).persist()
        batch_min = bands.groupBy("band_id", "bkey").agg(
            F.min("doc_id").alias("owner")
        )
        # DELTA snapshots (r17, guide §2.3/§6 — r16 VERDICT task 6): each
        # version persists only THIS batch's per-bucket mins, not the full
        # merged owner index — the r16 shape rewrote the entire cumulative
        # state every micro-batch (O(total_state) bytes per batch, the
        # dominant per-batch constant at any scale); owner state is a
        # mergeable MIN, so re-aggregating the union of all deltas ≤ this
        # batch is exactly the full-snapshot value (replay ≡ batch holds
        # unchanged). Versioning by batch id keeps the
        # stream_foreachbatch_upsert idempotence device: a replayed batch
        # rewrites its OWN delta with identical content (batch_min is a
        # deterministic function of the batch) and never self-merges.
        sv = os.path.join(base, "state", f"v{batch_id}")
        batch_min.write.mode("overwrite").parquet(sv)
        prev_ids = [b for b in versions if b < batch_id]
        deltas = spark.read.schema(state_schema).parquet(
            sv, *(versions[b] for b in prev_ids)
        )
        owners = deltas.groupBy("band_id", "bkey").agg(
            F.min("owner").alias("owner")
        )
        flags = (
            bands.join(owners, ["band_id", "bkey"])
            .groupBy("doc_id")
            .agg(
                F.max(
                    (F.col("owner") < F.col("doc_id")).cast("int")
                ).alias("dup")
            )
        )
        flags.write.mode("overwrite").parquet(
            os.path.join(base, "flags", f"v{batch_id}")
        )
        bands.unpersist()
        versions[batch_id] = sv

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    ckpt = os.path.join(base, "ckpt")
    try:
        with _state_sized_shuffle(spark):  # sizes the per-batch jobs too
            q = (
                stream.writeStream.trigger(availableNow=True)
                .foreachBatch(on_batch)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
        _record_progress(q)
        docs = load(spark, sf_dir, "documents")
        if not versions:  # empty source: no batch ever fired
            return docs.select("doc_id", F.lit(False).alias("is_dup"))
        fl = spark.read.schema("doc_id long, dup int").parquet(
            os.path.join(base, "flags", "*")
        )
        out = docs.join(fl, "doc_id", "left").select(
            "doc_id",
            F.coalesce(F.col("dup") == 1, F.lit(False)).alias("is_dup"),
        )
        # eager localCheckpoint (pooled), NOT an O(docs) driver collect:
        # the result must survive the scratch rmtree below, and executor
        # blocks do that distributedly — the previous
        # createDataFrame(collect()) shipped the whole corpus's flags
        # through the driver, data-proportional at 100 TB
        from ..ckpt import guard_result, pooled_local_checkpoint

        return guard_result(pooled_local_checkpoint(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


from ..operators.bpe import ORACLE_DOC_TOKENS_CTES  # noqa: E402 — one CTE chain


@query(
    "stream_token_budget",
    oracle=f"""
WITH RECURSIVE {ORACLE_DOC_TOKENS_CTES},
src AS (SELECT doc_id, source FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM doc_tokens JOIN src USING (doc_id)
GROUP BY source
""",
)
def stream_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time TOKEN BUDGET accounting — per-source running BPE token
    totals maintained across micro-batches via foreachBatch, so the
    mixing weights `sample_temperature` / `sample_mix_rebalance` consume
    are available AS data lands, not after a full-corpus re-scan. Each
    batch runs the SAME byte-level tokenizer as the batch path
    (bpe.doc_token_counts — real ids for every script), folds to
    (source, n_docs, total_tokens), and merges with the previous
    snapshot by summed union into a NEW versioned snapshot keyed by
    batch id (the stream_foreachbatch_upsert idempotence device).

    Why this op carries a FULL exact-hash oracle like stream_kmv_distinct:
    per-doc token counts are a deterministic pure function of each doc's
    text, and per-source SUMs are mergeable — any in-order replay of a
    disjoint chunking telescopes to the one-shot batch aggregate, which
    is exactly what the oracle computes (the byte-BPE recursive-CTE chain
    grouped by source). At 100 TB the snapshot is O(sources) rows — the
    accounting table rides along with ingest for free; the heavy work
    (the per-DISTINCT-word Arrow encode) is per-batch and
    vocabulary-sized, identical to the batch plan shape."""
    d = _materialize_doc_chunks(sf_dir)
    base = os.path.join(
        "/tmp/spark_graft_tokbudget",
        spark.sparkContext.applicationId,
        f"{os.path.basename(os.path.normpath(sf_dir))}-{time.time_ns()}",
    )
    snap_schema = "source string, n_docs long, total_tokens long"
    versions: dict[int, str] = {}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # prev is derived from BATCH ID, never from "latest written": on an
        # at-least-once replay of batch N, the previous snapshot must be the
        # highest version < N (v{N} itself may already exist from the first
        # attempt — reading it would double-count N and self-overwrite the
        # parquet path being read; round-12 ADVICE item 1).
        # fused delta (r16, guide §2.4): doc_token_counts' own wordless-doc
        # rejoin (docs ⋈ per_doc LEFT) fed a SECOND join against (doc_id,
        # source) — two batch-keyed shuffles per micro-batch where one
        # suffices. Carrying source through the left join directly drops
        # one join per batch; coalesce(n_tokens, 0) keeps wordless docs in
        # n_docs with 0 tokens, so the per-source sums are identical.
        # The per-doc aggregate is bpe's own pre-rejoin builder (r16
        # ADVICE item 3): ONE tokenizer definition for batch and stream.
        from ..operators.bpe import doc_token_counts_pre_rejoin

        per_doc = doc_token_counts_pre_rejoin(batch_df)
        delta = (
            batch_df.select("doc_id", "source")
            .join(per_doc, "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum(F.coalesce("n_tokens", F.lit(0)))
                .cast("long")
                .alias("total_tokens"),
            )
        )
        prev_ids = [b for b in versions if b < batch_id]
        if prev_ids:
            prev = spark.read.schema(snap_schema).parquet(
                versions[max(prev_ids)]
            )
            delta = (
                prev.unionByName(delta)
                .groupBy("source")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("total_tokens").alias("total_tokens"),
                )
            )
        v = os.path.join(base, f"v{batch_id}")
        delta.write.mode("overwrite").parquet(v)
        versions[batch_id] = v

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    ckpt = os.path.join(base, "ckpt")
    try:
        with _state_sized_shuffle(spark):  # sizes the per-batch jobs too
            q = (
                stream.writeStream.trigger(availableNow=True)
                .foreachBatch(merge)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
        if not versions:  # empty source: no batch ever fired
            return spark.createDataFrame([], snap_schema)
        snap = spark.read.schema(snap_schema).parquet(
            versions[max(versions)]
        )
        # bounded collect: snap is the final keyed snapshot (O(distinct keys)); snapshotted to the driver
        # because the temp sink it reads is deleted in the finally below
        return spark.createDataFrame(snap.collect(), snap.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- custom PYTHON streaming source (pyspark.sql.datasource stream API) ---

_PYSTREAM_BATCHES = 4
_PYSTREAM_PARTS = 2  # partitions per micro-batch (parallel read() calls)
_PYSTREAM_ROWS = 500  # rows per partition


def _register_synth_stream(spark: SparkSession) -> None:
    """Define + register the `synthstream` Python STREAMING data source —
    the incremental twin of scans._register_synth_source: the same
    Knuth-hash row formula, but produced through the DataSourceStreamReader
    protocol (initialOffset → latestOffset → partitions(start, end) →
    parallel read() per InputPartition → commit). Classes live inside the
    function so the package imports cleanly where the API is absent."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _StreamReader(DataSourceStreamReader):
        def initialOffset(self):
            return {"batch": 0}

        def latestOffset(self):
            # a bounded replay: availableNow drains exactly these batches;
            # a real connector would return its upstream high-watermark
            return {"batch": _PYSTREAM_BATCHES}

        def partitions(self, start, end):
            return [
                InputPartition((b, p))
                for b in range(start["batch"], end["batch"])
                for p in range(_PYSTREAM_PARTS)
            ]

        def read(self, partition):
            b, p = partition.value
            lo = (b * _PYSTREAM_PARTS + p) * _PYSTREAM_ROWS
            for i in range(lo, lo + _PYSTREAM_ROWS):
                # the scan_python_datasource formula: every row derivable
                # from the partition index alone (independently computable
                # splits — what makes replay deterministic AND parallel)
                yield (i, i % 7, (i * 2654435761 % 1000) / 100.0)

        def commit(self, end):
            pass

    class _SynthStream(DataSource):
        @classmethod
        def name(cls):
            return "synthstream"

        def schema(self):
            return "id bigint, bucket int, score double"

        def streamReader(self, schema):
            return _StreamReader()

    spark.dataSource.register(_SynthStream)


_PYSTREAM_N = _PYSTREAM_BATCHES * _PYSTREAM_PARTS * _PYSTREAM_ROWS


@query(
    "stream_python_source",
    oracle=f"""
SELECT CAST(id % 7 AS INTEGER) AS bucket,
       count(*) AS cnt,
       CAST(SUM(CAST(((id * 2654435761 % 1000) / 100.0) AS DECIMAL(29,6)))
            AS DOUBLE) AS sum_score
FROM generate_series(0, {_PYSTREAM_N - 1}) t(id)
GROUP BY 1
""",
)
def stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming from a CUSTOM PYTHON SOURCE — the ingest shape
    for any Python-reachable feed (an internal queue, a poll-based API)
    without a JVM connector: the `synthstream` source advances an offset
    per micro-batch, Spark fans each batch's InputPartitions across python
    workers, and an incremental groupBy aggregates across batches in
    complete mode. availableNow drains the bounded offset range, so the
    replay is deterministic and the final aggregate equals the batch
    computation over all generated rows — which is exactly what the DuckDB
    generate_series oracle computes (integer arithmetic + one division +
    decimal sums; the same cross-engine argument as
    scan_python_datasource). sf_dir is unused: the source IS the data.

    Scale notes: offsets are the durability contract — on restart Spark
    replays from the last committed offset, so a real connector maps them
    to upstream positions (Kafka offsets, API cursors); per-batch
    parallelism is the partitions() fan-out; python-worker marshalling is
    the slow path, so a bulk connector emits Arrow batches or lands
    parquet instead (scan_python_datasource's note)."""
    import time as _t

    _register_synth_stream(spark)
    agg = (
        spark.readStream.format("synthstream")
        .load()
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("score").cast("decimal(29,6)"))
            .cast("double")
            .alias("sum_score"),
        )
    )
    sink = f"pystream_{abs(hash(sf_dir)) % 10**8}"
    ckpt = f"/tmp/spark_graft_ckpt/{sink}-{_t.time_ns()}"
    with _state_sized_shuffle(spark):  # stateful complete-mode aggregate
        q = (
            agg.writeStream.trigger(availableNow=True)
            .format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    _record_progress(q)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink)
