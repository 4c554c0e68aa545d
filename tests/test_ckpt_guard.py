"""Lease-guard and shared-cache-invalidation tests for ckpt.py.

The guard machinery (`ckpt._GuardedDataFrame`, `guard_result`) subclasses a
private Spark class (`pyspark.sql.classic.dataframe.DataFrame`) and
overrides `_jdf` as a checking property — exactly the kind of code a Spark
upgrade breaks silently. These tests force the error path end-to-end so a
regression shows up as a test failure, not as users getting Spark's raw
"checkpoint block not found" (or, worse, silently stale data from the
shared LRU)."""

from __future__ import annotations

import os
import shutil
import time

import pytest

from erlang_mapreduce_spark import ckpt
from erlang_mapreduce_spark.ckpt import (
    CheckpointReleasedError,
    release_transient_storage,
    shared_local_checkpoint,
)


def _pooled_guarded_result(spark):
    """A guard_result over a pooled checkpoint, built straight from the
    ckpt.py primitives — the composition every _materialize-using op has,
    WITHOUT depending on any particular op's current internals (ops have
    migrated between pooled and shared storage across rounds; these tests
    must pin ckpt.py, not an op's composition of the day)."""
    from erlang_mapreduce_spark.ckpt import guard_result, pooled_local_checkpoint

    base = pooled_local_checkpoint(spark.range(100).toDF("n"))
    return guard_result(base.groupBy((base.n % 7).alias("k")).count())


def test_stale_pooled_result_raises_named_error(spark):
    """A pooled-checkpoint-backed result forced AFTER
    release_transient_storage() must raise CheckpointReleasedError — the
    named contract error pointing at the fix — never Spark's raw
    block-not-found internals error."""
    fresh = _pooled_guarded_result(spark)
    assert fresh.count() > 0  # forcing while the blocks are live is fine
    stale = _pooled_guarded_result(spark)
    release_transient_storage()
    with pytest.raises(CheckpointReleasedError):
        stale.count()


def test_stale_after_next_pooled_op(spark, sf_dir):
    """The documented contract violation: holding op A's lazy result across
    op B's invocation (B's entry release_transient_storage() frees A's
    blocks). The violation must surface as the named error when A's result
    is finally touched, while B's own fresh result stays forceable."""
    from erlang_mapreduce_spark.operators.curation import text_decontaminate

    a = _pooled_guarded_result(spark)
    b = text_decontaminate(spark, sf_dir)  # entry release frees a's blocks
    assert b.count() > 0
    with pytest.raises(CheckpointReleasedError):
        a.count()


def test_shared_lru_eviction_kills_dependents(spark):
    """Shared-cache leases die only on LRU eviction — so a guard_result
    depending exclusively on a shared table survives
    release_transient_storage(), but gets the named error once enough NEW
    shared entries push its table out of the LRU. Built straight from
    shared_local_checkpoint + guard_result so the test pins ckpt.py's
    eviction contract, not any op's current storage composition."""
    from erlang_mapreduce_spark.ckpt import guard_result

    release_transient_storage()  # op-entry convention: clean lease slate
    try:
        base = shared_local_checkpoint(
            ("test-evict-subject",),
            lambda: spark.range(100).toDF("n"),
            desc="subject",
        )
        r = guard_result(base.groupBy((base.n % 7).alias("k")).count())
        release_transient_storage()  # shared leases survive this ...
        assert r.count() > 0
        for i in range(ckpt._SHARED_CAP + 1):  # ... but not eviction
            shared_local_checkpoint(
                ("test-evict-dummy", i), lambda: spark.range(1), desc="dummy"
            )
        with pytest.raises(CheckpointReleasedError):
            r.count()
    finally:
        # reset: drop the dummies (and any evicted-but-half-built state) so
        # later dedup tests rebuild from a clean cache instead of mixing
        # dummy keys into their LRU budget
        ckpt.release_shared()
        release_transient_storage()


def test_shared_cache_fingerprint_miss_on_rewrite(spark, sf_dir, tmp_path):
    """Chaos test for the cross-invocation shared LRU: a corpus fixture
    REWRITTEN at the same path — same byte size, bumped mtime, the
    nastiest realistic in-place rewrite — must MISS the cache (a fresh key
    is inserted) instead of serving the old corpus's blocks. The
    fingerprint is stat-based (size + mtime_ns): a rewrite that preserves
    BOTH size and mtime_ns would defeat it — that caveat is documented on
    `_corpus_fingerprint`; production corpus snapshots are immutable."""
    from erlang_mapreduce_spark.operators.dedup import _shared_members

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    doc = corpus / "documents.parquet"
    shutil.copyfile(os.path.join(sf_dir, "documents.parquet"), doc)

    n1 = _shared_members(spark, str(corpus)).count()
    keys_before = set(ckpt._SHARED.keys())

    st = os.stat(doc)
    os.utime(doc, ns=(st.st_atime_ns, st.st_mtime_ns + 1))  # in-place rewrite

    n2 = _shared_members(spark, str(corpus)).count()
    keys_after = set(ckpt._SHARED.keys())
    assert keys_after - keys_before, (
        "mtime-bumped rewrite was served from the shared cache (stale read)"
    )
    assert n2 == n1  # same bytes -> same member map, freshly rebuilt


def test_stream_chunk_cache_rewrite_miss_and_prune(tmp_path):
    """The streaming chunk cache must (a) miss when a corpus is rewritten
    in place — round-8 ADVICE: the basename-keyed cache replayed STALE
    chunks behind its .done sentinel — (b) LEAVE the superseded
    fingerprint dir alone for a full grace window measured from
    SUPERSESSION, not from its last write (round-9 ADVICE: an immediate
    rmtree raced concurrent readers mid-replay into FileNotFound;
    round-11 ADVICE: gating on st_mtime deleted any dir BUILT more than
    the grace ago instantly — the first sighting must start the clock via
    a .superseded marker, however old the dir), and (c) prune it once the
    marker ages past the window so in-place rewrites don't leak chunk
    sets under CHUNK_ROOT for the machine's uptime (and never touch
    other corpora's groups)."""
    import duckdb

    from erlang_mapreduce_spark.streaming import streams

    def write_docs(texts):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT "
            "CAST(row_number() OVER () AS BIGINT) AS doc_id, "
            "t AS text, 'en' AS lang, 's' AS source, "
            "CAST(length(t) AS BIGINT) AS n_chars "
            "FROM (SELECT unnest(?) AS t)",
            [texts],
        )
        con.execute(
            f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
        )
        con.close()

    def chunk_docids(d):
        con = duckdb.connect()
        ids = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM '{d}/chunk_*.parquet' ORDER BY 1"
            ).fetchall()
        ]
        con.close()
        return ids

    write_docs([f"alpha doc {i}" for i in range(8)])
    d1 = streams._materialize_doc_chunks(str(tmp_path))
    assert chunk_docids(d1) == list(range(1, 9))

    # back-date the FIRST build far past the grace window before
    # superseding it: under the round-11-flagged st_mtime gate this dir
    # would be rmtree'd by the very next sweep, racing live readers
    old = time.time() - streams._PRUNE_GRACE_S - 60
    os.utime(os.path.dirname(d1), (old, old))

    # rewrite IN PLACE with different content (different size => new
    # fingerprint): the cache must rebuild, not replay the stale chunks
    write_docs([f"beta document rewritten {i}" for i in range(12)])
    d2 = streams._materialize_doc_chunks(str(tmp_path))
    assert d2 != d1
    assert chunk_docids(d2) == list(range(1, 13))

    # d1/d2 share the (abspath, table) group dir; the superseded
    # fingerprint dir must SURVIVE its first sighting no matter how old
    # its own mtime is (a concurrent session may still be replaying it) —
    # the sweep instead starts the grace clock by dropping a marker
    group_dir = os.path.dirname(os.path.dirname(d2))
    assert group_dir == os.path.dirname(os.path.dirname(d1))
    live = os.path.basename(os.path.dirname(d2))
    stale = os.path.basename(os.path.dirname(d1))
    assert sorted(os.listdir(group_dir)) == sorted({live, stale})
    marker = os.path.join(os.path.dirname(d1), ".superseded")
    assert os.path.exists(marker)

    # a sweep INSIDE the grace window (marker is fresh) must still skip
    d2b = streams._materialize_doc_chunks(str(tmp_path))
    assert d2b == d2
    assert sorted(os.listdir(group_dir)) == sorted({live, stale})

    # back-date the MARKER past the grace window: the next cache entry
    # must reclaim the dir, leaving only the live fingerprint
    os.utime(marker, (old, old))
    d3 = streams._materialize_doc_chunks(str(tmp_path))
    assert d3 == d2
    assert os.listdir(group_dir) == [live]


def test_none_fingerprint_is_uncacheable(tmp_path):
    """A missing/unreadable corpus must NOT become a cache key: the
    shared materialization falls through to the builder (no entry that a
    later-appearing table could alias), and the streaming chunk namespace
    is unique per call (no .done sentinel reuse across error states)."""
    from erlang_mapreduce_spark.operators import dedup
    from erlang_mapreduce_spark.streaming import streams

    missing = str(tmp_path / "no_such_corpus")
    sentinel = object()
    # spark is only touched after the fingerprint gate — None proves the
    # early return happened and nothing was cached
    out = dedup._shared_materialize(None, missing, "x", lambda: sentinel)
    assert out is sentinel

    a = streams._chunk_ns(missing, "documents")
    b = streams._chunk_ns(missing, "documents")
    assert "uncached-" in a and a != b
    assert os.path.dirname(a) == os.path.dirname(b)  # same (path) group
