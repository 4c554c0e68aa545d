"""Transient-storage lifecycle for materialization-heavy operators.

Why this exists (BENCH_r03 lesson): the pair-dedup ops truncate lineage
with ``localCheckpoint`` and pagerank ``cache()``-es its edge table, but
nothing ever FREED those executor-local blocks — repeated invocations in
one long-lived JVM (the bench's median-of-3, the driver's 50-query sweep)
accumulated storage until eviction pressure produced 2× cross-pass
variance on dedup_cluster_cc (5.07/6.26/11.74 s) and dedup_minhash
(2.69/2.37/6.13 s) while every non-checkpointing query stayed stable.

Two tools, matched to the two materialization kinds:

- ``pooled_persist(df)`` — for *non-iterative* reuse (a table read by 2-3
  consumers of one query): plain ``persist()`` registered in a pool.
  Unpersisting a persisted plan is ALWAYS safe — if some still-lazy plan
  references it later, Spark just recomputes from lineage (and on a real
  cluster that recompute path is also what makes executor loss survivable,
  unlike localCheckpoint's unreplicated blocks which fail the job).
- ``free_local_checkpoint(df)`` — for *iterative* lineage truncation
  (connected components), where ``localCheckpoint`` is genuinely needed:
  drops the checkpointed blocks through the JVM handle
  (``queryExecution().analyzed().rdd()``), since ``DataFrame.unpersist``
  only talks to the CacheManager and ignores RDD-level persistence.
  Freeing a checkpointed plan's blocks makes RE-executing that exact plan
  impossible (lineage was truncated), so callers only free blocks that are
  provably superseded — see ``connected_components``'s per-round release —
  or park the final round's blocks in the pool for the next invocation.

``release_transient_storage()`` drains the pool. Every pooled op calls it
on entry (so invocation N+1 frees invocation N's blocks even when nobody
else does), and ``bench.py`` calls it between timed passes (outside the
timed region) so back-to-back passes of one query start from identical
storage state. Contract implied for checkpoint-backed results (CC labels):
a returned DataFrame should be executed before the next pooled operator is
*invoked*; persist-backed results have no such constraint (they recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (kind, df) where kind is "persist" (unpersist is always safe) or
# "ckpt" (blocks are dropped via the JVM handle; plan must be done).
_POOL: list[tuple[str, DataFrame]] = []


def free_local_checkpoint(df: DataFrame) -> None:
    """Drop the executor-local blocks behind a localCheckpointed DataFrame.

    Reaches through py4j to the ``LogicalRDD`` the checkpoint produced —
    the only handle that owns the persisted internal RDD (``df.rdd`` would
    build a NEW conversion RDD whose unpersist is a no-op on the blocks).
    Defensive except: the accessor chain is Spark-internal API; on a Spark
    where it moved, leaking the block (old behavior) beats crashing a
    correct query.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def pooled_local_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` + register the blocks for release at the next
    ``release_transient_storage()``. Use only when lineage truncation is
    required AND the checkpointed plan will not be re-executed after the
    next pooled operator runs."""
    ck = df.localCheckpoint()
    _POOL.append(("ckpt", ck))
    return ck


def park_local_checkpoint(df: DataFrame) -> None:
    """Register an ALREADY-localCheckpointed DataFrame whose blocks must
    outlive the current function (a returned plan reads them) but become
    garbage once the next pooled operator starts."""
    _POOL.append(("ckpt", df))


def pooled_persist(df: DataFrame) -> DataFrame:
    """``persist()`` + register for release at the next
    ``release_transient_storage()``. Safe for any reuse pattern — an
    unpersisted plan silently recomputes."""
    p = df.persist()
    _POOL.append(("persist", p))
    return p


def release_transient_storage() -> None:
    """Free every pooled block. Idempotent; called by pooled ops on entry
    and by bench.py between timed passes."""
    for kind, df in _POOL:
        if kind == "ckpt":
            free_local_checkpoint(df)
        else:
            try:
                df.unpersist()
            except Exception:
                pass
    _POOL.clear()
