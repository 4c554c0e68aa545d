"""Behavioral pins for the maintenance/graph/binning ops — properties their
DuckDB oracles can't express: on-disk fragmentation premises, merge
semantics by case, PageRank mass conservation, bin balance, and streaming
upsert determinism."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from erlang_mapreduce_spark.operators.maintenance import (
    COMPACT_ROWS_PER_FILE,
)
from erlang_mapreduce_spark.registry import QUERIES
from erlang_mapreduce_spark.tables import load


def test_compaction_premise_roundrobin_fragments(spark, sf_dir, tmp_path):
    """The op's 'before' state must really be fragmented: a 16-way
    round-robin repartition sprays ~16 sliver files into every partition
    dir — strictly more than the compacted ceil(rows/8192) target the
    oracle predicts."""
    src = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_returnflag"
    )
    frag = str(tmp_path / "frag")
    src.repartition(16).write.partitionBy("l_returnflag").parquet(frag)
    per_flag = {}
    for d in os.listdir(frag):
        if d.startswith("l_returnflag="):
            per_flag[d] = sum(
                1
                for f in os.listdir(os.path.join(frag, d))
                if f.endswith(".parquet")
            )
    rows = {
        r["l_returnflag"]: r["n"]
        for r in src.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert per_flag, "no partition dirs written"
    for d, n_files in per_flag.items():
        flag = d.split("=", 1)[1]
        compacted = math.ceil(rows[flag] / COMPACT_ROWS_PER_FILE)
        assert n_files > compacted, (
            f"{d}: fragmented write produced {n_files} files, "
            f"not more than compacted target {compacted}"
        )


def test_merge_upsert_case_semantics(spark, sf_dir):
    """Per-case MERGE outcomes: deletes (key%7==0) vanish, updates
    (key%3==0, not deleted) gain exactly +100 acctbal, inserts appear
    under key+100000 with zero balance, untouched rows pass through
    bit-identically."""
    base = {
        r["s_suppkey"]: r
        for r in load(spark, sf_dir, "supplier").collect()
    }
    out = {
        r["s_suppkey"]: r
        for r in QUERIES["merge_upsert"](spark, sf_dir).collect()
    }
    assert len(out) == len(
        [k for k in base if k % 7 != 0]
    ) + len([k for k in base if k % 5 == 0])
    for k, b in base.items():
        if k % 7 == 0:
            assert k not in out  # deleted
        elif k % 3 == 0:
            assert out[k]["s_acctbal"] == b["s_acctbal"] + 100.0
            assert out[k]["s_name"] == b["s_name"]
        else:
            assert out[k] == b  # untouched passthrough
        if k % 5 == 0:
            ins = out[k + 100000]
            assert ins["s_acctbal"] == 0.0
            assert ins["s_name"] == f"NEW_{k}"
            assert ins["s_nationkey"] == b["s_nationkey"]


def test_pagerank_mass_conservation(spark, sf_dir):
    """Fixed-point sanity: the node set is closed (one rank per graph
    node), every rank carries at least the damping floor 0.15·1e6, and
    total mass stays ≈ n·1e6 (integer division leaks strictly less than
    one micro-unit per edge per round)."""
    ranks = QUERIES["graph_pagerank"](spark, sf_dir).collect()
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    n_nodes = (
        pairs.select(F.col("l_partkey").alias("k")).distinct().count()
        + pairs.select(F.col("l_suppkey").alias("k")).distinct().count()
    )
    assert len(ranks) == n_nodes
    total = sum(r["rank_micro"] for r in ranks)
    assert all(r["rank_micro"] >= 150_000 for r in ranks)
    assert 0.95 * n_nodes * 1_000_000 <= total <= n_nodes * 1_000_000


def test_quantile_bins_balanced(spark, sf_dir):
    """Equal-frequency means the four bins differ by at most the tie mass
    at the boundaries; fixture prices are near-unique, so sizes are within
    a few rows of n/4 — and they cover all rows exactly once."""
    rows = QUERIES["agg_quantile_bins"](spark, sf_dir).collect()
    n = load(spark, sf_dir, "orders").count()
    assert sorted(r["bin"] for r in rows) == [1, 2, 3, 4]
    assert sum(r["n_orders"] for r in rows) == n
    for r in rows:
        assert abs(r["n_orders"] - n / 4) <= 3
    by_bin = {r["bin"]: r for r in rows}
    for lo, hi in ((1, 2), (2, 3), (3, 4)):
        assert by_bin[lo]["max_price"] <= by_bin[hi]["min_price"]


def test_foreachbatch_upsert_deterministic_rerun(spark, sf_dir):
    """Two full replays produce identical snapshots (versioned-snapshot
    merge has no order- or retry-sensitivity)."""
    fn = QUERIES["stream_foreachbatch_upsert"]
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b


def test_bloom_filter_injected_and_confs_restored(spark, sf_dir):
    """join_bloom_filtered must (a) really inject might_contain into the
    probe-side plan under its confs, and (b) leave every session conf
    exactly as it found it."""
    from erlang_mapreduce_spark.operators.joins import (
        _BLOOM_CONFS,
        _bloom_query,
    )

    before = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    QUERIES["join_bloom_filtered"](spark, sf_dir)
    after = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    assert before == after, "session confs leaked"

    saved = dict(before)
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        p = (
            _bloom_query(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "might_contain" in p.lower(), "bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """The Morton-order guarantee the layout op exists for: every z-bucket
    (z >> 10, i.e. 5 low bits dropped per dimension) confines BOTH key
    dimensions to a 32-value box — which is why z-ordered files carry
    tight min/max stats on both columns simultaneously."""
    rows = QUERIES["sort_zorder_layout"](spark, sf_dir).collect()
    assert len(rows) > 1, "fixture should span multiple z-buckets"
    for r in rows:
        assert r["part_hi"] - r["part_lo"] <= 31
        assert r["supp_hi"] - r["supp_lo"] <= 31


def test_python_datasource_parallel_splits(spark, sf_dir):
    """The custom Python data source must expose its InputPartition list to
    the scheduler — 8 independent splits, not one serialized read."""
    from erlang_mapreduce_spark.sources.scans import (
        _SYNTH_PARTS,
        _register_synth_source,
    )

    try:
        _register_synth_source(spark)
    except Exception:
        pass
    df = (
        spark.read.format("synthdocs")
        .option("numPartitions", str(_SYNTH_PARTS))
        .load()
    )
    assert df.rdd.getNumPartitions() == _SYNTH_PARTS


def test_pysink_manifest_excludes_orphan_shards(spark, tmp_path):
    """The pysink two-phase commit's exactly-once guarantee under task
    retries: a failed or speculative attempt leaves its shard file in
    the directory, but only attempts whose commit message reached
    commit() are in the _SUCCESS manifest — read_committed_shards must
    count every committed row exactly once and the orphan's rows zero
    times (a directory glob would double-count here)."""
    from pyspark.sql import functions as F

    from erlang_mapreduce_spark.sources.scans import (
        _register_pysink,
        read_committed_shards,
    )

    _register_pysink(spark)
    base = str(tmp_path / "pysink")
    (
        spark.range(0, 100)
        .select(
            F.col("id").alias("o_orderkey"),
            F.lit("X").alias("o_orderpriority"),
        )
        .write.format("pysink")
        .option("path", base)
        .mode("append")
        .save()
    )
    # simulate the leftover shard of a retried attempt: same directory,
    # valid JSONL, absent from the manifest
    import os as _os

    with open(_os.path.join(base, "part-0-99999.jsonl"), "w") as f:
        f.write('{"o_orderkey": 1000000, "o_orderpriority": "X"}\n')
    back = read_committed_shards(
        spark, base, "o_orderkey bigint, o_orderpriority string"
    )
    assert back.count() == 100
    assert back.agg(F.sum("o_orderkey")).first()[0] == sum(range(100))
