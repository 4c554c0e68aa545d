"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-6 driver window (VERDICT_r05 item 2): the 44 ops whose newest
# driver evidence is r03 (the oldest evidence left after r5) MUST sit in
# the first-50 window this round, plus the flagship which stays in-window
# every round. The 5 remaining slots take the oldest r04-evidence ops.
R03_ONLY = [
    "text_repetition_score",
    "rollup_time_hypertable", "ts_gap_fill", "win_ntile",
    "win_range_interval", "cdc_latest_by_key", "text_normalize",
    "scan_orc", "scan_partition_pruned", "sink_text_formatted",
    "agg_approx", "topk_per_group", "fn_bitwise",
    "sql_top_revenue_orders", "sql_revenue_by_nation", "stream_custom_state",
    "dedup_minhash",
    "stream_watermark_late", "stream_stateful_dedup", "sim_search_ann",
    "pipeline_seq_pack", "sample_mix_rebalance",
    "sample_cap_per_source", "agg_ngram_counts",
    "text_unigram_logprob",
    "analytics_cohort_retention", "analytics_funnel",
    "dedup_cluster_keep_best",
    "stream_file_sink",
    "analytics_sessionize", "analytics_anomaly_extremes",
    "cdc_scd2", "join_asof_tolerance",
    "sample_split_train_eval", "profile_columns",
    "analytics_active_users_7d", "analytics_pareto_topk",
    "merge_upsert", "compact_small_files", "agg_quantile_bins",
    "graph_pagerank", "stream_foreachbatch_upsert", "text_ngram_novelty",
    "fn_nested",
]
R04_WINDOW_TAIL = [
    "scan_schema_evolution", "join_bloom_filtered", "sort_zorder_layout",
    "snapshot_time_travel", "analytics_pattern_match",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-6 rotation goal: every op whose newest driver evidence is r03
    sits in the checked window, plus the flagship and the 5 oldest
    r04-evidence ops that fill out the 50."""
    first50 = set(list(QUERIES)[:50])
    must = set(R03_ONLY) | set(R04_WINDOW_TAIL) | {"text_bigram_freq"}
    assert len(must) == 50
    missing = must - first50
    assert not missing, f"not in driver-checked first 50: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    run_compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    """The driver canonicalizes rows-only outputs too (that is what broke
    round-1 multimodal_decode), so rows-only ops get the same schema guard
    and pandas-canonicalization dry run as oracle-checked ones."""
    df = QUERIES[name](spark, sf_dir)
    assert_driver_hashable(df)
    rows = [tuple(r) for r in df.collect()]
    driver_canon(df.columns, rows)
    assert len(df.schema.fields) > 0
