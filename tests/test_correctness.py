"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-11 driver window (VERDICT_r10 items 1+2): text_bpe_tokenize (new
# in r10, zero driver evidence) and pipeline_seq_pack (output changed in
# r10 — packs on real BPE counts now; its r7 evidence certifies the old
# whitespace impl) MUST lead, then the 13 r05-evidence ops the skipped
# r10 rotation left stale, then the flagship (in-window every round).
# The remaining slots take r07-evidence ops, oldest left.
R11_PRIORITY = [
    "text_bpe_tokenize", "bpe_train", "text_bpe_tokenize_trained",
    "pipeline_seq_pack",
    "udtf", "fn_agg_collect", "multimodal_decode", "sql_pricing_summary",
    "stream_stream_join", "stream_tumbling", "stream_sliding",
    "stream_session", "text_decontaminate", "dedup_passage",
    "dedup_span_rolling", "sample_quality_weighted", "agg_heavy_hitters",
    "text_bigram_freq",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-11 rotation goal: the zero-evidence / output-changed ops and
    the 13 stale r05-evidence ops LEAD the checked window, the flagship
    holds slot 18, and r07-evidence ops fill the rest EXACTLY — every
    slot accounted for, so a list edit cannot silently push a priority op
    past position 50 (the round-9 review caught the section comments
    drifting exactly this way)."""
    order = list(QUERIES)
    assert order[: len(R11_PRIORITY)] == R11_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r07-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R07_EVIDENCE = {
        "text_repetition_score", "rollup_time_hypertable", "ts_gap_fill",
        "win_ntile", "win_range_interval", "cdc_latest_by_key",
        "text_normalize", "scan_orc", "scan_partition_pruned",
        "sink_text_formatted", "topk_per_group", "fn_bitwise",
        "sql_top_revenue_orders", "sql_revenue_by_nation",
        "stream_custom_state", "dedup_minhash", "stream_watermark_late",
        "stream_stateful_dedup", "sim_search_ann", "sample_mix_rebalance",
        "sample_cap_per_source", "agg_ngram_counts",
        "text_unigram_logprob", "analytics_cohort_retention",
        "analytics_funnel", "dedup_cluster_keep_best", "stream_file_sink",
        "analytics_sessionize", "analytics_anomaly_extremes", "cdc_scd2",
        "join_asof_tolerance", "sample_split_train_eval",
        "profile_columns", "analytics_active_users_7d",
        "analytics_pareto_topk", "merge_upsert", "compact_small_files",
        "agg_quantile_bins", "graph_pagerank",
        "stream_foreachbatch_upsert", "text_ngram_novelty", "fn_nested",
        "scan_schema_evolution", "join_bloom_filtered",
        "sort_zorder_layout", "snapshot_time_travel",
        "analytics_pattern_match",
    }
    tail = set(first50[len(R11_PRIORITY):])
    assert len(first50) == 50 and tail <= R07_EVIDENCE, (
        sorted(tail - R07_EVIDENCE)
    )


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
