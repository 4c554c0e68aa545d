"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-15 driver window (VERDICT_r14 task 3): the three r15-new ops
# (quality_classifier_score, text_gopher_rules, dedup_lines_global — zero
# evidence) MUST lead, then the 36 r11-evidence ops (the oldest evidence
# remaining after the r14 window), then the flagship at slot 40. The
# remaining 10 slots take the head of the r12-evidence block. After r15,
# no op's driver evidence predates r12.
R15_PRIORITY = [
    "quality_classifier_score",
    "text_gopher_rules",
    "dedup_lines_global",
    "dedup_passage",
    "dedup_span_rolling",
    "sample_quality_weighted",
    "agg_heavy_hitters",
    "text_repetition_score",
    "rollup_time_hypertable",
    "ts_gap_fill",
    "win_ntile",
    "win_range_interval",
    "cdc_latest_by_key",
    "text_normalize",
    "scan_orc",
    "scan_partition_pruned",
    "sink_text_formatted",
    "topk_per_group",
    "fn_bitwise",
    "sql_top_revenue_orders",
    "sql_revenue_by_nation",
    "stream_custom_state",
    "dedup_minhash",
    "stream_watermark_late",
    "stream_stateful_dedup",
    "sim_search_ann",
    "sample_mix_rebalance",
    "sample_cap_per_source",
    "agg_ngram_counts",
    "text_unigram_logprob",
    "analytics_cohort_retention",
    "analytics_funnel",
    "dedup_cluster_keep_best",
    "stream_file_sink",
    "analytics_sessionize",
    "analytics_anomaly_extremes",
    "cdc_scd2",
    "join_asof_tolerance",
    "sample_split_train_eval",
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
    """Round-15 rotation goal: the r15-new zero-evidence op and the 36
    r11-evidence ops LEAD the checked window, the flagship holds slot 38,
    and r12-evidence ops fill the rest EXACTLY — every slot accounted
    for, so a list edit cannot silently push a priority op past position
    50 (the round-9 review caught the section comments drifting exactly
    this way)."""
    order = list(QUERIES)
    assert order[: len(R15_PRIORITY)] == R15_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r12-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R12_EVIDENCE_HEAD = {
        "text_bpe_tokenize_bytes",
        "sql_large_volume_customers",
        "sql_promo_part_suppliers",
        "agg_approx_exact",
        "stream_token_budget",
        "bpe_train_bytes",
        "text_bpe_tokenize_trained_bytes",
        "sql_priority_pipeline",
        "sql_discounted_revenue",
        "sql_top_supplier",
    }
    tail = set(first50[len(R15_PRIORITY):])
    assert len(first50) == 50 and tail <= R12_EVIDENCE_HEAD, (
        sorted(tail - R12_EVIDENCE_HEAD)
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
