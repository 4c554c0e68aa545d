"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-16 driver window (VERDICT_r15 task 4): the two r16-new ops
# (curate_url_dedup, curate_domain_filter — zero evidence) MUST lead,
# then the 39 r12-evidence ops (the oldest evidence remaining after the
# r15 window cleared the r11 block), then the flagship at slot 42. The
# remaining 8 slots take
# the head of the r13-evidence block — including pipeline_pretrain_e2e,
# so the driver re-proves the newly composed 15-stage capstone. After
# r16, no op's driver evidence predates r13.
R16_PRIORITY = [
    "curate_url_dedup",
    "curate_domain_filter",
    "sink_python_datasource",
    "scan_python_arrow",
    "pipeline_seq_pack",
    "text_token_count",
    "profile_columns",
    "analytics_active_users_7d",
    "analytics_pareto_topk",
    "merge_upsert",
    "compact_small_files",
    "agg_quantile_bins",
    "graph_pagerank",
    "stream_foreachbatch_upsert",
    "text_ngram_novelty",
    "fn_nested",
    "scan_schema_evolution",
    "join_bloom_filtered",
    "sort_zorder_layout",
    "snapshot_time_travel",
    "analytics_pattern_match",
    "scan_python_datasource",
    "fn_url",
    "agg_bitmap_distinct",
    "ivf_centroids",
    "sql_volume_shipping",
    "sql_market_share",
    "sql_small_qty_revenue",
    "analytics_transition_matrix",
    "scan_binary_files",
    "analytics_rfm",
    "stream_python_source",
    "dedup_cluster_downweight",
    "dedup_containment",
    "dq_expectations",
    "sql_waiting_suppliers",
    "text_fingerprint",
    "multimodal_meta",
    "text_lang_id",
    "multimodal_frame_sample",
    "multimodal_resize",
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
    """Round-16 rotation goal: the r16-new zero-evidence op and the 39
    r12-evidence ops LEAD the checked window, the flagship holds slot 42,
    and r13-evidence ops fill the rest EXACTLY — every slot accounted
    for, so a list edit cannot silently push a priority op past position
    50 (the round-9 review caught the section comments drifting exactly
    this way)."""
    order = list(QUERIES)
    assert order[: len(R16_PRIORITY)] == R16_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r13-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R13_EVIDENCE_HEAD = {
        "text_html_extract",
        "pipeline_pretrain_e2e",
        "sql_forecast_revenue",
        "sql_returned_items",
        "sql_product_profit",
        "text_sentence_split",
        "text_lm_perplexity",
        "text_pii_scrub",
    }
    tail = set(first50[len(R16_PRIORITY):])
    assert len(first50) == 50 and tail <= R13_EVIDENCE_HEAD, (
        sorted(tail - R13_EVIDENCE_HEAD)
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
