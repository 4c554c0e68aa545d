"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-12 driver window (VERDICT_r11 items 1/2/6/7/8 + ADVICE item 1):
# the twelve r12-new zero-evidence ops MUST lead, then the two
# output-changed ops whose existing evidence certifies the OLD output
# (pipeline_seq_pack: byte-level budgets since r12; text_token_count:
# pretok_count rename in r11, missed the r11 window), then the 15
# r07-evidence ops (oldest left), then the flagship (in-window every
# round). The remaining slots take r08-evidence ops.
R12_PRIORITY = [
    "text_bpe_tokenize_bytes", "sql_large_volume_customers",
    "sql_promo_part_suppliers", "agg_approx_exact", "stream_token_budget",
    "bpe_train_bytes", "text_bpe_tokenize_trained_bytes",
    "sql_priority_pipeline", "sql_discounted_revenue", "sql_top_supplier",
    "sink_python_datasource", "scan_python_arrow",
    "pipeline_seq_pack", "text_token_count",
    "profile_columns", "analytics_active_users_7d",
    "analytics_pareto_topk", "merge_upsert", "compact_small_files",
    "agg_quantile_bins", "graph_pagerank", "stream_foreachbatch_upsert",
    "text_ngram_novelty", "fn_nested", "scan_schema_evolution",
    "join_bloom_filtered", "sort_zorder_layout", "snapshot_time_travel",
    "analytics_pattern_match",
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
    """Round-12 rotation goal: the zero-evidence / output-changed ops and
    the 15 r07-evidence ops LEAD the checked window, the flagship holds
    slot 30, and r08-evidence ops fill the rest EXACTLY — every slot
    accounted for, so a list edit cannot silently push a priority op
    past position 50 (the round-9 review caught the section comments
    drifting exactly this way)."""
    order = list(QUERIES)
    assert order[: len(R12_PRIORITY)] == R12_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r08-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R08_EVIDENCE = {
        "scan_python_datasource", "fn_url", "agg_bitmap_distinct",
        "ivf_centroids", "sql_volume_shipping", "sql_market_share",
        "sql_small_qty_revenue", "analytics_transition_matrix",
        "scan_binary_files", "analytics_rfm", "stream_python_source",
        "dedup_cluster_downweight", "dedup_containment",
        "dq_expectations", "sql_waiting_suppliers", "text_fingerprint",
        "multimodal_meta", "text_lang_id", "multimodal_frame_sample",
        "multimodal_resize", "text_pii_scrub", "text_tfidf",
        "text_quality_score", "dedup_ngram_jaccard", "dedup_simhash",
        "dedup_embedding", "dedup_cluster_cc", "dedup_levenshtein",
        "join_skew_salted", "join_bucketed", "join_null_safe",
        "pipeline_dataset_export", "pipeline_corpus_clean", "agg_pivot",
        "agg_percentile", "sample_hash", "sample_stratified",
        "hist_numeric", "agg_corr_stats", "agg_mode", "fn_conditional",
        "agg_unpivot", "scan_parquet", "agg_ngram_df_sketch",
        "text_novelty_sketch", "text_chunk_overlap",
        "decontaminate_bloom", "agg_kmv_distinct",
    }
    tail = set(first50[len(R12_PRIORITY):])
    assert len(first50) == 50 and tail <= R08_EVIDENCE, (
        sorted(tail - R08_EVIDENCE)
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
