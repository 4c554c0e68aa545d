"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-8 driver window (VERDICT_r07 item 1): the 44 ops whose newest
# driver evidence is r04 (the oldest evidence left after r7) MUST sit in
# the first-50 window this round, plus the flagship which stays in-window
# every round. The 5 remaining slots take the oldest r05-evidence ops.
R04_ONLY = [
    "scan_python_datasource", "fn_url", "agg_bitmap_distinct",
    "ivf_centroids", "sql_volume_shipping", "sql_market_share",
    "sql_small_qty_revenue", "analytics_transition_matrix",
    "scan_binary_files", "analytics_rfm", "stream_python_source",
    "dedup_cluster_downweight", "dedup_containment", "dq_expectations",
    "sql_waiting_suppliers",
    "text_fingerprint", "multimodal_meta", "text_lang_id",
    "multimodal_frame_sample", "multimodal_resize", "text_pii_scrub",
    "text_tfidf", "text_quality_score", "text_token_count",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_embedding",
    "dedup_cluster_cc", "dedup_levenshtein",
    "join_skew_salted", "join_bucketed", "join_null_safe",
    "pipeline_dataset_export", "pipeline_corpus_clean",
    "agg_pivot", "agg_percentile", "sample_hash", "sample_stratified",
    "hist_numeric", "agg_corr_stats", "agg_mode", "fn_conditional",
    "agg_unpivot", "scan_parquet",
]
# New-in-r8 ops have NO driver evidence at all — older than any round
# number — so five of the eight take the remaining window slots (all
# eight hash-match the DuckDB oracle at sf0.01 locally); the other three
# lead the round-9 window.
NEW_R8_WINDOW_TAIL = [
    "agg_ngram_df_sketch", "text_novelty_sketch", "text_chunk_overlap",
    "decontaminate_bloom", "agg_kmv_distinct",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-8 rotation goal: every op whose newest driver evidence is r04
    sits in the checked window, plus the flagship and 5 of the 8
    zero-evidence new-in-r8 ops that fill out the 50."""
    first50 = set(list(QUERIES)[:50])
    must = set(R04_ONLY) | set(NEW_R8_WINDOW_TAIL) | {"text_bigram_freq"}
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
