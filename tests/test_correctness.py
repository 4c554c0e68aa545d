"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-13 driver window (VERDICT_r12 task 1): the seven r13-new
# zero-evidence ops MUST lead, then the 28 r08-evidence ops left over
# after the r12 window (the oldest evidence remaining), then the
# flagship (in-window every round). The remaining 14 slots take
# r09/r10-evidence ops.
R13_PRIORITY = [
    "text_html_extract", "pipeline_pretrain_e2e",
    "sql_forecast_revenue", "sql_returned_items", "sql_product_profit",
    "text_sentence_split", "text_lm_perplexity",
    "text_pii_scrub", "text_tfidf", "text_quality_score",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_embedding",
    "dedup_cluster_cc", "dedup_levenshtein", "join_skew_salted",
    "join_bucketed", "join_null_safe", "pipeline_dataset_export",
    "pipeline_corpus_clean", "agg_pivot", "agg_percentile",
    "sample_hash", "sample_stratified", "hist_numeric",
    "agg_corr_stats", "agg_mode", "fn_conditional", "agg_unpivot",
    "scan_parquet", "agg_ngram_df_sketch", "text_novelty_sketch",
    "text_chunk_overlap", "decontaminate_bloom", "agg_kmv_distinct",
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
    """Round-13 rotation goal: the seven r13-new zero-evidence ops and the
    28 leftover r08-evidence ops LEAD the checked window, the flagship
    holds slot 36, and r09/r10-evidence ops fill the rest EXACTLY —
    every slot accounted for, so a list edit cannot silently push a
    priority op past position 50 (the round-9 review caught the section
    comments drifting exactly this way)."""
    order = list(QUERIES)
    assert order[: len(R13_PRIORITY)] == R13_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r09/r10-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R09_R10_EVIDENCE = {
        "scan_text", "scan_csv_json", "sink_partitioned",
        "project_select", "filter_pred", "join_broadcast",
        "join_sortmerge", "join_outer", "join_semi_anti",
        "join_theta_range", "join_asof", "join_interval",
        "agg_hash_count", "agg_multi", "agg_distinct",
        "agg_grouping_sets", "agg_global", "agg_ratio_of_total",
        "win_rank", "win_analytic", "win_frame", "sort_global", "topk",
        "set_union_intersect_except", "dedup_exact", "fn_string",
        "fn_date", "fn_math", "fn_array", "fn_map_json",
        "text_tokenize", "sim_search", "udf_scalar", "udf_grouped",
        "udaf",
    }
    tail = set(first50[len(R13_PRIORITY):])
    assert len(first50) == 50 and tail <= R09_R10_EVIDENCE, (
        sorted(tail - R09_R10_EVIDENCE)
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
