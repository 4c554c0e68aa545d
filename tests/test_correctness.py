"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-9 driver window (VERDICT_r08 item 1): the ten r8 ops with zero
# driver evidence MUST lead the first-50 window, plus agg_approx (output
# changed this round: self-evidencing rewrite), the flagship (in-window
# every round), and sim_search_ivf (only op whose last driver attempt
# FAILED, r5). The remaining slots take r05-evidence ops, oldest left.
R8_ZERO_EVIDENCE = [
    "graph_triangle_count", "pq_codebooks", "sim_search_pq",
    "sample_temperature", "stream_kmv_distinct",
    "sql_customer_distribution", "sql_promising_customers",
    "ts_motif_match", "stream_minhash_dedup", "rollup_sketch_hierarchy",
]
RECHECK_R9 = [
    "dedup_substring", "dedup_substring_scrub",  # new in r9 — zero evidence
    "agg_approx", "text_bigram_freq", "sim_search_ivf",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-9 rotation goal: the ten zero-driver-evidence r8 ops LEAD the
    checked window (positions 1-10), the two new r9 ops + agg_approx /
    flagship / sim_search_ivf take 11-15, and 35 r05-evidence ops fill the
    window EXACTLY — every slot accounted for, so a list edit cannot
    silently push a priority op past position 50 (the round-9 review
    caught the section comments drifting exactly this way)."""
    order = list(QUERIES)
    assert order[:10] == R8_ZERO_EVIDENCE
    assert order[10:15] == RECHECK_R9
    first50 = order[:50]
    # slots 16-50 must all be r05-evidence ops: no zero-evidence or
    # priority op may be displaced below the driver's cutoff
    R05_EVIDENCE = {
        "scan_text", "scan_csv_json", "sink_partitioned", "project_select",
        "filter_pred", "join_broadcast", "join_sortmerge", "join_outer",
        "join_semi_anti", "join_theta_range", "join_asof", "join_interval",
        "agg_hash_count", "agg_multi", "agg_distinct", "agg_grouping_sets",
        "agg_global", "agg_ratio_of_total", "win_rank", "win_analytic",
        "win_frame", "sort_global", "topk", "set_union_intersect_except",
        "dedup_exact", "fn_string", "fn_date", "fn_math", "fn_array",
        "fn_map_json", "text_tokenize", "sim_search", "udf_scalar",
        "udf_grouped", "udaf", "udtf", "fn_agg_collect",
        "multimodal_decode", "sql_pricing_summary", "stream_stream_join",
        "stream_tumbling", "stream_sliding", "stream_session",
        "text_decontaminate", "dedup_passage", "dedup_span_rolling",
        "sample_quality_weighted", "agg_heavy_hitters",
    }
    tail = set(first50[15:])
    assert len(first50) == 50 and tail <= R05_EVIDENCE, (
        sorted(tail - R05_EVIDENCE)
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
