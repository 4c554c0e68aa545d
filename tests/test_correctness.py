"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-5 driver window (VERDICT_r04 item 1): the 44 ops whose newest
# driver evidence is r02 (the oldest evidence left after r4) MUST sit in
# the first-50 window this round, plus the flagship which stays in-window
# every round. The 5 remaining slots take the oldest r03-evidence ops.
R02_ONLY = [
    "scan_text", "scan_csv_json", "sink_partitioned",
    "project_select", "filter_pred",
    "join_broadcast", "join_sortmerge", "join_outer", "join_semi_anti",
    "join_theta_range", "join_asof", "join_interval",
    "agg_hash_count", "agg_multi", "agg_distinct", "agg_grouping_sets",
    "agg_global", "agg_ratio_of_total",
    "win_rank", "win_analytic", "win_frame",
    "sort_global", "topk", "set_union_intersect_except", "dedup_exact",
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_map_json",
    "text_tokenize", "sim_search",
    "udf_scalar", "udf_grouped", "udaf", "udtf",
    "fn_agg_collect", "multimodal_decode", "sim_search_ivf",
    "sql_pricing_summary", "stream_stream_join",
    "stream_tumbling", "stream_sliding", "stream_session",
]
R03_WINDOW_TAIL = [
    "text_decontaminate", "dedup_passage", "dedup_span_rolling",
    "sample_quality_weighted", "agg_heavy_hitters",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-5 rotation goal: every op whose newest driver evidence is r02
    sits in the checked window, plus the flagship and the 5 oldest
    r03-evidence ops that fill out the 50."""
    first50 = set(list(QUERIES)[:50])
    must = set(R02_ONLY) | set(R03_WINDOW_TAIL) | {"text_bigram_freq"}
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
