"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# SURVEY.md §2.B contract — each must occupy one of the driver-checked
# first 50 registry slots so CORRECTNESS_r{N} gets a row for it
CONTRACT_OPS = [
    "scan_parquet", "scan_text", "scan_csv_json", "sink_partitioned",
    "project_select", "filter_pred",
    "join_broadcast", "join_sortmerge", "join_outer", "join_semi_anti",
    "join_theta_range", "join_asof", "join_interval",
    "agg_hash_count", "agg_multi", "agg_distinct", "agg_grouping_sets",
    "agg_global", "agg_ratio_of_total",
    "win_rank", "win_analytic", "win_frame",
    "sort_global", "topk", "set_union_intersect_except", "dedup_exact",
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_map_json",
    "text_tokenize", "text_bigram_freq", "dedup_minhash", "sim_search",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_stateful_dedup",
    "udf_scalar", "udf_grouped", "udaf", "udtf",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_contract_ops_in_first_50():
    """Every §2.B contract op — plus the two round-1 canonicalizer failures
    whose fixes need a driver-verified row — sits in the checked window."""
    first50 = set(list(QUERIES)[:50])
    must = set(CONTRACT_OPS) | {"fn_agg_collect", "multimodal_decode",
                                "sim_search_ann", "sim_search_ivf"}
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
