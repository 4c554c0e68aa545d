"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-3 driver window: the 21 ops with zero driver evidence from rounds
# 1-2 MUST sit in the first-50 window this round (VERDICT_r02 item 1), plus
# the flagship which stays in-window every round.
NEVER_CHECKED_R12 = [
    "text_decontaminate", "dedup_passage", "dedup_span_rolling",
    "sample_quality_weighted", "agg_heavy_hitters", "text_repetition_score",
    "rollup_time_hypertable", "ts_gap_fill", "win_ntile",
    "win_range_interval", "cdc_latest_by_key", "text_normalize",
    "scan_orc", "scan_partition_pruned", "sink_text_formatted",
    "agg_approx", "topk_per_group", "fn_bitwise",
    "sql_top_revenue_orders", "sql_revenue_by_nation", "stream_custom_state",
]


def test_driver_priority_covers_registry():
    """DRIVER_PRIORITY must list every registered op exactly once, and the
    registry dicts must come out in that order (the driver walks insertion
    order and stops at 50)."""
    assert sorted(DRIVER_PRIORITY) == sorted(QUERIES)
    assert list(QUERIES) == DRIVER_PRIORITY
    assert [n for n in ORACLES] == [n for n in DRIVER_PRIORITY if n in ORACLES]


def test_rotation_targets_in_first_50():
    """Round-3 rotation goal: every op that lacked driver evidence after
    round 2 sits in the checked window, and the flagship stays in it."""
    first50 = set(list(QUERIES)[:50])
    must = set(NEVER_CHECKED_R12) | {"text_bigram_freq"}
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
