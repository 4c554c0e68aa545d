"""t2 mirror: every oracle-checkable operator vs DuckDB at sf0.001."""

from __future__ import annotations

import pytest

import erlang_mapreduce_spark  # noqa: F401 — populates registry
from erlang_mapreduce_spark.registry import DRIVER_PRIORITY, ORACLES, QUERIES

from .oracle import assert_driver_hashable, driver_canon, run_compare

# Round-14 driver window (VERDICT_r13 task 3): dedup_semantic and
# sample_dsir (new in r14, zero evidence) MUST lead, then the 35
# r09/r10-evidence ops left over after the r13 window (the oldest
# evidence remaining), then the flagship at slot 38. The remaining 12
# slots take the head of the r11-evidence block. After r14, no op's
# driver evidence predates r11.
R14_PRIORITY = [
    "dedup_semantic", "sample_dsir",
    "agg_distinct", "agg_grouping_sets", "agg_global",
    "agg_ratio_of_total", "win_rank", "win_analytic", "win_frame",
    "sort_global", "topk", "set_union_intersect_except", "dedup_exact",
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_map_json",
    "text_tokenize", "sim_search", "udf_scalar", "udf_grouped", "udaf",
    "graph_triangle_count", "pq_codebooks", "sim_search_pq",
    "sample_temperature", "stream_kmv_distinct",
    "sql_customer_distribution", "sql_promising_customers",
    "ts_motif_match", "stream_minhash_dedup", "rollup_sketch_hierarchy",
    "dedup_substring", "dedup_substring_scrub", "agg_approx",
    "sim_search_ivf",
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
    """Round-14 rotation goal: the two r14-new zero-evidence ops and the 35
    leftover r09/r10-evidence ops LEAD the checked window, the flagship
    holds slot 38, and r11-evidence ops fill the rest EXACTLY — every
    slot accounted for, so a list edit cannot silently push a priority op
    past position 50 (the round-9 review caught the section comments
    drifting exactly this way)."""
    order = list(QUERIES)
    assert order[: len(R14_PRIORITY)] == R14_PRIORITY
    first50 = order[:50]
    # the remaining window slots must all be r11-evidence ops: no
    # zero-evidence or priority op may be displaced below the cutoff
    R11_EVIDENCE_HEAD = {
        "text_bpe_tokenize", "bpe_train", "text_bpe_tokenize_trained",
        "udtf", "fn_agg_collect", "multimodal_decode",
        "sql_pricing_summary", "stream_stream_join", "stream_tumbling",
        "stream_sliding", "stream_session", "text_decontaminate",
    }
    tail = set(first50[len(R14_PRIORITY):])
    assert len(first50) == 50 and tail <= R11_EVIDENCE_HEAD, (
        sorted(tail - R11_EVIDENCE_HEAD)
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
