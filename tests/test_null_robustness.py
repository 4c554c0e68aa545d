"""NULL-spiked correctness sweep: engine and oracle must agree when the
nullable VALUE columns actually carry NULLs.

The driver fixtures contain no NULLs, so an engine/oracle divergence in
NULL handling (Spark's concat_ws skipping NULLs where DuckDB returns
NULL, a UDF crashing on a None payload, a filter silently dropping NULL
rows on one side only) would pass every regular check and detonate on
real data. This sweep rebuilds the test fixtures with a deterministic
10% NULL spike on value-ish columns (keys stay intact) and re-runs the
exact oracle comparison for every operator that consumes a spiked
column. Divergences this originally caught and now pins:

- multimodal_decode / multimodal_resize crashed their pandas UDF on a
  None payload (now: NULL payloads dropped identically on both sides);
- text_fingerprint fingerprinted NULL text as md5('') while the oracle
  yielded NULL (now: drop-the-row on both sides).

File-scan ops (scan_text / scan_csv_json) are exempt: their oracles
read driver-contract fixture paths keyed to the real sf dirs, so they
cannot be pointed at a synthetic fixture directory.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle import run_compare

_SPIKES = {
    "documents": {
        "text": "doc_id % 10 = 3",
        "lang": "doc_id % 10 = 4",
        "source": "doc_id % 10 = 5",
    },
    "events": {
        "value": "event_id % 10 = 3",
        "props": "event_id % 10 = 4",
        "event_type": "event_id % 10 = 5",
        # a NULL event timestamp: pins analytics_pattern_match's
        # drop-the-row (and every other ts consumer's NULL handling)
        "ts": "event_id % 10 = 6",
    },
    "supplier": {"s_name": "s_suppkey % 10 = 3"},
    "customer": {"c_acctbal": "c_custkey % 10 = 3"},
    "lineitem": {
        "l_quantity": "l_orderkey % 10 = 3",
        "l_comment": "l_orderkey % 10 = 4",
        # a NULL partition value: pins compact_small_files' hive-default
        # dir mapping (__HIVE_DEFAULT_PARTITION__ ↔ None)
        "l_returnflag": "l_orderkey % 10 = 5",
    },
    "orders": {
        "o_comment": "o_orderkey % 10 = 3",
        # a NULL group key: pins agg_kmv_distinct's NULL-group handling
        # (SQL GROUP BY keeps it; pandas groupby must not drop it)
        "o_orderpriority": "o_orderkey % 10 = 4",
    },
    "part": {"p_comment": "p_partkey % 10 = 3"},
}

_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Operators whose inputs include a spiked column AND whose oracle runs on
# the registered table views (no fixture-path oracles, no streaming
# replay — stream ops' NULL behavior is covered by the batch twins of the
# same expressions).
_OPS = (
    "text_fingerprint",
    "text_normalize",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_count",
    "text_bpe_tokenize",
    "bpe_train",
    "text_bpe_tokenize_trained",
    "text_lang_id",
    "text_tfidf",
    "text_unigram_logprob",
    "text_repetition_score",
    "text_decontaminate",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_containment",
    "dedup_passage",
    "dedup_span_rolling",
    "dedup_levenshtein",
    "sample_quality_weighted",
    "sample_mix_rebalance",
    "sample_temperature",
    "ts_motif_match",
    "stream_minhash_dedup",
    "rollup_sketch_hierarchy",
    "sample_cap_per_source",
    "agg_ngram_counts",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frame_sample",
    "fn_map_json",
    "agg_hash_count",
    "analytics_sessionize",
    "analytics_anomaly_extremes",
    "cdc_scd2",
    "join_asof_tolerance",
    "sample_split_train_eval",
    "profile_columns",
    "text_ngram_novelty",
    "agg_ngram_df_sketch",
    "text_novelty_sketch",
    "text_chunk_overlap",
    "decontaminate_bloom",
    "agg_kmv_distinct",
    "graph_triangle_count",
    "merge_upsert",
    "fn_nested",
    "compact_small_files",
    "analytics_pattern_match",
    "analytics_transition_matrix",
    "scan_binary_files",
    "fn_url",
)


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    d = str(tmp_path_factory.mktemp("null_fixture"))
    for t in _TABLES:
        cols = duckdb.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
        ).fetchall()
        sel = []
        for c, *_ in cols:
            cond = _SPIKES.get(t, {}).get(c)
            sel.append(
                f"CASE WHEN {cond} THEN NULL ELSE {c} END AS {c}"
                if cond
                else c
            )
        duckdb.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.mark.parametrize("name", _OPS)
def test_op_matches_oracle_with_nulls(spark, null_dir, name):
    run_compare(spark, name, null_dir)


@pytest.fixture(scope="module")
def null_key_dir(tmp_path_factory):
    """A fixture with NULLs in a KEY column (orders.o_orderkey), which the
    main sweep deliberately never spikes — only for ops whose contract
    must survive NULL keys (scan_schema_evolution's generation split)."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    d = str(tmp_path_factory.mktemp("null_key_fixture"))
    for t in _TABLES:
        sel = "*"
        if t == "orders":
            sel = (
                "CASE WHEN o_custkey % 10 = 7 THEN NULL "
                "ELSE o_orderkey END AS o_orderkey, * EXCLUDE (o_orderkey)"
            )
        duckdb.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


def test_schema_evolution_null_keys(spark, null_key_dir):
    """NULL o_orderkey rows must survive the two-generation split (they
    ride with generation 2) instead of vanishing from both write filters —
    engine and oracle agree on their bucket."""
    run_compare(spark, "scan_schema_evolution", null_key_dir)
