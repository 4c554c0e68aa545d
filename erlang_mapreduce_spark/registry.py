"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2.B registers here via the ``@query``
decorator: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle string. ``__spark_entry__``
re-exports these as ``queries()`` / ``oracle_sql()``.

Hash-safety conventions (the driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):

- Alias every computed column identically in Spark and SQL.
- Sums/avgs of doubles are order-dependent in IEEE float; both sides
  therefore sum via DECIMAL (exact, order-independent) and cast the result
  back to DOUBLE — see ``exact.py``. Ties in decimal rounding cannot occur
  for non-dyadic boundaries, so the per-row casts agree bit-for-bit.
- Transcendentals (ln/pow/stddev) may differ in the last ulp between JVM
  libm and DuckDB's — round those to 6 decimals on both sides.
- Timestamps are emitted as formatted strings (UTC session tz) to dodge
  engine-specific timestamp transport.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as operator ``name``; ``oracle`` is the DuckDB SQL
    equivalent (None ⇒ rows-only check, for non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# The driver's per-round correctness pass walks ``queries()`` in dict
# insertion order and stops after 50 ops. With 184 registered ops, insertion
# order therefore decides which ops get a driver-verified row each round, so
# this list rotates round-over-round to spread driver evidence across the
# whole registry; tests/test_correctness.py re-proves the whole registry
# locally each run (artifact CORRECTNESS_local_full.json).
#
# Round-16 window (this ordering), oldest-evidence-first policy:
#   1-2:   curate_url_dedup + curate_domain_filter, NEW in r16 (zero
#          driver evidence).
#   3-41:  the 39 r12-evidence ops (the oldest evidence remaining
#          after r15 cleared the r11 block — r15 VERDICT task 4).
#   42:    text_bigram_freq (the flagship, in-window every round).
#   43-50: the first 8 of the r13-evidence block (including
#          pipeline_pretrain_e2e, so the driver re-proves the
#          newly composed 15-stage capstone this round).
# After r16: no op's driver evidence predates r13.
DRIVER_PRIORITY: list[str] = [
    # --- 1-2: NEW in r16, zero driver evidence ---
    "curate_url_dedup",
    "curate_domain_filter",
    # --- 3-41: the 39 r12-evidence ops (oldest remaining) ---
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
    # --- 42: the flagship (in-window every round per policy) ---
    "text_bigram_freq",
    # --- 43-50: the head of the r13-evidence block ---
    "text_html_extract",
    "pipeline_pretrain_e2e",
    "sql_forecast_revenue",
    "sql_returned_items",
    "sql_product_profit",
    "text_sentence_split",
    "text_lm_perplexity",
    "text_pii_scrub",
    # --- 51+: r13-evidence remainder ---
    "text_tfidf",
    "text_quality_score",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_cluster_cc",
    "dedup_levenshtein",
    "join_skew_salted",
    "join_bucketed",
    "join_null_safe",
    "pipeline_dataset_export",
    "pipeline_corpus_clean",
    "agg_pivot",
    "agg_percentile",
    "sample_hash",
    "sample_stratified",
    "hist_numeric",
    "agg_corr_stats",
    "agg_mode",
    "fn_conditional",
    "agg_unpivot",
    "scan_parquet",
    "agg_ngram_df_sketch",
    "text_novelty_sketch",
    "text_chunk_overlap",
    "decontaminate_bloom",
    "agg_kmv_distinct",
    "scan_text",
    "scan_csv_json",
    "sink_partitioned",
    "project_select",
    "filter_pred",
    "join_broadcast",
    "join_sortmerge",
    "join_outer",
    "join_semi_anti",
    "join_theta_range",
    "join_asof",
    "join_interval",
    "agg_hash_count",
    "agg_multi",
    # --- r14 evidence ---
    "dedup_semantic",
    "sample_dsir",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_global",
    "agg_ratio_of_total",
    "win_rank",
    "win_analytic",
    "win_frame",
    "sort_global",
    "topk",
    "set_union_intersect_except",
    "dedup_exact",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_map_json",
    "text_tokenize",
    "sim_search",
    "udf_scalar",
    "udf_grouped",
    "udaf",
    "graph_triangle_count",
    "pq_codebooks",
    "sim_search_pq",
    "sample_temperature",
    "stream_kmv_distinct",
    "sql_customer_distribution",
    "sql_promising_customers",
    "ts_motif_match",
    "stream_minhash_dedup",
    "rollup_sketch_hierarchy",
    "dedup_substring",
    "dedup_substring_scrub",
    "agg_approx",
    "sim_search_ivf",
    "text_bpe_tokenize",
    "bpe_train",
    "text_bpe_tokenize_trained",
    "udtf",
    "fn_agg_collect",
    "multimodal_decode",
    "sql_pricing_summary",
    "stream_stream_join",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "text_decontaminate",
    # --- r15 evidence (freshest) ---
    "quality_classifier_score",
    "text_gopher_rules",
    "dedup_lines_global",
    "dedup_passage",
    "dedup_span_rolling",
    "sample_quality_weighted",
    "agg_heavy_hitters",
    "text_repetition_score",
    "rollup_time_hypertable",
    "ts_gap_fill",
    "win_ntile",
    "win_range_interval",
    "cdc_latest_by_key",
    "text_normalize",
    "scan_orc",
    "scan_partition_pruned",
    "sink_text_formatted",
    "topk_per_group",
    "fn_bitwise",
    "sql_top_revenue_orders",
    "sql_revenue_by_nation",
    "stream_custom_state",
    "dedup_minhash",
    "stream_watermark_late",
    "stream_stateful_dedup",
    "sim_search_ann",
    "sample_mix_rebalance",
    "sample_cap_per_source",
    "agg_ngram_counts",
    "text_unigram_logprob",
    "analytics_cohort_retention",
    "analytics_funnel",
    "dedup_cluster_keep_best",
    "stream_file_sink",
    "analytics_sessionize",
    "analytics_anomaly_extremes",
    "cdc_scd2",
    "join_asof_tolerance",
    "sample_split_train_eval",
    "text_bpe_tokenize_bytes",
    "sql_large_volume_customers",
    "sql_promo_part_suppliers",
    "agg_approx_exact",
    "stream_token_budget",
    "bpe_train_bytes",
    "text_bpe_tokenize_trained_bytes",
    "sql_priority_pipeline",
    "sql_discounted_revenue",
    "sql_top_supplier",
]


# Ops whose query function executes work eagerly when CALLED (streaming
# replay with awaitTermination, partitioned sinks that write+read back,
# iterative CC, driver-side index/sketch training): building their final
# DataFrame runs the whole job, and that DataFrame's plan is a memory or
# local scan. Plan-inspection tooling (tools/explain_audit.py, the plan
# sweep in tests/test_plans.py) must skip them — shared here so the two
# consumers cannot drift.
EAGER_OPS: frozenset[str] = frozenset(
    {
        "stream_watermark_late",
        "stream_stateful_dedup",
        "stream_custom_state",
        "stream_stream_join",
        "stream_file_sink",
        "sink_partitioned",
        "sink_text_formatted",
        "dedup_cluster_cc",
        "dedup_cluster_keep_best",
        "pipeline_dataset_export",
        "sim_search_ivf",
        "agg_heavy_hitters",
        "compact_small_files",
        "stream_foreachbatch_upsert",
        "stream_kmv_distinct",
        "stream_minhash_dedup",
        "scan_schema_evolution",
        "join_bloom_filtered",
        "snapshot_time_travel",
        "scan_binary_files",
        "stream_python_source",
        "dedup_cluster_downweight",
        "stream_token_budget",
        "sink_python_datasource",
        "pipeline_pretrain_e2e",
        "dedup_semantic",  # driver-side capped centroid training at build
    }
)


def finalize_order() -> None:
    """Rebuild QUERIES/ORACLES in DRIVER_PRIORITY order (in place, since
    callers hold references to the dicts). Unlisted ops keep their relative
    registration order after all listed ones. Called once from
    ``erlang_mapreduce_spark.__init__`` after every module has registered."""
    rank = {n: i for i, n in enumerate(DRIVER_PRIORITY)}
    for d in (QUERIES, ORACLES):
        ordered = sorted(d, key=lambda n: (rank.get(n, len(rank)),))
        snapshot = dict(d)
        d.clear()
        for n in ordered:
            d[n] = snapshot[n]
