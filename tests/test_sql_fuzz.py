"""Randomized cross-engine fuzz of the composite-SQL suite.

The sql_* ops run the SAME SQL text on Spark and DuckDB, so any seeded
random database is a free oracle trial: generate small tables with NULL
spikes, negative/zero/extreme numerics, duplicate keys, and timestamp
ties, then require the row-for-row match the driver requires on the real
fixture. This hunts the failure classes a fixed fixture can't reach —
float boundary rows (Q17's row-vs-average threshold), empty filter
results, NULL propagation through join keys and aggregates, and year()
edges — across engines, not just within one.

Seeds are fixed (deterministic CI); each trial writes a self-contained
fixture directory so `tables.load` and the DuckDB view registration see
identical bytes.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import run_compare

SQL_OPS = (
    "sql_pricing_summary",
    "sql_top_revenue_orders",
    "sql_revenue_by_nation",
    "sql_volume_shipping",
    "sql_market_share",
    "sql_small_qty_revenue",
    "sql_waiting_suppliers",
    "sql_customer_distribution",
    "sql_promising_customers",
    "sql_large_volume_customers",
    "sql_promo_part_suppliers",
    "sql_priority_pipeline",
    "sql_discounted_revenue",
    "sql_top_supplier",
    "sql_forecast_revenue",
    "sql_returned_items",
    "sql_product_profit",
)

_SRC = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
_SEEDS = (7, 23, 1031)


def _ts_array(rng, n, year_lo=1990, year_hi=2031):
    """Second-precision timestamps (epoch micros), with deliberate ties."""
    secs = rng.integers(
        int(np.datetime64(f"{year_lo}-01-01").astype("datetime64[s]").astype(int)),
        int(np.datetime64(f"{year_hi}-01-01").astype("datetime64[s]").astype(int)),
        n,
    )
    # force ~10% exact ties onto one boundary-ish instant
    tie = secs[0]
    secs[rng.random(n) < 0.1] = tie
    return pa.array(secs * 1_000_000, type=pa.timestamp("us"))


def _spike(rng, arr: pa.Array, p=0.12) -> pa.Array:
    mask = rng.random(len(arr)) < p
    return pa.array(
        [None if m else v for m, v in zip(mask, arr.to_pylist())],
        type=arr.type,
    )


def _gen_dir(base: str, seed: int) -> str:
    rng = np.random.default_rng(seed)
    d = os.path.join(base, f"fuzz_{seed}")
    os.makedirs(d, exist_ok=True)

    n_nat, n_cust, n_supp, n_part = 25, 40, 15, 30
    n_ord, n_li = 120, 400

    def write(name, table):
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(
            ["AMERICA", "ASIA", "MIDDLE EAST", "EUROPE", "AFRICA"]
        ),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)]),
        "n_regionkey": pa.array(
            rng.integers(0, 5, n_nat), pa.int32()
        ),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, n_nat, n_cust), pa.int32()),
        "c_acctbal": _spike(rng, pa.array(
            np.round(rng.uniform(-1000, 10000, n_cust), 2))),
        "c_mktsegment": pa.array(
            rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust)
        ),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, n_nat, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-100, 5000, n_supp), 2)),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        # ~1/3 of names carry the 'gear' token so Q9's LIKE filter is
        # non-vacuous on the fuzz DB (and 2/3 exercise the negative side)
        "p_name": pa.array([
            f"part {i} gear" if i % 3 == 0 else f"part {i}"
            for i in range(n_part)
        ]),
        "p_brand": pa.array(
            [f"Brand#{rng.integers(1, 6)}" for _ in range(n_part)]
        ),
        "p_type": pa.array(
            rng.choice(["PROMO", "ECONOMY", "STANDARD"], n_part)
        ),
        "p_size": pa.array(rng.integers(1, 50, n_part), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(100, 2000, n_part), 2)
        ),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.integers(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord)),
        "o_totalprice": pa.array(np.round(rng.uniform(0, 50000, n_ord), 2)),
        "o_orderdate": _ts_array(rng, n_ord),
        "o_orderpriority": _spike(rng, pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord))),
    }))
    # quantities include zeros and negatives — Q17's threshold comparison
    # must agree on EVERY boundary; prices include exact-tie duplicates
    qty = np.round(rng.uniform(-5, 60, n_li), 2)
    qty[rng.random(n_li) < 0.05] = 0.0
    price = np.round(rng.uniform(0, 10000, n_li), 2)
    price[rng.random(n_li) < 0.08] = 1234.56
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(1, n_ord + 1, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": _spike(rng, pa.array(qty)),
        "l_extendedprice": _spike(rng, pa.array(price), p=0.06),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": _ts_array(rng, n_li),
    }))
    # tables the SQL suite never touches: copy the real fixture bytes so
    # the DuckDB view registration (which binds every table) still works
    for t in ("events", "documents", "embeddings"):
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    return d


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sql_fuzz"))
    return [_gen_dir(base, s) for s in _SEEDS]


@pytest.mark.parametrize("name", SQL_OPS)
def test_sql_op_matches_oracle_on_random_db(spark, fuzz_dirs, name):
    for d in fuzz_dirs:
        run_compare(spark, name, d)


# Every oracle-checked op whose inputs are ONLY the randomized TPC-H
# tables (discovered by scanning each op's load() calls) joins the same
# trials: deterministic-tie-break claims, NULL-key joins, and boundary
# comparisons all get exercised on data the fixed fixture can't produce.
RELATIONAL_OPS = (
    "scan_parquet", "project_select", "filter_pred",
    "join_broadcast", "join_sortmerge", "join_outer", "join_semi_anti",
    "join_skew_salted", "join_bucketed",
    "agg_hash_count", "agg_multi", "agg_distinct", "agg_grouping_sets",
    "agg_global", "agg_ratio_of_total", "agg_pivot", "agg_percentile",
    "agg_mode", "agg_unpivot", "agg_corr_stats", "agg_quantile_bins",
    "agg_kmv_distinct", "agg_approx_exact",
    "win_rank", "win_frame", "win_ntile",
    "sort_global", "topk", "topk_per_group",
    "set_union_intersect_except", "dedup_exact", "dedup_levenshtein",
    "fn_string", "fn_date", "fn_math", "fn_conditional", "fn_bitwise",
    "fn_agg_collect", "fn_nested",
    "hist_numeric", "sample_hash", "sample_stratified", "dq_expectations",
    "profile_columns", "analytics_pareto_topk", "analytics_rfm",
    "graph_pagerank", "sort_zorder_layout",
)


@pytest.mark.parametrize("name", RELATIONAL_OPS)
def test_relational_op_matches_oracle_on_random_db(spark, fuzz_dirs, name):
    for d in fuzz_dirs:
        run_compare(spark, name, d)


# ---------------------------------------------------------------------------
# documents / events / embeddings fuzz: the text, dedup, analytics, and
# similarity families on random corpora — duplicate texts (verbatim
# collapse), empty and single-word docs, NULL text/lang/ts/type spikes,
# timestamp ties, malformed JSON props, zero and duplicate vectors.

_VOCAB = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup alpha beta gamma delta rook pawn née "
    "tokyo zürich data row "
    # longer than bpe.PRETOK_MAX: exercises the bounded-quantifier
    # chunking (24+21 chars) in every randomized doc-op trial, not just
    # the fixed adversarial fixture
    "pneumonoultramicroscopicsilicovolcanoconiosis "
    # past-ASCII block (round-12): real multilingual content so the
    # byte-level BPE family's whole point — every script budgets to real
    # ids — is fuzzed, not just fixture-pinned. Mixed case (byte ops are
    # case-preserving), Cyrillic, Greek (lowercase only — uppercase
    # final-sigma casefold is a documented engine divergence), CJK, kana,
    # an emoji token, and a >PRETOK_MAX unicode letter run that only the
    # byte pre-tokenizer chunks (char-level treats CJK as single-char
    # pre-tokens)
    "Привет мир κόσμος δεδομένα 世界 汉字处理 日本語テキスト données "
    "Zürich 🙂 "
    "поисковаяоптимизацияидлинноеслово "
    # round-13 (VERDICT task 6): RTL with combining marks (Arabic harakat,
    # Hebrew niqqud — the marks are \p{M}, so the pre-tokenizer emits them
    # as single-char tokens between letter runs, identically in both
    # engines), emoji-ZWJ sequences (the ZWJ is a zero-width joiner the
    # byte tokenizer sees as its own 3-byte pre-token), a regional-
    # indicator flag pair, and astral-plane text (4-byte UTF-8: math
    # script, Gothic) — all caseless, so lower() is inert and the known
    # casefold divergences stay out of play
    "النَّصُّ عَرَبِيٌّ עִבְרִית שָׁלוֹם "
    "👨‍👩‍👧‍👦 🏳️‍🌈 🇺🇳 "
    "𝒽𝑒𝓁𝓁𝑜 𝔀𝓸𝓻𝓭 𐍈𐌰𐌹𐌷𐍄𐍃 "
    # round-13: sentence terminators so text_sentence_split's fuzz trials
    # actually segment (tokens ending in ./!/? create a boundary whenever
    # the next token follows with a space; mid-token dots must NOT split)
    "done. ends! maybe? wait... mr.abbrev v1.2.3 e.g."
).split()


def _gen_corpus_dir(base: str, seed: int) -> str:
    rng = np.random.default_rng(seed + 900)
    d = os.path.join(base, f"fuzz_corpus_{seed}")
    os.makedirs(d, exist_ok=True)

    n_doc, n_evt, n_vec, dim = 120, 400, 60, 64

    def write(name, table):
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

    texts: list = []
    for i in range(n_doc):
        r = rng.random()
        if r < 0.10 and texts:  # verbatim duplicate of an earlier doc
            texts.append(texts[rng.integers(0, len(texts))])
        elif r < 0.13:
            texts.append("")  # empty doc
        elif r < 0.14:
            texts.append(" \t  ")  # whitespace-only (0 words, 0 lines)
        elif r < 0.18:
            texts.append(str(rng.choice(_VOCAB)))  # single word, no gram
        elif r < 0.24:
            # MULTI-LINE document with Gopher-rule shapes (r15): bullet
            # starts, ellipsis ends, '#'/'...' symbols, blank lines — the
            # only '\n' content in the corpus, exercising every op's line
            # handling (newline is in BOTH engines' \s and is the safe
            # cross-engine whitespace; \x0B would NOT be — Java \s has it,
            # RE2 \s does not)
            lines = []
            for _ in range(int(rng.integers(2, 7))):
                toks = list(rng.choice(_VOCAB, int(rng.integers(1, 8))))
                lr = rng.random()
                if lr < 0.3:
                    toks.insert(0, str(rng.choice(["-", "*", "•"])))
                elif lr < 0.45:
                    toks.append(str(rng.choice(["so...", "wait…", "#tag"])))
                elif lr < 0.5:
                    toks = []  # blank line
                lines.append(" ".join(toks))
            texts.append("\n".join(lines))
        elif r < 0.32 and texts:
            # PARTIAL overlap: splice a contiguous token window from an
            # earlier doc between fresh tokens — exercises the substring
            # ops' non-verbatim chaining path (anchor runs at arbitrary
            # offsets), which verbatim duplicates alone never reach
            src = texts[rng.integers(0, len(texts))].split()
            take = min(len(src), int(rng.integers(8, 25)))
            off = int(rng.integers(0, max(1, len(src) - take + 1)))
            texts.append(" ".join(
                list(rng.choice(_VOCAB, int(rng.integers(0, 6))))
                + src[off:off + take]
                + list(rng.choice(_VOCAB, int(rng.integers(0, 6))))
            ))
        else:
            k = int(rng.integers(3, 40))
            texts.append(" ".join(rng.choice(_VOCAB, k)))
    text_arr = _spike(rng, pa.array(texts), p=0.08)
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": text_arr,
        "lang": _spike(rng, pa.array(
            rng.choice(["en", "de", "zh", "fr", "es"], n_doc))),
        "source": pa.array(
            [f"src{rng.integers(0, 8)}" for _ in range(n_doc)]
        ),
        "n_chars": pa.array(
            [None if t is None else len(t) for t in text_arr.to_pylist()],
            pa.int64(),
        ),
    }))

    props = [
        None if rng.random() < 0.08
        else ("{not json" if rng.random() < 0.05
              else '{"k": %d}' % rng.integers(0, 100))
        for _ in range(n_evt)
    ]
    write("events", pa.table({
        "event_id": pa.array(range(1, n_evt + 1), pa.int64()),
        "ts": _spike(rng, _ts_array(rng, n_evt, 2023, 2025), p=0.08),
        "user_id": pa.array(rng.integers(1, 40, n_evt), pa.int64()),
        "event_type": _spike(rng, pa.array(
            rng.choice(["view", "click", "purchase", "signup", "error"],
                       n_evt))),
        "value": _spike(rng, pa.array(
            np.round(rng.uniform(-10, 500, n_evt), 3))),
        "props": pa.array(props),
    }))

    vecs = rng.standard_normal((n_vec, dim)).astype(np.float32)
    vecs[7] = vecs[3]  # exact duplicate pair
    # zero-norm verbatim twins: numpy cosine is NaN (NULL via Arrow) where
    # DuckDB's list_cosine_similarity returns -1.0 — _cos_pandas adopts
    # the -1.0 convention and this pair keeps every cosine consumer
    # (sim_search/ANN re-rank, dedup_embedding, dedup_semantic) pinned
    vecs[11] = 0.0
    vecs[12] = 0.0
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 5, n_vec), pa.int32()),
    }))

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    return d


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("corpus_fuzz"))
    return [_gen_corpus_dir(base, s) for s in _SEEDS[:2]]


DOC_OPS = (
    "text_fingerprint", "text_lang_id", "text_pii_scrub", "text_tfidf",
    "text_quality_score", "text_token_count", "text_normalize",
    "text_tokenize", "text_bigram_freq", "text_repetition_score",
    "text_unigram_logprob", "text_ngram_novelty", "text_decontaminate",
    "text_lm_perplexity",
    "text_bpe_tokenize", "bpe_train", "text_bpe_tokenize_trained",
    "text_bpe_tokenize_bytes", "bpe_train_bytes",
    "text_bpe_tokenize_trained_bytes",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_minhash",
    "dedup_containment", "dedup_substring", "dedup_substring_scrub",
    "dedup_passage", "dedup_span_rolling", "dedup_cluster_cc",
    "sample_quality_weighted", "sample_mix_rebalance",
    "sample_cap_per_source", "sample_split_train_eval",
    "sample_temperature", "sample_dsir", "quality_classifier_score",
    "text_gopher_rules", "dedup_lines_global", "curate_url_dedup",
    "curate_domain_filter",
    "agg_ngram_counts", "agg_ngram_df_sketch", "text_novelty_sketch",
    "text_chunk_overlap", "decontaminate_bloom", "graph_triangle_count",
    "agg_heavy_hitters",
    "pipeline_corpus_clean", "pipeline_pretrain_e2e", "text_html_extract",
    "text_sentence_split",
    "pipeline_seq_pack", "fn_array", "fn_url", "udf_scalar", "udtf",
    "multimodal_meta", "multimodal_decode", "multimodal_frame_sample",
)

EVT_OPS = (
    "analytics_pattern_match", "analytics_transition_matrix",
    "analytics_cohort_retention", "analytics_funnel",
    "analytics_sessionize", "analytics_anomaly_extremes",
    "analytics_active_users_7d", "agg_bitmap_distinct",
    "join_null_safe", "join_theta_range", "join_asof", "join_interval",
    "join_asof_tolerance", "win_analytic", "win_range_interval",
    "cdc_latest_by_key", "cdc_scd2", "fn_map_json", "udf_grouped",
    "udaf", "stream_tumbling", "stream_sliding", "stream_session",
    "rollup_time_hypertable", "ts_gap_fill", "ts_motif_match",
    "rollup_sketch_hierarchy",
)

EMB_OPS = ("dedup_embedding", "sim_search", "sim_search_ann",
           "ivf_centroids", "sim_search_ivf", "pq_codebooks",
           "sim_search_pq", "dedup_semantic")


@pytest.mark.parametrize("name", DOC_OPS)
def test_doc_op_matches_oracle_on_random_corpus(spark, corpus_dirs, name):
    for d in corpus_dirs:
        run_compare(spark, name, d)


@pytest.mark.parametrize("name", EVT_OPS)
def test_event_op_matches_oracle_on_random_events(spark, corpus_dirs, name):
    for d in corpus_dirs:
        run_compare(spark, name, d)


@pytest.mark.parametrize("name", EMB_OPS)
def test_embedding_op_matches_oracle_on_random_vectors(
    spark, corpus_dirs, name
):
    for d in corpus_dirs:
        run_compare(spark, name, d)


# Writers/sinks and the true streaming-replay ops: eager (each invocation
# writes scratch or drives a real incremental query), so one seed keeps
# the sweep affordable — the NULL/tie/duplicate shapes still flow through
# the actual write→read-back and micro-batch paths.
WRITER_OPS = (
    "sink_partitioned", "sink_text_formatted", "scan_text",
    "scan_csv_json", "scan_partition_pruned", "scan_orc",
    "scan_schema_evolution", "merge_upsert", "snapshot_time_travel",
    "compact_small_files", "multimodal_resize", "scan_binary_files",
    "pipeline_dataset_export", "join_bloom_filtered",
    "dedup_cluster_keep_best", "dedup_cluster_downweight",
    "sink_python_datasource",
)
# With these, EVERY oracle-checkable op is fuzzed; the only exclusions
# are rows-only-by-design (agg_approx — sim_search_ivf gained a full
# oracle in round 8) and the two self-generating Python sources whose
# output is data-independent.

STREAM_REPLAY_OPS = (
    "stream_custom_state", "stream_watermark_late",
    "stream_stateful_dedup", "stream_stream_join",
    "stream_file_sink", "stream_foreachbatch_upsert",
    "stream_kmv_distinct", "stream_minhash_dedup", "stream_token_budget",
)


@pytest.mark.parametrize("name", WRITER_OPS)
def test_writer_op_matches_oracle_on_random_db(spark, fuzz_dirs,
                                               corpus_dirs, name):
    run_compare(spark, name, fuzz_dirs[0])
    run_compare(spark, name, corpus_dirs[0])


@pytest.mark.parametrize("name", STREAM_REPLAY_OPS)
def test_stream_replay_op_matches_oracle_on_random_events(
    spark, corpus_dirs, name
):
    run_compare(spark, name, corpus_dirs[0])


# Self-generating Python sources: their output is data-independent (the
# source synthesizes its own rows), so randomized input tables cannot
# exercise anything the fixed run does not.
@pytest.fixture(scope="module")
def null_source_corpus(tmp_path_factory):
    """Five documents with NULL source / NULL text — the one hole the
    random corpora never produce (source is always populated there). The
    URL-stage ops synthesize their URL from source, so a NULL source must
    null the url/canonical/blocked chain identically on both engines and
    land kept = FALSE (Spark when/coalesce vs SQL NULL-strict concat)."""
    import duckdb

    d = str(tmp_path_factory.mktemp("null_source"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
        [
            (0, "the quick brown fox with that have be to of", "en", None, 44),
            (1, None, None, "src1", None),
            (2, "the and that have with lines\nof be to", "en", "src1", 38),
            (3, "the and that have with lines\nof be to", "en", "src4", 38),
            (4, None, None, None, None),
        ],
    )
    con.execute(f"COPY docs TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"), os.path.join(d, f"{t}.parquet")
        )
    return d


@pytest.mark.parametrize(
    "name", ["curate_url_dedup", "curate_domain_filter"]
)
def test_url_ops_null_source(spark, null_source_corpus, name):
    run_compare(spark, name, null_source_corpus)


_FUZZ_EXEMPT = frozenset(
    {"scan_python_datasource", "scan_python_arrow", "stream_python_source"}
)


def test_fuzz_matrix_closure():
    """Every oracle-checked op must sit in one of the fuzz sweeps above
    (or the documented exemption set) — a future op cannot silently skip
    the randomized trials, and a stale list entry cannot outlive its op."""
    from erlang_mapreduce_spark.registry import ORACLES

    listed = (set(SQL_OPS) | set(RELATIONAL_OPS) | set(DOC_OPS)
              | set(EVT_OPS) | set(EMB_OPS) | set(WRITER_OPS)
              | set(STREAM_REPLAY_OPS))
    missing = set(ORACLES) - listed - _FUZZ_EXEMPT
    assert not missing, f"oracle ops missing from fuzz matrix: {sorted(missing)}"
    stale = listed - set(ORACLES)
    assert not stale, f"fuzz lists name non-oracle ops: {sorted(stale)}"
