#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a ``noop`` format write (full physical
execution, no driver collect — collecting large results is the reference's
own anti-pattern, mapreduce.erl:98). SparkSession startup and a tiny warmup
action are excluded, mirroring the baseline's exclusion of its one-time
file-split phase (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from erlang_mapreduce_spark import QUERIES  # noqa: E402
from erlang_mapreduce_spark.ckpt import release_transient_storage  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402
from erlang_mapreduce_spark.tables import load  # noqa: E402

# Headline set: one per engine pillar (flagship text workload, scans feed in
# implicitly, hash-agg, ratio-of-total, broadcast + shuffle + as-of joins,
# window frames, top-k, exact & near dedup, similarity, text analysis,
# windowed events) plus the LLM-pipeline north-star ops (ngram dedup,
# connected components, tfidf, dataset export, heavy hitters,
# decontamination, passage dedup, ANN search) so their wall-times get
# round-over-round regression tracking. Names are SURVEY.md §2.B op ids.
HEADLINE = (
    "text_bigram_freq",
    "agg_hash_count",
    "join_sortmerge",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_cc",
    "text_tfidf",
    "pipeline_dataset_export",
    "agg_heavy_hitters",
    "sim_search_ann",
    "pipeline_seq_pack",
    "text_unigram_logprob",
    "analytics_sessionize",
    "profile_columns",
    "graph_pagerank",
    "compact_small_files",
    "text_ngram_novelty",
    "sql_market_share",
    "analytics_transition_matrix",
    # round-8 additions (sketch + search family) — tracked from BENCH_r08
    # on; BENCH files before r08 lack these keys, so cross-round totals
    # compare the shared subset
    "agg_ngram_df_sketch",
    "text_novelty_sketch",
    "decontaminate_bloom",
    "agg_kmv_distinct",
    "graph_triangle_count",
    "sim_search_ivf",
    "sim_search_pq",
    "ts_motif_match",
    # round-9 additions
    "dedup_substring",
    "dedup_substring_scrub",
    # round-11 additions (the real-BPE tokenizer family)
    "text_bpe_tokenize",
    "bpe_train",
    "text_bpe_tokenize_trained",
    # round-12 additions: the byte-level production tokenizer and the
    # ingest-time budget accounting built on it
    "text_bpe_tokenize_bytes",
    "stream_token_budget",
)

# Timed every run and recorded in BENCH_local_detail.json, but NOT printed
# in the official JSON line: the driver captures only a bounded (~2,000
# char) tail of stdout, and 43 query keys pushed the r8 line to 1,186
# chars — one more round of additions would overflow the capture exactly
# the way BENCH_r03 was lost. These ops rotated out of the official line
# because they have been flat for 4+ rounds (sub-second, alpha ≈ 0 class);
# their regression tracking continues via the detail artifact.
TRACKED_ONLY = (
    "agg_multi",
    "agg_ratio_of_total",
    "join_broadcast",
    "join_asof",
    "win_frame",
    "topk",
    "sim_search",
    "text_quality_score",
    "stream_tumbling",
    "text_decontaminate",
    "dedup_passage",
    "agg_ngram_counts",
    "analytics_cohort_retention",
    "analytics_funnel",
    "analytics_active_users_7d",
    # round-12 additions: TPC-H Q18/Q20 shapes (sql_market_share already
    # represents the SQL pillar in the official line) and the exact
    # companion of agg_approx (an evidence harness, not a 100 TB plan)
    "sql_large_volume_customers",
    "sql_promo_part_suppliers",
    "sql_priority_pipeline",
    "sql_discounted_revenue",
    "sql_top_supplier",
    "sink_python_datasource",
    "scan_python_arrow",
    "agg_approx_exact",
    # byte-level training twins: sample-bounded like bpe_train, and the
    # trained-bytes tokenize plan is text_bpe_tokenize_bytes's (already
    # in the official line) plus the bounded collect
    "bpe_train_bytes",
    "text_bpe_tokenize_trained_bytes",
    # round-13 additions: the raw-web front door, the capstone chain, the
    # three new TPC-H shapes (Q6/Q10/Q9), sentence segmentation, and the
    # bigram-LM perplexity gate
    "text_html_extract",
    "pipeline_pretrain_e2e",
    "sql_forecast_revenue",
    "sql_returned_items",
    "sql_product_profit",
    "text_sentence_split",
    "text_lm_perplexity",
    # round-14 additions: SemDeDup cluster-then-prune semantic dedup and
    # DSIR importance resampling
    "dedup_semantic",
    "sample_dsir",
)

# Timing methodology, recorded in the output so cross-round comparisons can
# normalize: r01 = single pass, r02 = best-of-2, r03-r13 = median-of-3
# consecutive passes, r14+ = median-of-5 INTERLEAVED passes (round-robin
# over the full op set, so a transient machine-level stall — GC, page
# cache eviction, a noisy neighbor on the shared 32-thread JVM — lands in
# one pass of MANY ops instead of poisoning 2 of one op's 3 consecutive
# passes; the r13 bench showed 7× pass spread on untouched ops under the
# consecutive scheme). Per-op spread is recorded as IQR (sorted[3] −
# sorted[1] of the 5 passes) in BENCH_local_detail.json.
METHODOLOGY = "median-of-5-interleaved"
N_PASSES = 5


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # Warmup: run the headline set once at the smallest SF to trigger JVM
    # class loading + whole-stage codegen for each plan shape, outside the
    # timed region (the baseline likewise excludes its one-time split phase,
    # BASELINE.md). Falls back to the bench dir if sf0.001 is absent.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    load(spark, sf_dir, "lineitem").limit(1).count()
    all_ops = HEADLINE + TRACKED_ONLY
    for name in all_ops:
        _force(QUERIES[name](spark, warm_dir))

    # CPU reference: a fixed pure-JVM whole-stage-codegen job (no I/O, no
    # Python) timed alongside the queries. The r14 adjudication found
    # round-over-round totals drift ~1.2-1.9x from AMBIENT machine speed
    # on this shared VM (identical code, isolated sessions, different
    # days) — dividing a round's total by its cpu_ref_sec removes that
    # factor before cross-round comparisons.
    ref_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_500_000_000).selectExpr("sum(id * 3 + 1)").collect()
        ref_ts.append(time.perf_counter() - t0)
    cpu_ref = round(sorted(ref_ts)[1], 3)

    passes: dict[str, list[float]] = {name: [] for name in all_ops}
    for _ in range(N_PASSES):
        for name in all_ops:
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, sf_dir))
            passes[name].append(round(time.perf_counter() - t0, 3))
            # Outside the timed region: free persisted/checkpointed blocks
            # the pass left behind, so every pass (and every query) starts
            # from identical executor-storage state — the BENCH_r03
            # 2×-cross-pass-variance fix (checkpoint blocks accumulated
            # across same-JVM invocations until eviction pressure).
            release_transient_storage()
    timings = {n: sorted(ts)[N_PASSES // 2] for n, ts in passes.items()}
    iqr = {
        n: round(sorted(ts)[3] - sorted(ts)[1], 3)
        for n, ts in passes.items()
    }

    # The driver captures only a bounded tail of stdout, so the official
    # line must stay COMPACT: medians only, HEADLINE ops only (TRACKED_ONLY
    # medians live in the detail artifact). Full per-pass detail goes to a
    # local artifact instead (BENCH_r03 lesson: the passes dict pushed the
    # line past the driver's tail capture and the round's official perf
    # record parsed as null).
    official = {k: timings[k] for k in HEADLINE}
    total = round(sum(official.values()), 3)
    # per-op spread as % of the median, so the official line carries the
    # instrument's error bar (r13 VERDICT task 2) in two scalars instead of
    # a line-busting dict
    spread_pct = sorted(
        round(100.0 * iqr[n] / timings[n], 1) if timings[n] > 0 else 0.0
        for n in HEADLINE
    )
    compact = {
        # r11 rename (was headline_queries_total_wall): the r9 basis change
        # shrank the summed set from 43 to 30 ops while keeping the key, so
        # raw cross-round value-vs-value reads showed a spurious ~30%
        # improvement. The op count now lives IN the key — any consumer
        # comparing totals across a basket change fails loudly on the key
        # mismatch instead of silently comparing different baskets.
        "metric": f"headline{len(official)}_total_wall",
        "value": total,
        "unit": "sec",
        "n_queries": len(official),
        "queries": official,
        "methodology": METHODOLOGY,
        "iqr_pct_med": spread_pct[len(spread_pct) // 2],
        "iqr_pct_max": spread_pct[-1],
        "cpu_ref_sec": cpu_ref,
        "sf": sf,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local_detail.json"
    )
    detail = {**compact, "tracked_only": {k: timings[k] for k in TRACKED_ONLY},
              "passes": passes, "iqr": iqr}
    # preserve per-op isolated re-timings (tools/isolated_timing.py,
    # "isolated") and the full-registry sweep (tools/registry_sweep.py,
    # "sweep"/"sweep_meta") across full-bench rewrites, so drift
    # adjudications and tail-op evidence stay next to the medians
    prev_sweep: dict[str, float] = {}
    try:
        with open(detail_path) as f:
            prev = json.load(f)
        for k in ("isolated", "sweep", "sweep_meta"):
            if k in prev:
                detail[k] = prev[k]
        if isinstance(prev.get("sweep"), dict):
            prev_sweep = dict(prev["sweep"])
    except (OSError, ValueError):
        pass

    # Full-registry sweep each bench run (r13 VERDICT task 6): the tail ops
    # outside HEADLINE+TRACKED_ONLY get one warmed timed pass; bench-set ops
    # reuse this run's medians (strictly better evidence). The official line
    # then carries a compact regression screen vs the PREVIOUS sweep — any
    # tail op >2× its prior cell and >0.5 s surfaces round-over-round
    # (the never-benched tail hid a 27 s defect until r13's first sweep).
    # The sweep runs in a FRESH subprocess JVM: the first r14 in-process
    # run timed the stateful-streaming tail 4-6x slow inside the
    # post-5-pass bench JVM (state-store/GC context), flagging five
    # phantom regressions that fresh sessions re-measured at par.
    if os.environ.get("SPARK_GRAFT_SWEEP", "1") == "1":
        import subprocess

        tail = [op for op in QUERIES if op not in set(all_ops)]
        rc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "registry_sweep.py"), *tail],
            capture_output=True, text=True,
        ).returncode
        # registry_sweep merged the tail cells + sweep_meta into the detail
        # file; read them back, overlay this run's medians, re-emit
        try:
            with open(detail_path) as f:
                swept = json.load(f)
            tail_sweep = {
                op: t for op, t in swept.get("sweep", {}).items()
                if op in set(tail)
            }
            detail["sweep_meta"] = swept.get("sweep_meta", {})
        except (OSError, ValueError):
            tail_sweep = {}
        detail["sweep"] = {**tail_sweep, **timings}
        detail.setdefault("sweep_meta", {})["methodology"] = (
            "tail: single warmed pass in a FRESH subprocess JVM (screen "
            f"only; rc={rc}); bench-set ops: {METHODOLOGY} medians from "
            "this run"
        )
        regressions = {
            op: [prev_sweep[op], t]
            for op, t in detail["sweep"].items()
            # prev > 0 guards the ratio sort key below: a 0.0 prior cell
            # (sub-ms op rounded to 3 decimals) is not a regression signal
            # and would raise ZeroDivisionError at the end of a full run
            if op in prev_sweep
            and prev_sweep[op] > 0
            and t > 0.5
            and t >= 2.0 * prev_sweep[op]
        }
        worst = sorted(
            regressions, key=lambda o: -regressions[o][1] / regressions[o][0]
        )[:5]
        compact["sweep_reg"] = {o: regressions[o] for o in worst}
        detail["sweep_reg"] = regressions

    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
