"""Scaling-curve probe: measure headline-operator wall time at 1×, ~3×,
and 10× the sf0.1 data volume and report the observed scaling exponent
alpha (t ∝ data^alpha, from the 1×→10× endpoints).

The synthetic scales replicate sf0.1 with key offsets (doc_id/vec_id/
order keys shifted per copy) — content duplication is fine for a
throughput probe and even stresses the dedup ops' pair expansion (every
document gains R-1 verbatim twins, so the near-dup ops do strictly MORE
relational work per row than on organic data; their exponents are upper
bounds). Embedding queries stay the fixed vec_id < 20 set, so sim_search
scaling isolates corpus growth.

Writes SCALING.md at the repo root. Run on an otherwise idle machine:
    python tools/scaling_probe.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from erlang_mapreduce_spark.ckpt import release_transient_storage  # noqa: E402
from erlang_mapreduce_spark.registry import QUERIES  # noqa: E402
from erlang_mapreduce_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
SCALES = {"x1": 1, "x3": 3, "x10": 10}
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
# per-table replication key offsets (None = copy once: dimension tables
# keep their natural size; offsetting FKs would break the star schema)
OFFSETS: dict[str, list[tuple[str, int]]] = {
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
    "events": [("event_id", 10_000_000)],
    "orders": [("o_orderkey", 100_000_000)],
    "lineitem": [("l_orderkey", 100_000_000)],
}

OPS = (
    "text_bigram_freq",
    "agg_hash_count",
    "join_sortmerge",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "sim_search_ann",
    "agg_ngram_counts",
    "text_unigram_logprob",
    "agg_heavy_hitters",
    "pipeline_seq_pack",
    "graph_pagerank",
    "compact_small_files",
    "analytics_sessionize",
    "profile_columns",
    # the two slowest headline ops (BENCH_r03): a corpus-global gram-DF
    # aggregate and the iterative CC — alpha evidence for both
    "text_ngram_novelty",
    "dedup_cluster_cc",
    # round-8 additions: the sketch/search family — alpha evidence that
    # the sketch builds stay map-side-combine linear and the ANN paths
    # stay candidate-bounded as the corpus replicates
    "agg_ngram_df_sketch",
    "text_novelty_sketch",
    "decontaminate_bloom",
    "agg_kmv_distinct",
    "text_chunk_overlap",
    "graph_triangle_count",
    "sim_search_ivf",
    "sim_search_pq",
    "sample_temperature",
    "ts_motif_match",
    "rollup_sketch_hierarchy",
    # round-9 additions: cross-doc substring dedup — alpha evidence that
    # the positioned-anchor pipeline inherits the rep collapse (pair
    # compute over DISTINCT texts) while output expansion stays bounded —
    # and its scrub/apply twin, whose output is the cleaned corpus
    # (expected output-linear, like text_chunk_overlap)
    "dedup_substring",
    "dedup_substring_scrub",
    # round-11 additions: the BPE family — alpha evidence that the Python
    # encode stays vocabulary-sized (replicated docs share one vocabulary,
    # so only the JVM-side explode/join/agg should scale) and that
    # training cost is sample-bounded (top-cap word list, constant here)
    "text_bpe_tokenize",
    "bpe_train",
    "text_bpe_tokenize_trained",
    # round-12 addition: the byte-level production tokenizer — same plan
    # shape as text_bpe_tokenize (per-DISTINCT-word Arrow encode, JVM
    # corpus work), byte merges instead of char merges
    "text_bpe_tokenize_bytes",
    # round-13 additions (the r12 verdict's task 5): the four families the
    # probe never covered — sql_suite, streaming replay, multimodal
    # plumbing, maintenance — plus the two r13-new ops. lineitem/orders/
    # events/documents replicate; dims (customer/supplier/part) keep their
    # natural size, so the sql shapes probe fact-side growth against
    # fixed dims, exactly the 100 TB star shape.
    "sql_pricing_summary",
    "sql_market_share",
    "sql_large_volume_customers",
    "sql_priority_pipeline",
    "sql_discounted_revenue",
    "stream_tumbling",
    "stream_kmv_distinct",
    "stream_minhash_dedup",
    "stream_token_budget",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "sort_zorder_layout",
    "merge_upsert",
    "text_html_extract",
    "pipeline_pretrain_e2e",
    # round-14 additions (the r13 verdict's task 7): the remaining r13-new
    # text ops — sentence segmentation (narrow regex explode) and the
    # bigram-LM perplexity gate (two w1-keyed windows over the bigram-tf
    # relation; its SKEW exposure is probed separately by zipf_probe.py)
    # — plus the r14-new SemDeDup op (embeddings replicate with offsets,
    # so cells grow while K stays fixture-sized: within-cell pair work
    # grows ~quadratically per cell here, an upper bound like the other
    # pair ops' replication caveat).
    "text_sentence_split",
    "text_lm_perplexity",
    "dedup_semantic",
    # round-15 additions (the r14 verdict's task 5 + the r15-new op):
    # DSIR selection (broadcast model + TakeOrdered threshold — expect
    # scan-tracking alpha) and the hashed-ngram quality classifier (same
    # feature pipeline, broadcast weight table)
    "sample_dsir",
    "quality_classifier_score",
    "dedup_lines_global",
)

# Per-op decision notes for the subset-probe addendum (``main`` with op
# args): what the measured alpha MEANS and what was decided. Full-table
# regenerations carry the same conclusions in the prose sections.
SUBSET_DECISIONS: dict[str, str] = {
    "sample_dsir": (
        "every stage is scan-shaped or broadcast-shaped by construction "
        "(narrow gram explode, map-side-combined tf aggs, 1024-row "
        "broadcast model, TakeOrdered 1-row threshold — no global sort, "
        "window, or collect), so alpha tracks the corpus scan; replicated "
        "docs change only row volume, never model/threshold size. "
        "Decision: scale-safe as planned, no change."
    ),
    "quality_classifier_score": (
        "same feature pipeline as sample_dsir minus the target-corpus "
        "branch: scan -> explode -> 2 hash aggs -> broadcast weight "
        "join; the model is a constant 1024-row broadcast at any corpus "
        "size. Decision: scale-safe as planned, no change."
    ),
    "dedup_lines_global": (
        "posexplode + ONE line-key hash agg (map-side combinable) + "
        "equi-join back + per-doc reassembly; replication makes every "
        "line corpus-duplicated, so the probe upper-bounds removal-heavy "
        "behavior — output (clean docs) grows linearly, the line-key "
        "relation stays at DISTINCT lines (constant here). Decision: "
        "scale-safe; at 100 TB key the join on xxhash64(line) per the "
        "docstring."
    ),
    "curate_url_dedup": (
        "one narrow projection (URL synth + parse_url + canonicalize + "
        "seeded blocklist flag) into ONE canonical-URL-keyed window for "
        "the keep-first min — no join, no sort, no Python; replication "
        "multiplies rows per canonical URL but the exchange stays one "
        "keyed shuffle of url-sized rows. Decision: scale-safe as "
        "planned; at 100 TB the window key becomes xxhash64(canonical) "
        "if URL strings dominate the shuffle bytes."
    ),
    "curate_domain_filter": (
        "ONE corpus scan carrying three narrow per-row signals (host "
        "parse, gopher rule battery, constant-folded classifier fold) "
        "into ONE host-keyed integer hash agg — the per-row fold over "
        "unigram+bigram features is the dominant term and is "
        "corpus-linear by construction; the agg output is O(domains). "
        "Decision: scale-safe as planned, no change."
    ),
}

# The steepest SCALING rows (the token-linear family) get one extra 30×
# point: their 1×→10× alphas (0.5-0.85) mix amortizing fixed overhead
# with true corpus-linear growth, and the 10×→30× marginal exponent
# separates the two — flat-to-1 confirms corpus/output-linear with no
# hidden super-linear term (the r11 verdict's ask); the ops read ONLY
# the documents table, so the x30 corpus replicates documents alone.
X30_OPS = (
    "text_chunk_overlap",
    "text_bpe_tokenize",
    "text_bpe_tokenize_trained",
    "pipeline_seq_pack",
    "text_bpe_tokenize_bytes",
)
X30_REPS = 30


def build(scale_dir: str, reps: int, replicate: frozenset[str] | None = None) -> None:
    """Materialize a replicated corpus; ``replicate`` restricts which
    OFFSETS tables actually replicate (the rest copy once) — the x30
    corpus replicates documents alone, since its probed ops read nothing
    else."""
    os.makedirs(scale_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        dst = f"{scale_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        off = OFFSETS.get(t) if (replicate is None or t in replicate) else None
        if off is None or reps == 1:
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        offmap = dict(off)
        parts = []
        for r in range(reps):
            sel = ", ".join(
                f"{c} + {offmap[c] * r} AS {c}" if c in offmap else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()


def subset_main(ops: tuple[str, ...]) -> None:
    """Probe ONLY ``ops`` at 1x/3x/10x and surgically merge their rows
    into the existing SCALING.md main table (replace-or-insert), plus a
    marker-delimited addendum with per-op decision notes — so a new op
    gets its alpha row without re-running the whole 60-op probe."""
    unknown = [o for o in ops if o not in QUERIES]
    if unknown:
        print(f"unknown ops: {unknown}", file=sys.stderr)
        sys.exit(2)
    for name, reps in SCALES.items():
        build(os.path.join(ROOT, name), reps)
    spark = get_spark("scaling-probe-subset")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for op in ops:
        force(QUERIES[op](spark, "/root/testdata/sf0.001"))
    results: dict[str, dict[str, float]] = {op: {} for op in ops}
    for sname in SCALES:
        d = os.path.join(ROOT, sname)
        for op in ops:
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(QUERIES[op](spark, d))
                ts.append(time.perf_counter() - t0)
                release_transient_storage()
            results[op][sname] = round(min(ts), 3)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(out) as f:
        text = f.read()
    lines = text.split("\n")
    # the MAIN table: first run of "| op | ..." rows after its header
    hdr = lines.index("| op | 1x (s) | 3x (s) | 10x (s) | alpha |")
    t_end = hdr + 2
    while t_end < len(lines) and lines[t_end].startswith("|"):
        t_end += 1
    rows = {}
    # clamp the 1x denominator: a sub-millisecond cell rounds to 0.000 and
    # would ZeroDivisionError mid-merge, aborting the SCALING.md rewrite
    # (r15 ADVICE item 4 — mirrors bench.py's prev_sweep>0 guard)
    def _alpha(r):
        return math.log(r["x10"] / max(r["x1"], 0.001)) / math.log(10)

    for op in ops:
        r = results[op]
        alpha = _alpha(r)
        rows[op] = (
            f"| {op} | {r['x1']:.3f} | {r['x3']:.3f} | {r['x10']:.3f} "
            f"| {alpha:.2f} |"
        )
    replaced = set()
    for i in range(hdr + 2, t_end):
        name = lines[i].split("|")[1].strip()
        if name in rows:
            lines[i] = rows[name]
            replaced.add(name)
    inserts = [rows[op] for op in ops if op not in replaced]
    lines[t_end:t_end] = inserts
    text = "\n".join(lines)
    ss, se = "<!-- subset-probe:start -->", "<!-- subset-probe:end -->"
    notes = [ss, "", "### Subset-probe addendum (tools/scaling_probe.py "
             "<ops>)", "",
             "Rows above merged by a targeted re-probe; decision notes:",
             ""]
    for op in ops:
        r = results[op]
        alpha = _alpha(r)
        note = SUBSET_DECISIONS.get(
            op, "no decision note registered — add one to "
                "SUBSET_DECISIONS."
        )
        notes.append(f"- `{op}` (alpha {alpha:.2f}): {note}")
    notes += ["", se]
    block = "\n".join(notes)
    if ss in text:
        text = text[: text.index(ss)] + block + text[
            text.index(se) + len(se):]
    else:
        zs = "<!-- zipf-probe:start -->"
        at = text.index(zs) if zs in text else len(text)
        text = text[:at] + block + "\n\n" + text[at:]
    with open(out, "w") as f:
        f.write(text)
    for op in ops:
        print(op, results[op], rows[op])


# Decision notes for the x30 marginal addendum (``--x30 <ops>`` mode).
X30_DECISIONS: dict[str, str] = {
    "dedup_lines_global": (
        "measured 0.13: +16% wall for +200% input (3.095 s -> 3.588 s). The prediction of ~1 was wrong for a structural reason worth recording: under FULL replication, keep-first leaves exactly one surviving copy of every line at ANY replication factor, so the output/reassembly term — the part that is output-linear on organic data — is CONSTANT by construction here and neither the 10x nor the 30x cell can exhibit it. What the marginal point DOES show: the input-side terms (posexplode, map-side-combined line-key agg, equi-join back) cost ~0.25 s per 10x of corpus on this fixture — no super-linear term, no hot-key cliff, and the remaining ~3 s cell is fixed per-job overhead. Decision: scale-safe; the output-linear claim rests on the plan shape (bounded per-doc collect_list), not this probe; at 100 TB swap the join key to xxhash64(line) per the op docstring so the line-key exchange ships 8-byte keys, not raw lines."
    ),
}


def x30_main(ops: tuple[str, ...]) -> None:
    """Measure ONLY ``ops`` at x10 and x30 (documents-only replication,
    like the X30_OPS block of the full probe) and surgically merge their
    10x->30x marginal-alpha rows into SCALING.md's marginal table, plus a
    marker-delimited decision-note addendum — the targeted version of the
    full probe's marginal pass (r15 VERDICT task 6)."""
    unknown = [o for o in ops if o not in QUERIES]
    if unknown:
        print(f"unknown ops: {unknown}", file=sys.stderr)
        sys.exit(2)
    d10 = os.path.join(ROOT, "x10")
    d30 = os.path.join(ROOT, "x30")
    build(d10, SCALES["x10"])
    build(d30, X30_REPS, replicate=frozenset({"documents"}))
    spark = get_spark("scaling-probe-x30")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for op in ops:  # warmup: JVM + codegen outside the timed region
        force(QUERIES[op](spark, "/root/testdata/sf0.001"))
    results: dict[str, dict[str, float]] = {op: {} for op in ops}
    for sname, d in (("x10", d10), ("x30", d30)):
        for op in ops:
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(QUERIES[op](spark, d))
                ts.append(time.perf_counter() - t0)
                release_transient_storage()
            results[op][sname] = round(min(ts), 3)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(out) as f:
        text = f.read()
    lines = text.split("\n")
    hdr = lines.index("| op | 10x (s) | 30x (s) | alpha(10->30) |")
    t_end = hdr + 2
    while t_end < len(lines) and lines[t_end].startswith("|"):
        t_end += 1
    rows = {}
    for op in ops:
        r = results[op]
        a30 = math.log(r["x30"] / max(r["x10"], 0.001)) / math.log(3)
        rows[op] = f"| {op} | {r['x10']:.3f} | {r['x30']:.3f} | {a30:.2f} |"
    replaced = set()
    for i in range(hdr + 2, t_end):
        name = lines[i].split("|")[1].strip()
        if name in rows:
            lines[i] = rows[name]
            replaced.add(name)
    lines[t_end:t_end] = [rows[op] for op in ops if op not in replaced]
    text = "\n".join(lines)
    ss, se = "<!-- x30-subset:start -->", "<!-- x30-subset:end -->"
    notes = [ss, "", "### x30 marginal addendum (tools/scaling_probe.py "
             "--x30 <ops>)", "",
             "Marginal rows above merged by a targeted re-probe; decision "
             "notes:", ""]
    for op in ops:
        r = results[op]
        a30 = math.log(r["x30"] / max(r["x10"], 0.001)) / math.log(3)
        notes.append(f"- `{op}` (alpha(10->30) {a30:.2f}): " + X30_DECISIONS.get(
            op, "no decision note registered — add one to X30_DECISIONS."))
    notes += ["", se]
    block = "\n".join(notes)
    if ss in text:
        text = text[: text.index(ss)] + block + text[
            text.index(se) + len(se):]
    else:
        zs = "<!-- zipf-probe:start -->"
        at = text.index(zs) if zs in text else len(text)
        text = text[:at] + block + "\n\n" + text[at:]
    with open(out, "w") as f:
        f.write(text)
    for op in ops:
        print(op, results[op], rows[op])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--x30":
        x30_main(tuple(sys.argv[2:]))
        return
    if len(sys.argv) > 1:
        subset_main(tuple(sys.argv[1:]))
        return
    for name, reps in SCALES.items():
        build(os.path.join(ROOT, name), reps)
    build(os.path.join(ROOT, "x30"), X30_REPS, replicate=frozenset({"documents"}))
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup at sf0.001: JVM + codegen outside the timed region
    for op in OPS:
        force(QUERIES[op](spark, "/root/testdata/sf0.001"))

    results: dict[str, dict[str, float]] = {op: {} for op in OPS}
    for sname in SCALES:
        d = os.path.join(ROOT, sname)
        for op in OPS:
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(QUERIES[op](spark, d))
                ts.append(time.perf_counter() - t0)
                # outside the timed region, same as bench.py: identical
                # executor-storage state per pass
                release_transient_storage()
            results[op][sname] = round(min(ts), 3)

    d30 = os.path.join(ROOT, "x30")
    for op in X30_OPS:
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(QUERIES[op](spark, d30))
            ts.append(time.perf_counter() - t0)
            release_transient_storage()
        results[op]["x30"] = round(min(ts), 3)

    lines = [
        "# SCALING — measured wall time vs data volume",
        "",
        "Generated by `tools/scaling_probe.py`: headline ops on sf0.1",
        "replicated 1× / 3× / 10× (key-offset copies; dedup ops face",
        "strictly MORE pair work per row than organic data — their",
        "exponents are upper bounds). local[32], best-of-2 per cell.",
        "alpha = log(t10/t1)/log(10): 1.0 = perfectly linear in data;",
        "sub-1 means fixed per-query overhead still dominates at this",
        "size; super-1 flags super-linear growth to investigate.",
        "",
        "PROBE TIMES ARE NOT BENCH TIMES: bench.py reports the median of",
        "3 passes on the pristine sf0.1 parquet; this probe reports",
        "best-of-2 on a REPLICATED copy whose different file layout,",
        "row-group sizes, and shared-table cache state (pass 1 builds the",
        "per-corpus shared tables, pass 2 reuses them — best-of-2 keeps",
        "the warm number) shift absolute times either way. Compare",
        "alphas across this table and medians across BENCH files; never",
        "a probe cell against a bench cell.",
        "",
        "| op | 1x (s) | 3x (s) | 10x (s) | alpha |",
        "|---|---|---|---|---|",
    ]
    for op in OPS:
        r = results[op]
        alpha = math.log(r["x10"] / r["x1"]) / math.log(10)
        lines.append(
            f"| {op} | {r['x1']:.3f} | {r['x3']:.3f} | {r['x10']:.3f} "
            f"| {alpha:.2f} |"
        )
    def a(op: str) -> str:
        """Measured alpha for an op, formatted — prose lines interpolate
        this instead of hardcoding numbers that go stale when the table
        regenerates (the round-8 chunk-overlap 0.82/0.72 mismatch)."""
        r = results[op]
        return f"{math.log(r['x10'] / r['x1']) / math.log(10):.2f}"

    lines += [
        "",
        "Note on the pair ops: replication makes every document an",
        "R-clique member, and an earlier build measured exact-pair jaccard",
        "at alpha 1.27 here (1.45 s -> 27 s at 10x) because pipeline pair",
        "emission grows as C(R,2) per doc. The pair ops now collapse",
        "verbatim-duplicate groups to one representative before the",
        "pipeline and expand member pairs afterwards (_verbatim_reps in",
        "operators/dedup.py), so their compute is a function of DISTINCT",
        "texts — which is why jaccard/minhash sit near alpha 0 on this",
        "fixture (distinct-text count is constant across scales) while",
        "still emitting the full quadratic pair OUTPUT.",
        "",
        "graph_pagerank's near-zero alpha is likewise a fixture artifact:",
        "replication offsets l_orderkey but not part/supplier keys, so the",
        "DISTINCT (part, supplier) edge set — and with it every iteration's",
        "join+agg volume — is constant across scales; only the scan and the",
        "distinct grow. Its data-proportional behavior is the per-round",
        "2-exchange message-passing plan, not this curve. compact_small_files",
        "and analytics_sessionize behave as expected for a full-rewrite job",
        "and a per-event window op once data outgrows fixed query overhead.",
        "",
        "text_ngram_novelty ran its corpus-global document-frequency",
        "aggregate over ALL docs through round 7 (alpha 1.01, 66 s at",
        "10x — the table's worst absolute tail); round 8 collapsed it to",
        "the shared verbatim-representative gram sets with exact member",
        "expansion, so like the pair ops its DF compute now scales with",
        "DISTINCT texts (constant on this fixture — hence the near-flat",
        "curve). On organic data corpus-wide exact DF remains linear in",
        "distinct text volume; the sublinear swap at 100 TB is a sketch",
        "(count-min over grams), which agg_approx demonstrates for the",
        "distinct-count family.",
        f"dedup_cluster_cc's {a('dedup_cluster_cc')} is the",
        "verbatim-collapse at work: pair",
        "generation and the star rounds see only DISTINCT texts (constant",
        "across these replicas), leaving the scan + collapse as the only",
        "data-proportional stages. (Round 9 closed its 10x tail — 4.83 s /",
        "alpha 0.28 in the r8 probe — by running the star rounds on the",
        "COLLAPSED rep-level graph and expanding components through the",
        "member map afterwards; before, the rounds crunched the",
        "member-expanded graph whose verbatim cliques carry C(R,2) edges",
        "each. The expansion is exact — see dedup_cluster_cc's docstring.)",
        "",
        "Round-8 family: the sketch builds (agg_ngram_df_sketch,",
        "text_novelty_sketch, agg_kmv_distinct) sit flat-to-gently-linear",
        "because their shuffles are SKETCH-sized (O(cells)/O(k) summary",
        "rows after map-side partial merge), not data-sized — the scan is",
        "the only data-proportional stage, which is the whole point of a",
        "mergeable sketch at 100 TB. decontaminate_bloom",
        f"({a('decontaminate_bloom')}) probes the",
        "broadcast bitset over verbatim-REP gram sets (round 9): the",
        "membership test is a narrow projection, the md5 hashing scales",
        "with distinct texts, and the member-expansion join carries the",
        "per-rep flags back to train docs.",
        f"text_chunk_overlap's {a('text_chunk_overlap')} is the one op",
        "whose OUTPUT grows",
        "linearly (every replica emits its own chunks; nothing to",
        "collapse), so alpha→1 is correct, not a tail to fix. The ANN",
        "paths stay candidate-bounded: sim_search_ivf",
        f"({a('sim_search_ivf')}) scans",
        f"nprobe/K of a 10x corpus per query and sim_search_pq",
        f"({a('sim_search_pq')})",
        "streams 4-bit codes with a constant shortlist; both re-rank a",
        "fixed candidate budget. graph_triangle_count",
        f"({a('graph_triangle_count')}) counts through the clique blow-up",
        "identity over the rep-level graph (round 9): replica cliques",
        "contribute size ARITHMETIC, not wedges, so the member-expanded",
        "graph never exists (the r8 probe measured 5.45 s / alpha 0.28 at",
        "10x with the wedge join still running on expanded edges).",
        "sample_temperature is a broadcast",
        "per-language rate over one scan + narrow explode, and",
        "ts_motif_match is one user-partition frame pass with a",
        "TakeOrderedAndProject top-K — both track the scan.",
        "rollup_sketch_hierarchy's single data-sized exchange is the",
        "(type, hour) repartition; the day merge moves only k-bounded",
        "sketch rows, hence the near-flat curve.",
        "",
        f"Round-9: dedup_substring ({a('dedup_substring')}) inherits the",
        "verbatim-rep collapse like the other pair ops — positioned-anchor",
        "grams, posting lists, and diagonal runs are computed over DISTINCT",
        "texts only (constant across these replicas), so the",
        "data-proportional stages are the scan + collapse and the member",
        "expansion of its pair OUTPUT (every replica clique emits its",
        "C(R,2) within-group whole-text rows — output-linear growth the",
        "op cannot avoid, same as chunk_overlap's). On organic data the",
        "anchor stage is linear in distinct text volume and the pair stage",
        "is bounded by SUBSTR_OCC_CAP per gram — never all-pairs.",
        "",
        f"Round-11: the BPE family. text_bpe_tokenize ({a('text_bpe_tokenize')})",
        "runs its Python encode per DISTINCT word (replicas share one",
        "vocabulary, so the Arrow stage is constant across scales) — the",
        "data-proportional stages are the JVM-side explode, fan-out join,",
        "and per-doc aggregate, which track the scan on this fixture.",
        f"bpe_train ({a('bpe_train')}) is sample-bounded by construction:",
        "the only data-sized work is the distinct-word count feeding the",
        "top-cap TakeOrdered collect; the training rounds run driver-side",
        "on ≤ BPE_TRAIN_CAP rows whatever the corpus size.",
        f"text_bpe_tokenize_trained ({a('text_bpe_tokenize_trained')})",
        "composes the two: training cost constant, tokenize cost =",
        "text_bpe_tokenize's.",
        f"Round-12: text_bpe_tokenize_bytes ({a('text_bpe_tokenize_bytes')})",
        "is the byte-level production tokenizer — same plan shape, byte",
        "merges instead of char merges, so its curve should track",
        "text_bpe_tokenize's (the per-word Python encode does ~4x the",
        "merge steps, but that stage is vocabulary-sized, constant here).",
        "",
        "Round-13 families (first probe coverage for sql_suite, streaming,",
        "multimodal, maintenance):",
        f"- SQL shapes: sql_pricing_summary ({a('sql_pricing_summary')}) is",
        "  the Q1 full-lineitem aggregate — scan + one map-side-combined",
        "  hash agg, so alpha→1 is the floor for an op that must read",
        f"  every row. sql_priority_pipeline ({a('sql_priority_pipeline')})",
        f"  and sql_discounted_revenue ({a('sql_discounted_revenue')}) are",
        "  scan-dominated semi-join/filter shapes over replicated facts.",
        f"  sql_market_share ({a('sql_market_share')}) and",
        f"  sql_large_volume_customers ({a('sql_large_volume_customers')})",
        "  join replicated facts against FIXED dims (dims don't replicate",
        "  — the star-schema constraint), so their fact-side exchanges",
        "  grow with data while the broadcast sides stay constant: the",
        "  exact 100 TB star shape. Near-1 alphas here mean the join",
        "  plans add no super-linear term on top of the scan.",
        "- Streaming replay: each op's cost is micro-batches × per-batch",
        f"  plan. stream_tumbling ({a('stream_tumbling')}) and",
        f"  stream_kmv_distinct ({a('stream_kmv_distinct')}) carry",
        "  batch-sized state merges (group rows / k-bounded sketches);",
        f"  stream_minhash_dedup ({a('stream_minhash_dedup')}) checks each",
        "  batch against a banded signature store (batch-sized probe,",
        f"  never corpus rescan); stream_token_budget",
        f"  ({a('stream_token_budget')}) re-tokenizes each batch through",
        "  the vocabulary-sized Arrow encode. Replication grows the",
        "  replayed volume; the per-batch state reads stay O(groups)/O(k)",
        "  — alphas ≤~1 mean no cross-batch blow-up.",
        f"- Multimodal: multimodal_meta ({a('multimodal_meta')}) is a",
        f"  narrow digest projection; multimodal_decode",
        f"  ({a('multimodal_decode')}) and multimodal_resize",
        f"  ({a('multimodal_resize')}) push Arrow batches through",
        "  mapInPandas — per-payload work, zero shuffle, so they track",
        "  the scan (alpha→1 is the decode floor: every byte crosses the",
        "  Arrow boundary once; the 100 TB lever is executor count, not",
        "  plan shape).",
        f"- Maintenance: sort_zorder_layout ({a('sort_zorder_layout')}) is",
        "  a narrow integer z-interleave + one hash agg over replicated",
        f"  lineitem. merge_upsert ({a('merge_upsert')}) applies a CDC",
        "  batch to the supplier DIM, which does not replicate — its flat",
        "  curve here probes fixed per-query overhead only; the op's",
        "  scale story is the broadcast(changes) left join that never",
        "  shuffles the base (pinned in test_plans), which this fixture",
        "  cannot exercise by construction.",
        f"- Round-13 ops: text_html_extract ({a('text_html_extract')}) is",
        "  a chain of narrow regexp projections over replicated documents",
        "  — scan-tracking, no shuffle at any scale. pipeline_pretrain_e2e",
        f"  ({a('pipeline_pretrain_e2e')}) composes the full 15-stage",
        "  chain; its cost is the sum of its stages (dedup stages collapse",
        "  to DISTINCT texts — constant here — while gate/scrub/tokenize/",
        "  pack/export scale with the corpus), so its alpha sits between",
        "  the pair ops' ~0 and the tokenize family's ~0.7.",
        f"- Round-14 ops: text_sentence_split ({a('text_sentence_split')})",
        "  is a narrow regex split + posexplode — output-linear, zero",
        f"  shuffle. text_lm_perplexity ({a('text_lm_perplexity')}) runs",
        "  two w1-keyed windows over the bigram-tf relation; replicated",
        "  docs keep the DISTINCT bigram-type set constant, so the",
        "  windows' row volume grows with docs while key cardinality",
        "  doesn't — the uniform-vocabulary curve; the Zipf-head hazard is",
        "  probed separately below (zipf_probe.py section).",
        f"  dedup_semantic ({a('dedup_semantic')}) inherits the",
        "  verbatim-collapse: replicas are verbatim embedding twins in",
        "  the same cell, and the r14 first-probe (alpha 1.19, 52 s at",
        "  10x) showed the within-cell pair join crunching every twin;",
        "  the pair pipeline now runs per DISTINCT vector with exact",
        "  member expansion (a twin's own rep is always its witness;",
        "  zero-norm vectors score cosine -1.0 by convention, r15), so",
        "  like the other pair ops its",
        "  curve tracks distinct-vector volume — constant here. On",
        "  organic data the residual per-cell quadratic term is bounded",
        "  by production K growing ~sqrt(N).",
        f"- Round-15 ops: sample_dsir ({a('sample_dsir')}) is",
        "  broadcast-shaped end to end (narrow gram explode, map-side tf",
        "  aggs, 1024-row broadcast model, TakeOrdered 1-row threshold) —",
        "  alpha tracks the corpus scan; replication grows row volume,",
        "  never model or threshold size. quality_classifier_score",
        f"  ({a('quality_classifier_score')}) shares the feature pipeline",
        "  (scan -> explode -> 2 hash aggs -> broadcast weight join) with",
        "  a constant 1024-row model at any corpus size.",
        "",
        "## 30x probe — the token-linear family",
        "",
        "The steepest rows above get one more point: documents replicated",
        "30x (these ops read only the documents table, so nothing else",
        "replicates). alpha(10->30) = log(t30/t10)/log(3) is the MARGINAL",
        "exponent with the fixed per-query overhead already amortized:",
        "~1 means corpus/output-linear — the floor for ops that must touch",
        "every token — and > ~1.1 would flag a hidden super-linear term",
        "(the r11 verdict's ask).",
        "",
        "| op | 10x (s) | 30x (s) | alpha(10->30) |",
        "|---|---|---|---|",
    ]
    for op in X30_OPS:
        r = results[op]
        a30 = math.log(r["x30"] / r["x10"]) / math.log(3)
        lines.append(
            f"| {op} | {r['x10']:.3f} | {r['x30']:.3f} | {a30:.2f} |"
        )
    lines += [
        "",
        "Hot-word skew in the BPE fan-out join (the thing to watch as",
        "these ops scale): in the DEFAULT plan the vocab map broadcasts,",
        "so there is no shuffle on `word` at all and no skew cell to",
        "split. In the SMJ fallback (vocab past the broadcast threshold)",
        "the corpus side shuffles on `word` and a Zipf head key IS a skew",
        "cell — verified in round 12 that AQE's skew-join split absorbs",
        "it: on a synthetic corpus where one word carries ~60% of all",
        "occurrences, the fallback plans as `SortMergeJoin(skew=true)`",
        "with AQEShuffleRead splitting the hot partition by map-output",
        "ranges (and replicating the matching one-row vocab partition).",
        "One measured caveat: the split unit is the PER-MAPPER output",
        "range, so a skewed partition fed by a single map task cannot be",
        "split — reproducible on a one-row-group fixture parquet, never",
        "the 100 TB shape, where the corpus scan is thousands of tasks.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    # preserve the zipf_probe.py marker block across regenerations (the
    # two tools co-own SCALING.md; each rewrites only its own section)
    zipf_block = ""
    try:
        with open(out) as f:
            prev = f.read()
        zs, ze = "<!-- zipf-probe:start -->", "<!-- zipf-probe:end -->"
        if zs in prev:
            zipf_block = "\n" + prev[prev.index(zs): prev.index(ze) + len(ze)] + "\n"
    except OSError:
        pass
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + zipf_block)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
